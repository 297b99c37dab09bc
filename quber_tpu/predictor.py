"""MaskRefinerPredictor: the library-level inference API.

API-compatible rebuild of /root/reference/maskrefiner/predictor.py:207-359:
`predict(rgb, depth, initial_masks)` runs mask encoding -> dual-trunk
backbone -> hierarchical heads -> panoptic grouping, and returns foreground /
EEE maps plus refined instances.

TPU-first design: the ENTIRE hot path (Gaussian center/offset encoding,
network forward, center NMS, pixel grouping, instance extraction) is one
jitted XLA program at a fixed (height, width, MAX_INSTANCES); the host only
pads inputs and unpacks the fixed-shape result. The reference instead loops
on the host per mask (predictor.py:311-347) and per panoptic label with
device syncs (model.py:318-356).
"""

from __future__ import annotations

import os
import threading
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from quber_tpu import transport_native as _native
from quber_tpu.models.mask_refiner import MaskRefiner, MaskRefinerConfig
from quber_tpu.ops.encoding import encode_initial_masks
from quber_tpu.ops.grouping import get_panoptic_segmentation


def device_put_split(arr: np.ndarray, min_bytes: int = 4 << 20,
                     streams: int | None = None) -> jnp.ndarray:
    """Transfer a host array as `streams` concurrent H2D transfers.

    The tunneled-TPU transport moves one TCP stream per transfer at
    ~50 MB/s (latency-limited window); two concurrent streams sustain
    ~72 MB/s on a quiet link, and more do not help further there — but on
    a congested link extra flows claim a larger fair share, so the count
    is tunable via QUBER_H2D_STREAMS. Splitting along axis 0 and
    concatenating on device costs one tiny device op and wins ~1.4x on
    the streaming predictor's ~21 MB input batches. Small arrays go as
    one transfer. On a directly-attached TPU the split is harmless
    (PCIe copies are parallel-safe).
    """
    if streams is None:
        env = os.environ.get("QUBER_H2D_STREAMS", "2")
        streams = int(env) if env.isdigit() else 2  # "auto" -> stream default
    if arr.nbytes < min_bytes or arr.shape[0] < streams:
        return jnp.asarray(arr)
    parts = np.array_split(arr, streams, axis=0)
    out = [None] * streams

    def send(i):
        d = jnp.asarray(parts[i])
        d.block_until_ready()
        out[i] = d

    ts = [threading.Thread(target=send, args=(i,)) for i in range(1, streams)]
    for t in ts:
        t.start()
    send(0)
    for t in ts:
        t.join()
    return jnp.concatenate(out, axis=0)


def device_get_split(arr: jnp.ndarray, min_bytes: int = 1 << 20,
                     streams: int | None = None) -> np.ndarray:
    """Read a device array back as `streams` concurrent D2H transfers.

    The tunneled transport's D2H direction is one latency-limited TCP
    stream (~27 MB/s); concurrent reads of row slices claim a larger fair
    share (~42 MB/s at 8 streams, measured). Small arrays go as one read.
    On a directly-attached TPU the split costs one extra device slice per
    stream against a >= 16 GB/s PCIe readback — noise."""
    if streams is None:
        env = os.environ.get("QUBER_D2H_STREAMS", "6")
        streams = int(env) if env.isdigit() else 6
    if arr.nbytes < min_bytes or arr.shape[0] < streams or streams <= 1:
        return np.asarray(arr)
    bounds = np.linspace(0, arr.shape[0], streams + 1).astype(int)
    parts = [None] * streams

    def get(i):
        parts[i] = np.asarray(arr[bounds[i]:bounds[i + 1]])

    ts = [threading.Thread(target=get, args=(i,)) for i in range(1, streams)]
    for t in ts:
        t.start()
    get(0)
    for t in ts:
        t.join()
    return np.concatenate(parts)


class _H2DTuner:
    """Online H2D stream-count tuner for the tunneled-TPU transport.

    The link's capacity AND its best concurrency swing on a minutes scale
    (measured 8-72 MB/s; 2 flows win on a quiet link, 8 on a congested one
    via TCP fair share), so a one-shot probe mispicks. This tuner times
    every streamed send (with an async transport fence — see
    predict_batch_stream), keeps a per-count EMA of achieved MB/s, sends
    with the current best, and every 6th send re-explores a neighbor of
    the best count (single ladder step — a bad probe then costs little)
    to track drift."""

    COUNTS = (1, 2, 4, 8, 12)

    def __init__(self):
        self.bw: dict[int, float] = {}
        self.k = 0

    def pick(self) -> int:
        self.k += 1
        for c in self.COUNTS:
            if c not in self.bw:
                return c
        i = self.COUNTS.index(max(self.bw, key=lambda c: self.bw[c]))
        if self.k % 6 == 0:
            nbrs = [self.COUNTS[j] for j in (i - 1, i + 1)
                    if 0 <= j < len(self.COUNTS)]
            return nbrs[(self.k // 6) % len(nbrs)]
        return self.COUNTS[i]

    def report(self, count: int, mbps: float) -> None:
        old = self.bw.get(count)
        self.bw[count] = mbps if old is None else 0.5 * old + 0.5 * mbps

    def best(self) -> tuple[int, float]:
        if not self.bw:
            return 0, 0.0
        c = max(self.bw, key=lambda c: self.bw[c])
        return c, self.bw[c]


def transport_fence(x: jnp.ndarray) -> None:
    """Block until `x` is resident on device.

    block_until_ready does not fence the tunneled-TPU transport; reading
    back a reduction that data-depends on `x` does. A scalar readback
    costs one transport round trip (~27 ms tunneled, us-scale on a
    directly-attached TPU)."""
    flat = x.reshape(-1)
    _ = np.asarray(jnp.sum(flat[:16].astype(jnp.int32)))


def unpack_bits_device(packed: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """uint8 [..., n_bytes] -> bool [..., n_bits] (np.packbits bitorder='big')."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :n_bits] > 0


def rle_encode_device(flat: jnp.ndarray, max_runs: int):
    """Run-length encode a flat int map on device: [HW] -> (u32 [max_runs], n_runs).

    Each run packs (value << 24) | start_position (start < 2^24, value < 256;
    the panoptic ids are <= max_instances + 1). Runs beyond max_runs are
    dropped — callers must check n_runs and fall back to the raw map. Runs
    beyond n_runs get start == hw and a clamped-gather value; decode never
    reads them (callers check n_runs).

    Compaction is a hierarchical rank-select, all fixed-shape: start r is the
    position of the (r+1)-th set bit of the run-boundary mask. An hw-element
    scatter would serialize on TPU, and a vectorized binary search over the
    boundary cumsum costs log2(hw)=19 rounds of scattered gathers per query
    lane; instead, two levels of 128-wide block offsets locate each query's
    block with broadcast compares and contiguous ROW gathers (the
    TPU-friendly gather shape), and a lane-axis cumsum picks the bit within
    the block — ~4x faster than the binary search at 480x640/6k runs.
    """
    hw = flat.shape[0]
    v = flat.astype(jnp.uint32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), v[1:] != v[:-1]]
    )
    blk = 128
    nb = -(-hw // blk)
    bits = jnp.pad(boundary, (0, nb * blk - hw)).reshape(nb, blk)
    counts = bits.sum(axis=1, dtype=jnp.int32)          # set bits per block
    offs = jnp.cumsum(counts) - counts                  # exclusive offsets
    n_runs = offs[-1] + counts[-1]

    nsb = -(-nb // blk)
    sentinel = jnp.int32(1 << 30)                       # > any query
    offs_p = jnp.concatenate(
        [offs, jnp.full((nsb * blk - nb,), sentinel, jnp.int32)]
    ).reshape(nsb, blk)
    counts_p = jnp.concatenate(
        [counts, jnp.zeros((nsb * blk - nb,), jnp.int32)]
    ).reshape(nsb, blk)

    r = jnp.arange(max_runs, dtype=jnp.int32)[:, None]  # query lanes
    sup = jnp.sum(offs_p[None, :, 0] <= r, axis=1) - 1  # super-block of r
    row_offs = offs_p[sup]                              # [max_runs, blk]
    row_cnts = counts_p[sup]
    # the unique block holding bit r: offs_b <= r < offs_b + counts_b
    hit = (row_offs <= r) & (r < row_offs + row_cnts)   # all-False if r>=n_runs
    lane = jnp.arange(blk, dtype=jnp.int32)[None, :]
    b = sup * blk + jnp.sum(jnp.where(hit, lane, 0), axis=1)
    rank = r[:, 0] - jnp.sum(jnp.where(hit, row_offs, 0), axis=1)
    row_bits = bits[jnp.minimum(b, nb - 1)]             # [max_runs, blk]
    incl = jnp.cumsum(row_bits.astype(jnp.int32), axis=1)
    sel = row_bits & (incl == (rank[:, None] + 1))      # exactly one per hit row
    pos = jnp.sum(jnp.where(sel, lane, 0), axis=1)
    starts = jnp.where(
        jnp.any(hit, axis=1), b * blk + pos, hw
    ).astype(jnp.uint32)
    vals = v[jnp.minimum(starts, hw - 1)]
    packed = (vals << 24) | starts
    return packed, n_runs


def rle_decode(packed: np.ndarray, n_runs: int, hw: int) -> np.ndarray:
    """Inverse of rle_encode_device: u32 runs -> flat int32 [hw]."""
    runs = packed[:n_runs].astype(np.uint32)
    starts = (runs & 0xFFFFFF).astype(np.int64)
    values = (runs >> 24).astype(np.int32)
    lengths = np.diff(np.append(starts, hw))
    return np.repeat(values, lengths)


def masks_to_boxes(masks: np.ndarray) -> np.ndarray:
    """[N, H, W] bool -> XYXY boxes [N, 4] (detectron2 BitMasks convention)."""
    boxes = np.zeros((len(masks), 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.where(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return boxes


class MaskRefinerPredictor:
    """Single-image refinement predictor with a fused jit pipeline.

    Args:
      config: model + post-processing configuration.
      params: flax param pytree; if None, randomly initialized (useful for
        benchmarking and shape checks; real use loads a checkpoint via
        quber_tpu.train.checkpoint or models.import_torch).
      max_instances: padding bound for the initial mask stack.
    """

    def __init__(
        self,
        config: MaskRefinerConfig | None = None,
        params=None,
        max_instances: int = 64,
        seed: int = 0,
        max_in_runs: int | None = None,
        max_depth_nz: int | None = None,
        max_rgb_esc: int | None = None,
        max_rle_runs: int | None = None,
    ):
        self.config = config or MaskRefinerConfig()
        self.max_instances = max_instances
        self.model = MaskRefiner(self.config)
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 64, 64, self.config.num_input_channels - 3 * self.config.offset_input_on)),
                jnp.zeros((1, 64, 64, 3)) if self.config.offset_input_on else None,
            )
        # device-put once: params arriving as host numpy (e.g. the int8 npz
        # loader) would otherwise re-upload the full ~330 MB tree on EVERY
        # jitted call — jit only caches transfers of jax.Arrays
        self.params = jax.tree.map(jnp.asarray, params)
        self._pipeline = jax.jit(self._pipeline_impl)
        self._pipeline_packed = jax.jit(self._pipeline_packed_impl)
        self._pipeline_packed_batch = jax.jit(self._pipeline_packed_batch_impl)
        self._pipeline_packed_batch_rle = jax.jit(self._pipeline_packed_batch_rle_impl)
        self._pipeline_rlein_batch = jax.jit(
            partial(self._pipeline_packed_batch_impl, input_rle=True)
        )
        self._pipeline_rlein_batch_rle = jax.jit(
            partial(self._pipeline_packed_batch_rle_impl, input_rle=True)
        )
        self._pipeline_rlecin_batch = jax.jit(
            partial(self._pipeline_packed_batch_impl, input_rle="codec")
        )
        self._pipeline_rlecin_batch_rle = jax.jit(
            partial(self._pipeline_packed_batch_rle_impl, input_rle="codec")
        )
        self._pipeline_rlec5in_batch = jax.jit(
            partial(self._pipeline_packed_batch_impl, input_rle="codec5")
        )
        self._pipeline_rlec5in_batch_rle = jax.jit(
            partial(self._pipeline_packed_batch_rle_impl, input_rle="codec5")
        )
        self._pipeline_dense_batch = jax.jit(self._pipeline_dense_batch_impl)
        self._pipeline_dense_batch_rle = jax.jit(
            self._pipeline_dense_batch_rle_impl
        )
        # jitted per-input-layout batch decoders for stage_frames(decode=True)
        self._staged_decoders: dict = {}
        # packed-buffer layout (see _pack_inputs): rgb + MONO depth (the
        # reference pipeline's depth is always 3 replicated channels,
        # eval/preprocess_utils.py:12-28 normalize_depth) + bitpacked masks
        cfg = self.config
        h, w, n = cfg.height, cfg.width, max_instances
        self._img_bytes = h * w * 4
        self._mask_bytes = n * (h * w // 8)
        self._valid_bytes = (n + 7) // 8
        self._in_bytes = self._img_bytes + self._mask_bytes + self._valid_bytes
        # RLE input variant: [img | starts u32 x R | ends u32 x R | valid];
        # ~10x smaller than the bitpacked mask region for typical scenes.
        # Frames whose masks exceed R runs fall back to the dense layout.
        # ~1 run per occupied mask row: benchmark-dataset scenes (<= ~20
        # objects of <= ~300 rows) stay well under 6144; overflow falls back
        # to the dense bitpacked layout per batch. A per-slot-row budget
        # (n * h) would cost 92 KB/frame of H2D at n=24 for headroom that
        # real scenes never use.
        self.max_in_runs = max_in_runs or 6144
        # Depth travels delta-coded in the RLE layout: depth maps are smooth
        # surfaces quantized to u8, so the first-difference is ~97% zeros
        # (nonzeros live on object silhouettes and quantization steps).
        # Sparse (pos u32, val u8) nonzeros cost 5 bytes each vs 307 KB
        # dense; noisy/incompressible depth falls back to the dense layout.
        # 24576 covers quantized smooth surfaces (~5-8% of pixels step) at a
        # 123 KB block — a 2.5x win over dense depth. Callers with known
        # scene statistics can tighten it (any frame over budget sends its
        # batch through the dense layout, so keep real margin).
        self.max_depth_nz = max_depth_nz or 24576
        self._rgb_bytes = h * w * 3
        self._depth_block = 4 + 5 * self.max_depth_nz
        self._in_bytes_rle = (
            self._rgb_bytes + self._depth_block
            + 8 * self.max_in_runs + self._valid_bytes
        )
        # RGB codec layout: camera RGB delta-codes to small residuals (the
        # image signal is smooth; sensor noise adds a few LSB), so the
        # planar first-difference travels as 4-bit nibbles with nibble
        # 0b1000 (-8) reserved as an in-band escape marker; full mod-256
        # residuals for escaped positions travel densely in scan order (the
        # device recovers their positions with a cumsum over the marker
        # mask). 12.5% escape budget covers camera-noise levels (a rendered
        # scene with sigma<=10 noise runs ~9%); full-entropy RGB overflows
        # and the batch falls back to the dense-RGB RLE layout.
        self.max_rgb_esc = max_rgb_esc or (3 * h * w) // 8
        self._rgb_codec_block = 4 + (3 * h * w) // 2 + self.max_rgb_esc
        self._in_bytes_rlec = (
            self._rgb_codec_block + self._depth_block
            + 8 * self.max_in_runs + self._valid_bytes
        )
        # 5-bit fallback codec: textured/noisy RGB whose residuals blow the
        # 4-bit escape budget (the hardened synthetic scenes run ~27%
        # escapes at 4 bits, max 49%) usually still fits signed 5-bit
        # fields — 0.625 B/px + escapes instead of raw 1 B/px, a ~20% wire
        # cut exactly on the streams where the 4-bit codec used to fall
        # back to raw. Budget 3/16 (18.75%): the hardened-texture scenes
        # measure 6.3% mean / 16.9% max 5-bit escapes, so the worst frame
        # fits with margin while the block stays 0.81x raw RGB.
        self.max_rgb_esc5 = (3 * h * w) * 3 // 16
        self._rgb5_bytes = (3 * h * w * 5 + 7) // 8
        self._rgb_codec5_block = 4 + self._rgb5_bytes + self.max_rgb_esc5
        self._in_bytes_rlec5 = (
            self._rgb_codec5_block + self._depth_block
            + 8 * self.max_in_runs + self._valid_bytes
        )
        # sticky skip once a stream sees an incompressible batch, so steady
        # full-entropy workloads don't pay the codec attempt per frame.
        # The 5-bit tier tolerates occasional over-budget batches (those go
        # raw individually) and only disarms after 3 consecutive failures —
        # one outlier frame must not push a whole compressible stream to
        # raw for its lifetime.
        self._rgb_codec_ok = True
        self._rgb_codec5_ok = True
        self._rgb_codec5_strikes = 0
        self._scores_len = cfg.top_k_instances + 2
        # raw panoptic maps travel as bitplanes: ids are <= n + 1, so
        # ceil(log2(n + 2)) planes of h*w/8 bytes each (5 bits/pixel at
        # n=24 vs 8 for a dense u8 map — D2H is the slow direction)
        self._pan_bits = (n + 1).bit_length()
        self._pan_bytes = self._pan_bits * (h * w // 8)
        # RLE output budget: h*w/25 runs (~12k at 480x640) covers grouped
        # panoptic maps with a wide margin; overflow falls back to the raw
        # map. Callers with known scene statistics can tighten it (the
        # bench scene peaks ~4k runs) — D2H is the slow direction.
        self.max_rle_runs = max_rle_runs or max(1024, (h * w) // 25)
        self._rle_bytes = 4 + 4 * self.max_rle_runs + 1 + 4 * self._scores_len
        # set when a whole streamed batch overflows the RLE run budget (the
        # model is producing fragmented maps, e.g. untrained weights): the
        # raw-map path is then strictly cheaper than RLE + raw fallback
        self._rle_fragmenting = False

    def _use_pallas(self):
        use_pallas = self.config.use_pallas_grouping
        if use_pallas is None:
            use_pallas = jax.default_backend() != "cpu"
        return use_pallas

    def _encode_impl(self, masks, valid):
        """Initial-mask encoding: fused Pallas kernel on TPU, XLA elsewhere."""
        if self._use_pallas():
            from quber_tpu.ops.encoding import instance_stats
            from quber_tpu.ops.pallas_kernels import encode_initial_masks_pallas

            areas, centers = instance_stats(masks, valid)
            return encode_initial_masks_pallas(
                masks, valid & (areas > 0), centers, sigma=10, normalize=True
            )
        return encode_initial_masks(masks, valid, sigma=10, normalize=True)

    def _pre_impl(self, params, image, masks, valid, enc=None):
        """Everything before pixel grouping: encode -> forward -> center NMS.
        `enc` lets batched pipelines pass a precomputed (natively-batched
        Pallas) encoding."""
        from quber_tpu.ops.grouping import find_instance_centers

        cfg = self.config
        if enc is None:
            enc = self._encode_impl(masks, valid)
        offset_enc = jnp.transpose(enc, (1, 2, 0))[None]
        out = self.model.apply(params, image[None], offset_enc)

        fg_logit = out["foreground"][0, ..., 0]
        fg_prob = jax.nn.sigmoid(fg_logit)
        center = out["center"][0, ..., 0]
        offsets = jnp.transpose(out["offset"][0], (2, 0, 1))
        centers, cvalid = find_instance_centers(
            center, cfg.center_threshold, cfg.nms_kernel, cfg.top_k_instances
        )
        pre = {
            "sem_seg": fg_logit,
            "fg_prob": fg_prob,
            "fg_bin": jnp.round(fg_prob).astype(jnp.int32),
            "center": center,
            "offset": offsets,
            "centers": centers,
            "centers_valid": cvalid,
        }
        if cfg.eee_mask_on:
            pre["eee_mask"] = jnp.transpose(out["eee_mask"][0], (2, 0, 1))
        if cfg.eee_boundary_on:
            pre["eee_boundary"] = jnp.transpose(out["eee_boundary"][0], (2, 0, 1))
        return pre

    def _post_impl(self, pre, raw):
        from quber_tpu.ops.grouping import merge_and_score

        cfg = self.config
        pano = merge_and_score(
            pre["fg_bin"], pre["fg_prob"], pre["center"], raw,
            pre["centers_valid"], min_instance_area=cfg.min_instance_area,
            stuff_area=cfg.stuff_area,
        )
        result = {
            "sem_seg": pre["sem_seg"],
            "center": pre["center"],
            "offset": pre["offset"],
            "panoptic_seg": pano["panoptic"],
            "num_instances": pano["num_instances"],
            "instance_scores": pano["scores"],
        }
        for k in ("eee_mask", "eee_boundary"):
            if k in pre:
                result[k] = pre[k]
        return result

    def _group(self, centers, cvalid, offsets):
        from quber_tpu.ops.grouping import group_pixels
        from quber_tpu.ops.pallas_kernels import group_pixels_pallas

        if self._use_pallas():
            return group_pixels_pallas(centers, cvalid, offsets)
        return group_pixels(centers, cvalid, offsets)

    def _adaptive_fast_k(self):
        """K for the adaptive grouping fast path, or None when disabled
        (fast_top_k unset, or already >= the configured top_k)."""
        cfg = self.config
        if not cfg.fast_top_k or cfg.fast_top_k >= cfg.top_k_instances:
            return None
        return cfg.fast_top_k

    def _group_and_post(self, pre):
        """Pixel grouping + merge/score with adaptive-K dispatch.

        The reference default keeps 200 center candidates
        (post_processing.py:165-222) and every K-scaled stage pays for all
        200 even though tabletop scenes fire < ~25 centers. Survivor counts
        are data-dependent, so the dispatch is a lax.cond: the fast branch
        slices the (row-major-sorted, valids-first) center table to
        fast_top_k — exact whenever the count fits — and pads the score
        table back to the top_k shape.
        """
        fk = self._adaptive_fast_k()
        if fk is None:
            raw = self._group(pre["centers"], pre["centers_valid"], pre["offset"])
            return self._post_impl(pre, raw)
        pad = self.config.top_k_instances - fk

        def fast(_):
            pre_s = dict(pre, centers=pre["centers"][:fk],
                         centers_valid=pre["centers_valid"][:fk])
            raw = self._group(pre_s["centers"], pre_s["centers_valid"],
                              pre["offset"])
            out = self._post_impl(pre_s, raw)
            out["instance_scores"] = jnp.pad(out["instance_scores"], (0, pad))
            return out

        def slow(_):
            raw = self._group(pre["centers"], pre["centers_valid"], pre["offset"])
            return self._post_impl(pre, raw)

        n = jnp.sum(pre["centers_valid"].astype(jnp.int32))
        return jax.lax.cond(n <= fk, fast, slow, None)

    def _group_and_post_batch(self, pre):
        """Batched twin of _group_and_post. The cond is batch-wide (a
        per-frame cond under vmap would execute both branches as selects):
        one crowded frame spills the whole batch to the top_k path."""
        fk = self._adaptive_fast_k()
        if fk is None:
            raw = self._group_batch(pre)
            return jax.vmap(self._post_impl)(pre, raw)
        pad = self.config.top_k_instances - fk

        def fast(_):
            pre_s = dict(pre, centers=pre["centers"][:, :fk],
                         centers_valid=pre["centers_valid"][:, :fk])
            raw = self._group_batch(pre_s)
            outs = jax.vmap(self._post_impl)(pre_s, raw)
            outs["instance_scores"] = jnp.pad(
                outs["instance_scores"], ((0, 0), (0, pad))
            )
            return outs

        def slow(_):
            raw = self._group_batch(pre)
            return jax.vmap(self._post_impl)(pre, raw)

        n = jnp.max(jnp.sum(pre["centers_valid"].astype(jnp.int32), axis=1))
        return jax.lax.cond(n <= fk, fast, slow, None)

    def _pipeline_impl(self, params, image, masks, valid):
        """image [H, W, 6] f32, masks [N, H, W] bool, valid [N] bool."""
        pre = self._pre_impl(params, image, masks, valid)
        return self._group_and_post(pre)

    # ------------------------------------------------------------------
    # Packed transfer path.
    #
    # The remote-TPU transport has ~10 ms per-array overhead, a slow path
    # for bool arrays, and an element-wise (!) device->host path for small
    # transfers, so the streaming predictor moves exactly ONE uint8 buffer
    # in each direction per frame: [image u8 | bitpacked masks | valid bits]
    # in, [panoptic u8 | count | scores bitcast] out. This also minimizes
    # PCIe traffic on a directly-attached TPU.
    # ------------------------------------------------------------------

    def _pack_inputs(self, rgb_img, depth_img, perturbed_masks) -> np.ndarray:
        cfg = self.config
        h, w, n = cfg.height, cfg.width, self.max_instances
        buf = np.zeros((self._in_bytes,), np.uint8)
        # depth is stored mono and replicated to 3 channels on device
        depth_img = np.asarray(depth_img)
        dmono = depth_img[..., 0] if depth_img.ndim == 3 else depth_img
        if _native.available():
            # fused interleave (csrc/codec.cpp pack_rgbd)
            _native.pack_rgbd(np.asarray(rgb_img, np.uint8),
                              np.asarray(dmono, np.uint8),
                              buf[: self._img_bytes])
        else:
            img = buf[: self._img_bytes].reshape(h, w, 4)
            img[..., :3] = rgb_img
            img[..., 3] = dmono
        count = min(len(perturbed_masks), n)
        # pack only the used instance rows; the rest of the buffer stays zero
        mask_region = buf[self._img_bytes : self._img_bytes + self._mask_bytes]
        row_bytes = h * w // 8
        if count:
            used = np.asarray(perturbed_masks[:count]) > 0
            mask_region[: count * row_bytes] = np.packbits(
                used.reshape(count, -1), axis=1
            ).reshape(-1)
        valid = np.zeros((n,), bool)
        valid[:count] = True
        buf[self._img_bytes + self._mask_bytes :] = np.packbits(valid)
        return buf

    def _encode_rgb_nibbles(self, rgb_img):
        """Planar first-difference 4-bit RGB codec (layout in __init__).

        The planar (channel-major) mod-256 first difference of camera RGB
        is dominated by small residuals; each travels as a signed nibble,
        with nibble 0b1000 (-8) reserved as an escape marker whose full
        residual byte is appended densely in scan order. Returns the
        [n_esc u32 | nibbles 3hw/2 | esc u8 x max_rgb_esc] block, or None
        when escapes exceed the budget (incompressible RGB).

        Packing runs per frame on the producer thread; the single-pass C++
        codec (csrc/codec.cpp via quber_tpu/transport_native.py, ~4x the
        multi-pass numpy below) is used when built, with this numpy body
        kept as the byte-identical fallback."""
        if _native.available():
            block = np.empty((self._rgb_codec_block,), np.uint8)
            n_esc = _native.rgb_nibble_encode(
                np.asarray(rgb_img, np.uint8), self.max_rgb_esc, block
            )
            return None if n_esc < 0 else block
        rgbp = np.ascontiguousarray(
            np.asarray(rgb_img, np.uint8).transpose(2, 0, 1)
        ).reshape(-1)
        delta = rgbp.copy()
        delta[1:] -= rgbp[:-1]  # u8 wraparound == mod-256 residual
        s = delta.view(np.int8)
        esc = (s < -7) | (s > 7)
        n_esc = int(esc.sum())
        if n_esc > self.max_rgb_esc:
            return None
        nib = np.where(esc, np.uint8(8), delta & np.uint8(0xF))
        block = np.zeros((self._rgb_codec_block,), np.uint8)
        block[:4] = np.array([n_esc], np.uint32).view(np.uint8)
        nbytes = nib.size // 2
        block[4 : 4 + nbytes] = (nib[0::2] << 4) | nib[1::2]
        block[4 + nbytes : 4 + nbytes + n_esc] = delta[esc]
        return block

    def _encode_rgb_5bit(self, rgb_img):
        """Planar first-difference 5-bit RGB codec (layout in __init__):
        signed 5-bit fields in [-15, 15], 0b10000 (-16) the escape marker,
        packed LSB-first (value i at stream bits [5i, 5i+5), matching the
        device decode's little-endian window extraction). Holds on the
        textured/noisy streams where the 4-bit codec overflows its escape
        budget. Returns the block or None on escape-budget overflow.
        The C++ single-pass encoder (csrc/codec.cpp rgb_5bit_encode) is
        used when built; this numpy body is the byte-identical fallback."""
        if _native.available():
            block = np.empty((self._rgb_codec5_block,), np.uint8)
            n_esc = _native.rgb_5bit_encode(
                np.asarray(rgb_img, np.uint8), self.max_rgb_esc5, block
            )
            return None if n_esc < 0 else block
        rgbp = np.ascontiguousarray(
            np.asarray(rgb_img, np.uint8).transpose(2, 0, 1)
        ).reshape(-1)
        delta = rgbp.copy()
        delta[1:] -= rgbp[:-1]  # u8 wraparound == mod-256 residual
        s = delta.view(np.int8)
        esc = (s < -15) | (s > 15)
        n_esc = int(esc.sum())
        if n_esc > self.max_rgb_esc5:
            return None
        field = np.where(esc, np.uint8(16), delta & np.uint8(0x1F))
        # LSB-first bit pack: bit j of value i -> stream bit 5i + j
        bits = (field[:, None] >> np.arange(5, dtype=np.uint8)) & 1
        packed = np.packbits(bits.reshape(-1), bitorder="little")
        block = np.zeros((self._rgb_codec5_block,), np.uint8)
        block[:4] = np.array([n_esc], np.uint32).view(np.uint8)
        block[4 : 4 + packed.size] = packed
        block[4 + self._rgb5_bytes : 4 + self._rgb5_bytes + n_esc] = delta[esc]
        return block

    def _pack_inputs_rle(self, rgb_img, depth_img, perturbed_masks,
                         rgb_codec: int = 0):
        """RLE input layout: [rgb | n_nz u32 | depth-delta pos u32 x D |
        depth-delta val u8 x D | starts u32 x R | ends u32 x R | valid].
        With `rgb_codec` (4 or 5), the raw rgb block is replaced by the
        4-bit nibble block from _encode_rgb_nibbles (~0.6x the bytes for
        camera-like RGB) or the 5-bit block from _encode_rgb_5bit (~0.7x,
        holds on textured streams where 4-bit escapes overflow).

        Depth is delta-coded (first difference of the flattened mono map,
        mod 256) with only the nonzero deltas stored sparsely; the device
        rebuilds it with a scatter + prefix sum. Starts/ends are absolute
        positions in the flattened [N * H * W] mask stack; padding runs are
        (L, L) with L = N * H * W, which decode to nothing. Returns None
        when the masks need more than max_in_runs runs or the depth needs
        more than max_depth_nz deltas (caller falls back to the dense
        bitpacked layout).
        """
        cfg = self.config
        h, w, n = cfg.height, cfg.width, self.max_instances
        r = self.max_in_runs
        dmax = self.max_depth_nz
        rgb_codec = 4 if rgb_codec is True else int(rgb_codec or 0)
        depth_img = np.asarray(depth_img)
        dmono = depth_img[..., 0] if depth_img.ndim == 3 else depth_img
        dflat = dmono.reshape(-1).astype(np.uint8)
        if _native.available():
            return self._pack_inputs_rle_native(rgb_img, dflat,
                                                perturbed_masks, rgb_codec)
        delta = dflat.copy()
        delta[1:] -= dflat[:-1]  # u8 wraparound == mod-256 delta
        dpos = np.flatnonzero(delta)
        if len(dpos) > dmax:
            return None
        count = min(len(perturbed_masks), n)
        total = n * h * w
        if count:
            stack = np.asarray(perturbed_masks[:count])
            flat = stack.reshape(-1) if stack.dtype == bool else (
                stack.reshape(-1) > 0
            )
            # single boundary pass: transitions alternate start/end, so one
            # flatnonzero + stride-2 slicing replaces diff + two scans
            # (this runs per frame on the packer thread — host CPU is a
            # pipeline stage on the 1-core tunnel host)
            idx = np.flatnonzero(flat[1:] != flat[:-1]) + 1
            if flat[0]:
                starts = np.concatenate([[0], idx[1::2]])
                ends = idx[0::2]
            else:
                starts = idx[0::2]
                ends = idx[1::2]
            if flat[-1]:
                ends = np.concatenate([ends, [flat.size]])
            if len(starts) > r:
                return None
        else:
            starts = ends = np.zeros((0,), np.int64)
        if rgb_codec:
            if rgb_codec == 5:
                rgb_block = self._encode_rgb_5bit(rgb_img)
                nbytes, blk = self._in_bytes_rlec5, self._rgb_codec5_block
            else:
                rgb_block = self._encode_rgb_nibbles(rgb_img)
                nbytes, blk = self._in_bytes_rlec, self._rgb_codec_block
            if rgb_block is None:
                return None
            buf = np.empty((nbytes,), np.uint8)
            buf[:blk] = rgb_block
            o = blk
        else:
            buf = np.empty((self._in_bytes_rle,), np.uint8)
            buf[: self._rgb_bytes] = np.asarray(rgb_img, np.uint8).reshape(-1)
            o = self._rgb_bytes
        buf[o : o + 4] = np.array([len(dpos)], np.uint32).view(np.uint8)
        dmax_arr = np.full((dmax,), h * w, np.uint32)  # sentinel: dropped
        dmax_arr[: len(dpos)] = dpos
        buf[o + 4 : o + 4 + 4 * dmax] = dmax_arr.view(np.uint8)
        dvals = np.zeros((dmax,), np.uint8)
        dvals[: len(dpos)] = delta[dpos]
        buf[o + 4 + 4 * dmax : o + self._depth_block] = dvals
        o += self._depth_block
        runs = np.full((2 * r,), total, np.uint32)
        runs[: len(starts)] = starts
        runs[r : r + len(ends)] = ends
        buf[o : o + 8 * r] = runs.view(np.uint8)
        valid = np.zeros((n,), bool)
        valid[:count] = True
        buf[o + 8 * r :] = np.packbits(valid)
        return buf

    def _pack_inputs_rle_native(self, rgb_img, dflat, perturbed_masks,
                                rgb_codec: int):
        """Single-pass C++ pack (csrc/codec.cpp): byte-identical to the
        numpy body of _pack_inputs_rle, writing each block straight into
        the transfer buffer. Ordered cheapest-first so budget-overflow
        fallbacks (return None) waste minimal work: depth -> mask runs ->
        rgb."""
        cfg = self.config
        h, w, n = cfg.height, cfg.width, self.max_instances
        r = self.max_in_runs
        dmax = self.max_depth_nz
        total = n * h * w
        nbytes, blk = {
            0: (self._in_bytes_rle, self._rgb_bytes),
            4: (self._in_bytes_rlec, self._rgb_codec_block),
            5: (self._in_bytes_rlec5, self._rgb_codec5_block),
        }[int(rgb_codec)]
        buf = np.empty((nbytes,), np.uint8)
        o = blk
        kd = _native.depth_delta_encode(
            dflat, dmax, h * w,
            buf[o + 4 : o + 4 + 4 * dmax],
            buf[o + 4 + 4 * dmax : o + self._depth_block],
        )
        if kd < 0:
            return None
        buf[o : o + 4] = np.array([kd], np.uint32).view(np.uint8)
        ro = o + self._depth_block
        count = min(len(perturbed_masks), n)
        if count:
            stack = np.asarray(perturbed_masks[:count])
            kr = _native.mask_runs_encode(
                stack, r, total, buf[ro : ro + 4 * r],
                buf[ro + 4 * r : ro + 8 * r],
            )
            if kr < 0:
                return None
        else:
            sent = np.full((2 * r,), total, np.uint32)
            buf[ro : ro + 8 * r] = sent.view(np.uint8)
        if rgb_codec == 5:
            ne = _native.rgb_5bit_encode(
                np.asarray(rgb_img, np.uint8), self.max_rgb_esc5,
                buf[: self._rgb_codec5_block],
            )
            if ne < 0:
                return None
        elif rgb_codec:
            ne = _native.rgb_nibble_encode(
                np.asarray(rgb_img, np.uint8), self.max_rgb_esc,
                buf[: self._rgb_codec_block],
            )
            if ne < 0:
                return None
        else:
            buf[: self._rgb_bytes] = np.asarray(rgb_img, np.uint8).reshape(-1)
        valid = np.zeros((n,), bool)
        valid[:count] = True
        buf[ro + 8 * r :] = np.packbits(valid)
        return buf

    def _unpack_buf_rle(self, buf, rgb_codec: int = 0):
        cfg = self.config
        h, w, n = cfg.height, cfg.width, self.max_instances
        r = self.max_in_runs
        dmax = self.max_depth_nz
        rgb_codec = 4 if rgb_codec is True else int(rgb_codec or 0)
        if rgb_codec:
            # inverse of _encode_rgb_nibbles / _encode_rgb_5bit: fixed-width
            # signed fields -> residuals, escape positions recovered from
            # the marker mask by prefix sum, pixels rebuilt with one planar
            # mod-256 cumsum.
            if rgb_codec == 4:
                nbytes, max_esc = (3 * h * w) // 2, self.max_rgb_esc
                nb = buf[4 : 4 + nbytes]
                v = jnp.stack(
                    [(nb >> 4).astype(jnp.int32), (nb & 15).astype(jnp.int32)],
                    axis=-1,
                ).reshape(-1)
                s = jnp.where(v >= 8, v - 16, v)  # signed nibble in [-8, 7]
                marker = s == -8
                o = self._rgb_codec_block
            else:  # 5-bit fields, packed LSB-first: value i occupies stream
                # bits [5i, 5i+5), extracted via a little-endian 2-byte window
                nbytes, max_esc = self._rgb5_bytes, self.max_rgb_esc5
                nb = jnp.concatenate(
                    [buf[4 : 4 + nbytes], jnp.zeros((1,), buf.dtype)]
                ).astype(jnp.int32)
                bit = jnp.arange(3 * h * w, dtype=jnp.int32) * 5
                byi = bit >> 3
                win = nb[byi] | (nb[byi + 1] << 8)
                v = (win >> (bit & 7)) & 0x1F
                s = jnp.where(v >= 16, v - 32, v)  # signed 5-bit [-16, 15]
                marker = s == -16
                o = self._rgb_codec5_block
            eidx = jnp.cumsum(marker.astype(jnp.int32)) - 1
            evals = buf[4 + nbytes : 4 + nbytes + max_esc].astype(jnp.int32)
            ev = evals[jnp.clip(eidx, 0, max_esc - 1)]
            res = jnp.where(marker, ev, s & 0xFF)  # mod-256 residual
            flat = jnp.cumsum(res) % 256
            rgb = jnp.transpose(
                flat.reshape(3, h, w), (1, 2, 0)
            ).astype(jnp.float32)
        else:
            rgb = buf[: self._rgb_bytes].reshape(h, w, 3).astype(jnp.float32)
            o = self._rgb_bytes
        # depth: scatter the sparse mod-256 deltas, prefix-sum, wrap.
        # Padding entries carry index h*w (out of range) and drop.
        dpos = jax.lax.bitcast_convert_type(
            buf[o + 4 : o + 4 + 4 * dmax].reshape(dmax, 4), jnp.uint32
        ).astype(jnp.int32)
        dvals = buf[o + 4 + 4 * dmax : o + self._depth_block]
        ddelta = (
            jnp.zeros((h * w,), jnp.int32)
            .at[dpos].set(dvals.astype(jnp.int32), mode="drop")
        )
        depth = (jnp.cumsum(ddelta) % 256).astype(jnp.float32).reshape(h, w)
        image = jnp.concatenate(
            [rgb, jnp.repeat(depth[..., None], 3, axis=-1)], axis=-1
        )
        o += self._depth_block
        runs = jax.lax.bitcast_convert_type(
            buf[o : o + 8 * r].reshape(2 * r, 4),
            jnp.uint32,
        ).astype(jnp.int32)
        starts, ends = runs[:r], runs[r:]
        total = n * h * w
        # delta-trick decode: +1 at starts, -1 at ends, inclusive prefix sum.
        # Padding runs hit index `total` (+1 then -1: net zero).
        delta = (
            jnp.zeros((total + 1,), jnp.int32)
            .at[starts].add(1)
            .at[ends].add(-1)
        )
        masks = (jnp.cumsum(delta[:-1]) > 0).reshape(n, h, w)
        valid = unpack_bits_device(buf[o + 8 * r :], n)
        return image, masks, valid

    def _unpack_buf(self, buf):
        cfg = self.config
        h, w, n = cfg.height, cfg.width, self.max_instances
        img4 = buf[: self._img_bytes].reshape(h, w, 4).astype(jnp.float32)
        image = jnp.concatenate(
            [img4[..., :3], jnp.repeat(img4[..., 3:4], 3, axis=-1)], axis=-1
        )
        packed = buf[self._img_bytes : self._img_bytes + self._mask_bytes]
        masks = unpack_bits_device(packed.reshape(n, h * w // 8), h * w).reshape(n, h, w)
        valid = unpack_bits_device(buf[self._img_bytes + self._mask_bytes :], n)
        return image, masks, valid

    def _pack_pan_planes(self, pan_flat):
        """int panoptic map [h*w] -> bitplane-packed u8 [_pan_bytes].

        Plane k holds bit k of every pixel, packbits-style (bitorder='big',
        matching np.unpackbits on the host). Shift-and-add over 8 lanes is
        a handful of VPU ops; the payoff is 8/_pan_bits less D2H."""
        p = pan_flat.astype(jnp.uint32)
        weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint32)
        planes = []
        for k in range(self._pan_bits):
            bits = ((p >> k) & 1).reshape(-1, 8)
            planes.append((bits * weights).sum(axis=1).astype(jnp.uint8))
        return jnp.concatenate(planes)

    def _unpack_pan_planes(self, buf: np.ndarray) -> np.ndarray:
        """host inverse of _pack_pan_planes -> int32 [h*w]."""
        hw8 = self._pan_bytes // self._pan_bits
        planes = np.unpackbits(
            buf[: self._pan_bytes].reshape(self._pan_bits, hw8), axis=1
        ).astype(np.int32)
        pan = planes[0]
        for k in range(1, self._pan_bits):
            pan |= planes[k] << k
        return pan

    def _pack_out(self, out):
        """bitplane panoptic | num_instances u8 | scores f32 bitcast."""
        pan = self._pack_pan_planes(out["panoptic_seg"].reshape(-1))
        cnt = out["num_instances"].astype(jnp.uint8).reshape(1)
        scores = jax.lax.bitcast_convert_type(
            out["instance_scores"], jnp.uint8
        ).reshape(-1)
        return jnp.concatenate([pan, cnt, scores])

    def _pipeline_packed_impl(self, params, buf):
        image, masks, valid = self._unpack_buf(buf)
        out = self._pipeline_impl(params, image, masks, valid)
        return self._pack_out(out)

    def _pre_batch(self, params, bufs, unpack):
        """Vmapped unpack + pre stages around the natively-batched Pallas
        encode kernel (a straight vmap of the single-frame pipeline produces
        unsupported Pallas block shapes)."""
        images, masks, valids = jax.vmap(unpack)(bufs)
        return self._pre_batch_tensors(params, images, masks, valids)

    def _pre_batch_tensors(self, params, images, masks, valids):
        """Pre stages (encode -> forward -> center NMS) on already-dense
        batch tensors: images [B,H,W,6] f32, masks [B,N,H,W] bool,
        valids [B,N] bool."""
        encs = None
        if self._use_pallas():
            from quber_tpu.ops.encoding import instance_stats
            from quber_tpu.ops.pallas_kernels import (
                encode_initial_masks_pallas_batched,
            )

            areas, centers = jax.vmap(instance_stats)(masks, valids)
            encs = encode_initial_masks_pallas_batched(
                masks, valids & (areas > 0), centers, sigma=10, normalize=True
            )
        if encs is None:
            return jax.vmap(
                lambda i, m, v: self._pre_impl(params, i, m, v)
            )(images, masks, valids)
        return jax.vmap(
            lambda i, m, v, e: self._pre_impl(params, i, m, v, enc=e)
        )(images, masks, valids, encs)

    def _unpack_for(self, input_rle):
        """input_rle: False (dense), True (RLE, raw rgb), "codec" (RLE +
        4-bit RGB codec), "codec5" (RLE + 5-bit RGB codec)."""
        if input_rle == "codec":
            return partial(self._unpack_buf_rle, rgb_codec=4)
        if input_rle == "codec5":
            return partial(self._unpack_buf_rle, rgb_codec=5)
        return self._unpack_buf_rle if input_rle else self._unpack_buf

    def _group_batch(self, pre):
        from quber_tpu.ops.grouping import group_pixels
        from quber_tpu.ops.pallas_kernels import group_pixels_pallas_batched

        if self._use_pallas():
            return group_pixels_pallas_batched(
                pre["centers"], pre["centers_valid"], pre["offset"]
            )
        return jax.vmap(group_pixels)(
            pre["centers"], pre["centers_valid"], pre["offset"]
        )

    def _pipeline_packed_batch_impl(self, params, bufs, input_rle=False):
        """Batched packed pipeline: vmapped pre/post stages around the
        natively-batched Pallas encode + grouping kernels."""
        unpack = self._unpack_for(input_rle)
        pre = self._pre_batch(params, bufs, unpack)
        outs = self._group_and_post_batch(pre)
        return jax.vmap(self._pack_out)(outs)

    def _pipeline_dense_batch_impl(self, params, tensors):
        """Batched pipeline over pre-decoded HBM-resident tensors
        (stage_frames(decode=True)): skips the device-side input codecs
        entirely — on a PCIe-attached host dense frames DMA in directly, so
        serving from decoded tensors is the production schedule and saves
        the per-batch decode pass (~40% of pipeline time at 480x640 b16)."""
        images, masks, valids = tensors
        pre = self._pre_batch_tensors(params, images, masks, valids)
        outs = self._group_and_post_batch(pre)
        return jax.vmap(self._pack_out)(outs)

    def _pipeline_dense_batch_rle_impl(self, params, tensors):
        """Dense-input variant of _pipeline_packed_batch_rle_impl."""
        images, masks, valids = tensors
        pre = self._pre_batch_tensors(params, images, masks, valids)
        outs = self._group_and_post_batch(pre)
        rle = jax.vmap(self._pack_out_rle)(outs)
        pan_raw = jax.vmap(
            lambda o: self._pack_pan_planes(o["panoptic_seg"].reshape(-1))
        )(outs)
        return rle, pan_raw

    def _pack_out_rle(self, out):
        """[n_runs u32 | runs u32 x max_rle_runs | count u8 | scores f32],
        all bitcast to one u8 buffer. ~6x smaller than the raw panoptic map
        for grouped scenes — the device->host direction is the slow one on
        tunneled TPUs (~10-40 MB/s)."""
        runs, n_runs = rle_encode_device(
            out["panoptic_seg"].reshape(-1), self.max_rle_runs
        )
        head = jax.lax.bitcast_convert_type(
            n_runs.astype(jnp.uint32)[None], jnp.uint8
        ).reshape(-1)
        body = jax.lax.bitcast_convert_type(runs, jnp.uint8).reshape(-1)
        cnt = out["num_instances"].astype(jnp.uint8).reshape(1)
        scores = jax.lax.bitcast_convert_type(
            out["instance_scores"], jnp.uint8
        ).reshape(-1)
        return jnp.concatenate([head, body, cnt, scores])

    def _pipeline_packed_batch_rle_impl(self, params, bufs, input_rle=False):
        """Like _pipeline_packed_batch_impl but returns (rle u8 [B, rle_bytes],
        raw panoptic u8 [B, H*W]). The raw maps stay on device unless a
        frame's run count overflows the RLE budget."""
        unpack = self._unpack_for(input_rle)
        pre = self._pre_batch(params, bufs, unpack)
        outs = self._group_and_post_batch(pre)
        rle = jax.vmap(self._pack_out_rle)(outs)
        pan_raw = jax.vmap(
            lambda o: self._pack_pan_planes(o["panoptic_seg"].reshape(-1))
        )(outs)
        return rle, pan_raw

    def _unpack_outputs_rle(self, buf: np.ndarray, raw_fetch):
        """Decode one frame's RLE buffer; raw_fetch() supplies the raw map
        on budget overflow (an extra D2H, practically never taken)."""
        cfg = self.config
        h, w = cfg.height, cfg.width
        r = self.max_rle_runs
        n_runs = int(buf[:4].view(np.uint32)[0])
        if n_runs <= r:
            pan = rle_decode(buf[4 : 4 + 4 * r].view(np.uint32), n_runs, h * w)
        else:
            pan = self._unpack_pan_planes(np.asarray(raw_fetch()))
        pan = pan.reshape(h, w).astype(np.int32)
        count = int(buf[4 + 4 * r])
        scores = buf[4 + 4 * r + 1 :].view(np.float32)[: self._scores_len]
        return pan, count, scores

    def _unpack_outputs(self, buf: np.ndarray):
        cfg = self.config
        h, w = cfg.height, cfg.width
        pan = self._unpack_pan_planes(buf).reshape(h, w)
        count = int(buf[self._pan_bytes])
        scores = buf[self._pan_bytes + 1 :].view(np.float32)[: self._scores_len]
        return pan, count, scores

    def predict_packed(self, rgb_img, depth_img, perturbed_masks):
        """(panoptic [H, W] int32, count, scores) with one transfer each way."""
        buf = self._pack_inputs(rgb_img, depth_img, perturbed_masks)
        out = self._pipeline_packed(self.params, jnp.asarray(buf))
        return self._unpack_outputs(np.asarray(out))

    def predict_batch(self, frames):
        """Refine a list of (rgb, depth, masks) frames as ONE device call.

        TPU-idiomatic throughput path: stacks the packed input buffers,
        vmaps the fused pipeline over the frame axis (batching the convs
        onto the MXU), and moves one buffer each way. Returns a list of
        (panoptic, count, scores)."""
        bufs = np.stack([self._pack_inputs(*f) for f in frames])
        out = np.asarray(self._pipeline_packed_batch(self.params, jnp.asarray(bufs)))
        return [self._unpack_outputs(out[i]) for i in range(len(frames))]

    def sharded_batch_pipeline(self, mesh, use_rle: bool = False,
                               input_rle: bool = True):
        """Multi-chip serving: the batched refine pipeline sharded over the
        mesh's "data" axis with shard_map (params replicated, frame axis
        split across devices over ICI). The reference's inference
        parallelism is one shell script per GPU (eval_script.sh /
        bash/eval_{0..3}.sh, SURVEY §2d); here a single program serves the
        whole slice. Batch size must divide by the mesh size.

        Returns a jitted fn(params, bufs [B, in_bytes]) with the same output
        convention as the corresponding single-chip pipeline.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        if input_rle == "dense":
            impl = (self._pipeline_dense_batch_rle_impl if use_rle
                    else self._pipeline_dense_batch_impl)
        elif use_rle:
            impl = partial(self._pipeline_packed_batch_rle_impl, input_rle=input_rle)
        else:
            impl = partial(self._pipeline_packed_batch_impl, input_rle=input_rle)
        axis = mesh.axis_names[0]
        in_spec = ((P(axis), P(axis), P(axis)) if input_rle == "dense"
                   else P(axis))
        fn = shard_map(
            impl, mesh=mesh,
            in_specs=(P(), in_spec),
            out_specs=(P(axis), P(axis)) if use_rle else P(axis),
            # the pipeline is purely per-frame (no cross-device collectives);
            # varying-axis inference trips on scan carries initialized from
            # literals, so skip it
            check_vma=False,
        )
        in_shard = (
            tuple(NamedSharding(mesh, P(axis)) for _ in range(3))
            if input_rle == "dense" else NamedSharding(mesh, P(axis))
        )
        return jax.jit(
            fn,
            in_shardings=(NamedSharding(mesh, P()), in_shard),
        )

    def _pipe_for(self, rle_out: bool, rle_in, mesh=None):
        """Resolve the jitted batch pipeline for an (output, input) encoding
        pair; rle_in is False (dense), True (RLE, raw rgb), "codec"
        (4-bit RGB) or "codec5" (5-bit RGB)."""
        if mesh is None:
            return {
                (False, False): self._pipeline_packed_batch,
                (True, False): self._pipeline_packed_batch_rle,
                (False, True): self._pipeline_rlein_batch,
                (True, True): self._pipeline_rlein_batch_rle,
                (False, "codec"): self._pipeline_rlecin_batch,
                (True, "codec"): self._pipeline_rlecin_batch_rle,
                (False, "codec5"): self._pipeline_rlec5in_batch,
                (True, "codec5"): self._pipeline_rlec5in_batch_rle,
                (False, "dense"): self._pipeline_dense_batch,
                (True, "dense"): self._pipeline_dense_batch_rle,
            }[(rle_out, rle_in)]
        cache = self.__dict__.setdefault("_sharded_pipes", {})
        key = (mesh, rle_out, rle_in)
        if key not in cache:
            cache[key] = self.sharded_batch_pipeline(
                mesh, use_rle=rle_out, input_rle=rle_in
            )
        return cache[key]

    def _pack_batch(self, batch, batch_size: int, input_rle):
        """Host-side stage: pack a batch into one stacked uint8 buffer.
        Returns (rle_in mode, stacked [B, bytes], real). The batch is padded
        to `batch_size` with its first frame."""
        real = len(batch)
        batch = batch + [batch[0]] * (batch_size - real)
        if input_rle:
            try_codec = self._rgb_codec_ok
            if try_codec:
                packed = [
                    self._pack_inputs_rle(*f, rgb_codec=4) for f in batch
                ]
                if all(p is not None for p in packed):
                    return "codec", np.stack(packed), real
            try_codec5 = self._rgb_codec5_ok
            if try_codec5:
                # 4-bit escapes overflowed (textured/noisy RGB): the wider
                # 5-bit fields usually still beat raw by ~20% on the wire
                packed = [
                    self._pack_inputs_rle(*f, rgb_codec=5) for f in batch
                ]
                if all(p is not None for p in packed):
                    if try_codec:
                        self._rgb_codec_ok = False  # skip 4-bit next time
                    self._rgb_codec5_strikes = 0
                    return "codec5", np.stack(packed), real
            packed = [self._pack_inputs_rle(*f) for f in batch]
            if all(p is not None for p in packed):
                if try_codec and not try_codec5:
                    self._rgb_codec_ok = False
                if try_codec5:
                    # this batch goes raw; disarm the 5-bit tier (and the
                    # 4-bit attempt with it) only after 3 consecutive
                    # over-budget batches — see __init__
                    self._rgb_codec5_strikes += 1
                    if self._rgb_codec5_strikes >= 3:
                        self._rgb_codec_ok = False
                        self._rgb_codec5_ok = False
                return True, np.stack(packed), real
        # dense fallback: a frame's masks exceeded the input run budget
        return False, np.stack([self._pack_inputs(*f) for f in batch]), real

    def _drain_batch(self, pending, mode, forced: bool):
        """Consumer stage: blocking D2H of one dispatched batch, yielding
        per-frame outputs."""
        was_rle, out, real = pending
        if was_rle:
            rle, raw = out
            host = device_get_split(rle)
            # If any frame overflowed the RLE run budget, fetch the raw
            # maps for the WHOLE batch in one bulk D2H: per-frame raw
            # fetches fall below the transport's bulk-transfer threshold
            # and cost ~10x more than one batched readback.
            n_runs = host[:real, :4].copy().view(np.uint32)[:, 0]
            overflow = n_runs > self.max_rle_runs
            raw_host = device_get_split(raw) if overflow.any() else None
            if overflow.all() and not forced:
                # fragmented outputs: every frame pays RLE + raw D2H.
                # Switch the rest of this stream (and future auto-mode
                # streams) to the raw path, which is strictly cheaper.
                mode["rle"] = False
                self._rle_fragmenting = True
            for i in range(real):
                yield self._unpack_outputs_rle(
                    host[i], lambda i=i: raw_host[i]
                )
        else:
            host = device_get_split(out)
            for i in range(real):
                yield self._unpack_outputs(host[i])

    def stage_frames(self, frames, batch_size: int = 8, input_rle=True,
                     decode: bool = True):
        """Pack frames into device-resident batch buffers ahead of serving.

        Production serving on a real TPU host stages inputs in HBM while the
        previous step computes: H2D rides PCIe at >= 16 GB/s, < 0.1 ms for a
        packed 480x640 frame, so input transfer never gates throughput (the
        reference's timing semantics likewise include a negligible PCIe copy,
        eval/refiner_model.py:265-278). This helper is that staging step,
        separated so callers (and the benchmark) can overlap or amortize it
        explicitly — on a *tunneled* dev TPU the link (8-72 MB/s) would
        otherwise dominate all measurement. Returns a list of staged batches
        for predict_batch_stream_staged; the transfer is fenced, so staged
        buffers are resident in HBM when this returns.

        With `decode` (default), each staged batch is decoded ONCE into
        dense tensors (images f32, masks bool, valids) at staging time, so
        serving skips the device-side input codecs — the schedule of a
        PCIe-attached host, which DMAs dense frames directly (the packed
        layouts exist for the slow tunneled link, and their decode costs as
        much as the backbone at 480x640 b16). ~15 MB HBM per staged frame
        (f32 image + bool mask stack) — bounded in production by the frames
        actually in flight, not the stream length.
        `decode=False` keeps packed buffers resident and decodes per serve
        (less HBM; exercises the transport-codec path end to end).
        """
        staged = []
        batch = []

        def flush(b):
            rle_in, stacked, real = self._pack_batch(b, batch_size, input_rle)
            bufs = device_put_split(stacked)
            if decode:
                if rle_in not in self._staged_decoders:
                    unpack = self._unpack_for(rle_in)
                    self._staged_decoders[rle_in] = jax.jit(
                        lambda bs, u=unpack: jax.vmap(u)(bs)
                    )
                staged.append(
                    ("dense", self._staged_decoders[rle_in](bufs), real)
                )
            else:
                staged.append((rle_in, bufs, real))

        for frame in frames:
            batch.append(frame)
            if len(batch) == batch_size:
                flush(batch)
                batch = []
        if batch:
            flush(batch)
        for _, bufs, _ in staged:
            transport_fence(jax.tree.leaves(bufs)[0])
        return staged

    def predict_batch_stream_staged(self, staged, use_rle: bool | None = None,
                                    prefetch: int = 2, mesh=None):
        """Serve pre-staged (HBM-resident) batches from stage_frames.

        Dispatches the jitted pipeline up to `prefetch` batches ahead of the
        consumer's blocking D2H so device compute overlaps output readback —
        the same schedule as predict_batch_stream minus host packing and
        input H2D. Yields the same per-frame outputs.
        """
        if not staged:
            return
        forced = use_rle is not None
        batch_size = int(jax.tree.leaves(staged[0][1])[0].shape[0])
        mode = {
            "rle": use_rle if forced else (
                batch_size * self._rle_bytes >= 320_000
                and not self._rle_fragmenting
            )
        }
        pending = []
        for rle_in, bufs, real in staged:
            pipe = self._pipe_for(mode["rle"], rle_in, mesh)
            pending.append((mode["rle"], pipe(self.params, bufs), real))
            if len(pending) > prefetch:
                yield from self._drain_batch(pending.pop(0), mode, forced)
        for p in pending:
            yield from self._drain_batch(p, mode, forced)

    def predict_batch_stream(self, frames, batch_size: int = 8,
                             use_rle: bool | None = None, prefetch: int = 2,
                             input_rle: bool = True, mesh=None):
        """Stream frames in fixed-size device batches with a producer-thread
        pipeline (the last partial batch is padded with its first frame).

        A single producer thread packs inputs, transfers them, and dispatches
        the jitted pipeline up to `prefetch` batches ahead of the consumer,
        so host packing + H2D of batch t+1 overlap device compute of batch t
        and the consumer's (blocking) D2H of batch t-1. On the tunneled TPU
        this pipelining is worth ~2.5x end-to-end throughput — the transport
        serializes otherwise. `prefetch=0` runs everything inline.

        Results come back run-length encoded (one bulk u8 buffer per batch;
        raw panoptic maps stay on device as the overflow fallback) whenever
        the batched RLE buffer is large enough for the bulk D2H path;
        otherwise the raw-map batch path is used. If a whole batch overflows
        the RLE run budget (fragmented maps, e.g. untrained weights), the
        stream adaptively switches to the raw path, which is then strictly
        cheaper. `use_rle` pins the choice (tests / directly-attached TPUs).

        Inputs travel run-length encoded by default (`input_rle`): the mask
        stack compresses ~10x for typical scenes, and decode on device is a
        two-scatter delta + prefix sum. Any frame exceeding `max_in_runs`
        runs sends its whole batch through the dense bitpacked layout.

        Pass a `jax.sharding.Mesh` as `mesh` to serve each batch sharded
        over the mesh's first axis (multi-chip data-parallel inference over
        ICI; batch_size must divide by the mesh size).
        """
        forced = use_rle is not None
        mode = {
            "rle": use_rle if forced else (
                batch_size * self._rle_bytes >= 320_000
                and not self._rle_fragmenting
            )
        }
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
            assert batch_size % n_dev == 0, (
                f"batch_size {batch_size} must divide over the {n_dev}-device mesh"
            )

        def pipe(rle_out: bool, rle_in):
            return self._pipe_for(rle_out, rle_in, mesh)

        def pack_batch(batch):
            return self._pack_batch(batch, batch_size, input_rle)

        # per-send stream-count adaptation: on unless the caller pinned a
        # count via QUBER_H2D_STREAMS, and only for payloads big enough
        # that the feedback fence (one small D2H round trip) is noise
        env_streams = os.environ.get("QUBER_H2D_STREAMS", "auto")
        tuner = self.__dict__.setdefault("_h2d_tuner", _H2DTuner())

        def send_batch(staged):
            """Transport + dispatch stage: H2D the stacked buffer (split
            across concurrent streams, count tuned online) and launch the
            jitted pipeline."""
            rle_in, stacked, real = staged
            if env_streams == "auto" and stacked.nbytes >= (4 << 20):
                count = tuner.pick()
                t0 = time.time()
                bufs = device_put_split(stacked, streams=count)
                # fence + bandwidth report off the critical path: the next
                # send may start while this transfer's tail drains (the
                # link stays busy; the EMA absorbs the timing overlap)
                def _report(bufs=bufs, count=count, t0=t0, nb=stacked.nbytes):
                    try:
                        transport_fence(bufs)
                        tuner.report(count, nb / 1e6 / (time.time() - t0))
                    except Exception:
                        pass  # fence is advisory; never kill the stream
                threading.Thread(target=_report, daemon=True).start()
            else:
                bufs = device_put_split(stacked)
            return mode["rle"], pipe(mode["rle"], rle_in)(self.params, bufs), real

        def flush(batch):
            return send_batch(pack_batch(batch))

        def drain(pending):
            return self._drain_batch(pending, mode, forced)

        def batches():
            batch = []
            for frame in frames:
                batch.append(frame)
                if len(batch) == batch_size:
                    yield batch
                    batch = []
            if batch:
                yield batch

        if prefetch <= 0:
            for batch in batches():
                yield from drain(flush(batch))
            return

        import queue
        import threading

        # Two producer stages on separate threads — packer (pure host CPU)
        # and sender (network H2D + dispatch) — so steady-state throughput is
        # max(pack, send, consume) per batch instead of max(pack+send,
        # consume). On the tunneled TPU pack is ~30% of a batch interval;
        # overlapping it with the H2D of the previous batch is free.
        q_staged: queue.Queue = queue.Queue(maxsize=prefetch)
        q_sent: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = threading.Event()
        _END, _ERR = object(), object()

        def put(q, item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    pass
            return False  # consumer abandoned the generator

        def packer():
            try:
                for batch in batches():
                    if not put(q_staged, pack_batch(batch)):
                        return
                put(q_staged, _END)
            except BaseException as e:  # surface in the consumer
                put(q_staged, (_ERR, e))

        def sender():
            try:
                while True:
                    staged = q_staged.get()
                    if staged is _END or (
                        isinstance(staged, tuple) and staged[0] is _ERR
                    ):
                        put(q_sent, staged)
                        return
                    if not put(q_sent, send_batch(staged)):
                        return
            except BaseException as e:
                put(q_sent, (_ERR, e))

        threads = [
            threading.Thread(target=packer, daemon=True),
            threading.Thread(target=sender, daemon=True),
        ]
        for t in threads:
            t.start()
        try:
            while True:
                item = q_sent.get()
                if item is _END:
                    break
                if isinstance(item, tuple) and item[0] is _ERR:
                    raise item[1]
                yield from drain(item)
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=5.0)

    def predict_stream(self, frames):
        """Generator over (rgb, depth, masks) frames with double buffering:
        frame t+1's transfer + compute overlap frame t's result fetch."""
        prev = None
        for frame in frames:
            buf = self._pack_inputs(*frame)
            cur = self._pipeline_packed(self.params, jnp.asarray(buf))
            if prev is not None:
                yield self._unpack_outputs(np.asarray(prev))
            prev = cur
        if prev is not None:
            yield self._unpack_outputs(np.asarray(prev))

    def _assemble_image(self, rgb_img, depth_img):
        cfg = self.config
        chans = []
        if cfg.rgb_on:
            chans.append(np.asarray(rgb_img, np.float32))
        if cfg.depth_on:
            chans.append(np.asarray(depth_img, np.float32))
        return np.concatenate(chans, axis=-1)

    def predict_raw(self, rgb_img, depth_img, perturbed_masks):
        """Device-side result dict (jax arrays), fixed shapes. Inputs:
        rgb_img [H, W, 3] BGR uint8; depth_img [H, W, 3] normalized depth;
        perturbed_masks [N, H, W] (bool or uint8)."""
        cfg = self.config
        image = self._assemble_image(rgb_img, depth_img)
        h, w = image.shape[:2]
        assert (h, w) == (cfg.height, cfg.width), (
            f"predictor is compiled for {cfg.height}x{cfg.width}, got {h}x{w}"
        )
        n = self.max_instances
        masks = np.zeros((n, h, w), bool)
        count = min(len(perturbed_masks), n)
        for i in range(count):
            masks[i] = np.asarray(perturbed_masks[i]) > 0
        valid = np.zeros((n,), bool)
        valid[:count] = True
        return self._pipeline(
            self.params, jnp.asarray(image), jnp.asarray(masks), jnp.asarray(valid)
        )

    def predict(self, rgb_img, depth_img=None, perturbed_masks=None):
        """Reference-compatible predict: returns a list with one result dict
        holding 'sem_seg', 'eee_mask', 'eee_boundary', 'panoptic_seg' and an
        'instances' dict with pred_masks/scores/pred_classes/pred_boxes
        (predictor.py:287-359 / model.py:259-358)."""
        if perturbed_masks is None:
            perturbed_masks = []
        raw = self.predict_raw(rgb_img, depth_img, perturbed_masks)
        pan = np.asarray(raw["panoptic_seg"])
        n = int(raw["num_instances"])
        out = {
            "sem_seg": np.asarray(raw["sem_seg"]),
            "panoptic_seg": (pan, None),
        }
        if "eee_mask" in raw:
            out["eee_mask"] = np.asarray(raw["eee_mask"])
        if "eee_boundary" in raw:
            out["eee_boundary"] = np.asarray(raw["eee_boundary"])
        if n > 0:
            masks = pan[None] == np.arange(1, n + 1)[:, None, None]
            scores = np.asarray(raw["instance_scores"])[1 : n + 1]
            out["instances"] = {
                "pred_masks": masks,
                "scores": scores,
                "pred_classes": np.zeros((n,), np.int64),
                "pred_boxes": masks_to_boxes(masks),
            }
        return [out]


class MultiScalePredictor:
    """Arbitrary-resolution predict via ResizeShortestEdge + shape buckets.

    The reference eval path runs detectron2's ResizeShortestEdge test-time
    transform so one trained model serves datasets at several native
    resolutions (perturbed_panoptic_dataset_mapper.py:84-92; armbench eval
    at MIN_SIZE_TEST). Under XLA everything is compiled at static shapes, so
    instead of one program per image size this wrapper scales the shorter
    side to `short` (capped at `max_size`), pads up to a /`divisor` shape
    bucket, and dispatches to a per-bucket cached MaskRefinerPredictor — all
    buckets share one param tree, so the cost of a new bucket is one compile,
    not a new model. Outputs are cropped and resized back to the input size.
    """

    def __init__(
        self,
        config: MaskRefinerConfig | None = None,
        params=None,
        short: int = 480,
        max_size: int = 640,
        divisor: int = 32,
        **predictor_kwargs,
    ):
        self.base_cfg = config or MaskRefinerConfig()
        self.short = short
        self.max_size = max_size
        self.divisor = divisor
        self.kw = predictor_kwargs
        self._cache: dict[tuple[int, int], MaskRefinerPredictor] = {}
        self.params = params
        if self.params is None:
            proto = self._predictor_for(self.base_cfg.height, self.base_cfg.width)
            self.params = proto.params

    def _predictor_for(self, ph: int, pw: int) -> MaskRefinerPredictor:
        key = (ph, pw)
        if key not in self._cache:
            import dataclasses

            cfg = dataclasses.replace(self.base_cfg, height=ph, width=pw)
            self._cache[key] = MaskRefinerPredictor(cfg, params=self.params, **self.kw)
        return self._cache[key]

    @property
    def num_buckets(self) -> int:
        return len(self._cache)

    def predict(self, rgb_img, depth_img=None, perturbed_masks=None):
        import cv2

        from quber_tpu.data.mappers import bucket_shape, resize_shortest_edge

        rgb_img = np.asarray(rgb_img)
        h0, w0 = rgb_img.shape[:2]
        rh, rw = resize_shortest_edge(h0, w0, self.short, self.max_size)
        ph, pw = bucket_shape(rh, rw, self.divisor)
        pred = self._predictor_for(ph, pw)

        def to_bucket(img, interp):
            img = np.asarray(img)
            if img.shape[:2] != (rh, rw):
                img = cv2.resize(img.astype(np.float32), (rw, rh), interpolation=interp)
            pads = [(0, ph - rh), (0, pw - rw)] + [(0, 0)] * (img.ndim - 2)
            return np.pad(img, pads)

        rgb_b = to_bucket(rgb_img, cv2.INTER_LINEAR)
        depth_b = (
            to_bucket(depth_img, cv2.INTER_NEAREST)
            if depth_img is not None
            else np.zeros((ph, pw, 3), np.float32)
        )
        masks_b = [
            to_bucket((np.asarray(m) > 0).astype(np.uint8), cv2.INTER_NEAREST) > 0.5
            for m in ([] if perturbed_masks is None else perturbed_masks)
        ]
        out = pred.predict(rgb_b, depth_b, masks_b)[0]

        def back(arr, interp, channels_first=False):
            arr = np.asarray(arr, np.float32)
            if channels_first:  # [C, H, W] (reference sem-seg layout)
                arr = np.transpose(arr, (1, 2, 0))
            arr = cv2.resize(arr[:rh, :rw], (w0, h0), interpolation=interp)
            return np.transpose(arr, (2, 0, 1)) if channels_first else arr

        pan = back(out["panoptic_seg"][0], cv2.INTER_NEAREST).astype(np.int32)
        res = {"sem_seg": back(out["sem_seg"], cv2.INTER_LINEAR),
               "panoptic_seg": (pan, None)}
        for k in ("eee_mask", "eee_boundary"):
            if k in out:
                res[k] = back(out[k], cv2.INTER_LINEAR, channels_first=True)
        if "instances" in out:
            n = len(out["instances"]["scores"])
            masks = pan[None] == np.arange(1, n + 1)[:, None, None]
            keep = masks.any(axis=(1, 2))
            masks = masks[keep]
            res["instances"] = {
                "pred_masks": masks,
                "scores": out["instances"]["scores"][keep],
                "pred_classes": np.zeros((len(masks),), np.int64),
                "pred_boxes": masks_to_boxes(masks),
            }
        return [res]
