"""Decompose the streaming-refine batch time into pack / H2D / compute / D2H.

Run standalone on the TPU (never concurrently with another heavy process):

    python tools/bench_transport.py [--batch 8] [--iters 6]

Prints a per-stage median-time table so transport work targets the real
bottleneck instead of a guess. Stages:

  pack     host-side np packing of one batch of input buffers
  h2d      jnp.asarray of the packed batch (transfer only; fenced)
  compute  jitted pipeline on device-resident inputs (fenced by 1-row D2H)
  d2h      np.asarray of the batched RLE output buffer
  e2e      full predict_batch_stream loop (what bench.py times)

Fencing: block_until_ready does not fence on the axon transport; every stage
boundary is fenced with a bulk D2H readback (see .claude/skills/verify).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def median_time(fn, iters, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--max-instances", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from quber_tpu.models import MaskRefinerConfig
    from quber_tpu.predictor import MaskRefinerPredictor

    cfg = MaskRefinerConfig(dtype="bfloat16")
    pred = MaskRefinerPredictor(cfg, max_instances=args.max_instances)
    h, w = cfg.height, cfg.width

    rng = np.random.RandomState(7)
    ys, xs = np.mgrid[:h, :w]
    masks = []
    for _ in range(8):
        cy, cx = rng.randint(80, h - 80), rng.randint(80, w - 80)
        r = rng.randint(30, 60)
        masks.append(((ys - cy) ** 2 + (xs - cx) ** 2 <= r * r))
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    depth = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    frame = (rgb, depth, masks)
    frames = [frame] * args.batch

    B = args.batch
    print(f"devices={jax.devices()} batch={B} in_bytes/frame={pred._in_bytes}")

    # ---- warmup / compile both paths
    t0 = time.time()
    out = pred._pipeline_packed_batch_rle(
        pred.params,
        jnp.asarray(np.stack([pred._pack_inputs(*f) for f in frames])),
    )
    np.asarray(out[0])
    print(f"compile+first-call: {time.time() - t0:.1f}s")

    # ---- pack
    t_pack = median_time(
        lambda: np.stack([pred._pack_inputs(*f) for f in frames]), args.iters
    )

    # ---- h2d (fence with a tiny jit that touches every row + bulk readback)
    bufs_np = np.stack([pred._pack_inputs(*f) for f in frames])
    touch = jax.jit(lambda x: x[:, :: max(1, x.shape[1] // 100_000)] + 1)

    def h2d():
        dev = jnp.asarray(bufs_np)
        np.asarray(touch(dev))  # force materialization on device + fence

    t_h2d = median_time(h2d, args.iters)
    # fence cost alone (device-resident input)
    dev_bufs = jnp.asarray(bufs_np)
    np.asarray(touch(dev_bufs))
    t_fence = median_time(lambda: np.asarray(touch(dev_bufs)), args.iters)

    # ---- compute on device-resident inputs, fenced by the RLE D2H
    def compute_and_d2h():
        rle, raw = pred._pipeline_packed_batch_rle(pred.params, dev_bufs)
        return np.asarray(rle)

    t_comp_d2h = median_time(compute_and_d2h, args.iters)

    # ---- d2h alone: fetch a cached device output
    rle_dev, _ = pred._pipeline_packed_batch_rle(pred.params, dev_bufs)
    np.asarray(rle_dev)
    t_d2h = median_time(lambda: np.asarray(rle_dev), args.iters)

    # ---- e2e stream (what bench.py measures)
    n_frames = 6 * B

    def e2e():
        n = 0
        for _ in pred.predict_batch_stream([frame] * n_frames, batch_size=B):
            n += 1
        assert n == n_frames

    t_e2e = median_time(e2e, 3, warmup=1) / (n_frames / B)

    rle_bytes = int(np.prod(np.asarray(rle_dev).shape))
    print(f"\nper-batch (B={B}) medians:")
    print(f"  pack          {t_pack * 1e3:8.1f} ms")
    print(f"  h2d+fence     {t_h2d * 1e3:8.1f} ms  ({bufs_np.nbytes / 1e6:.1f} MB)")
    print(f"  fence alone   {t_fence * 1e3:8.1f} ms")
    print(f"  compute+d2h   {t_comp_d2h * 1e3:8.1f} ms")
    print(f"  d2h alone     {t_d2h * 1e3:8.1f} ms  ({rle_bytes / 1e6:.2f} MB)")
    print(f"  e2e/batch     {t_e2e * 1e3:8.1f} ms  -> {B / t_e2e:.1f} FPS")


if __name__ == "__main__":
    main()
