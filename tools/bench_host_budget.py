"""Measure the host-side (CPU) budget of the serving loop, per frame.

The serving path's per-frame host work is: pack inputs (producer thread)
-> H2D -> device compute -> D2H -> decode outputs. The chip side is timed
by bench.py; this tool times every HOST stage on rendered benchmark scenes
and writes a committed JSON artifact (host_budget.json), turning the
"< 7 ms/frame host pack on a PCIe host" budget stated in csrc/codec.cpp
into a measured number — native C++ codecs vs the byte-identical numpy
fallbacks (the reference's analogous cost is buried inside its dataloader
workers and never itemized; its timing wraps the whole predict,
eval/refiner_model.py:265-278).

Runs entirely on the host: JAX is pinned to CPU before backend init (the
predictor's __init__ builds params; no jitted pipeline is ever called),
so it can run alongside nothing — like any other benchmark on this
single-core host — but never touches the TPU.

Usage: python tools/bench_host_budget.py [--out host_budget.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend init

import numpy as np


def _stats(samples_ms):
    a = np.asarray(samples_ms)
    return {
        "mean": round(float(a.mean()), 3),
        "p50": round(float(np.percentile(a, 50)), 3),
        "p95": round(float(np.percentile(a, 95)), 3),
    }


def _time_per_frame(fn, frames, repeats=3):
    """ms per frame, best-of-repeats per frame (scheduler noise on a
    1-core host is one-sided)."""
    per_frame = []
    for f in frames:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(*f)
            best = min(best, time.perf_counter() - t0)
        per_frame.append(best * 1e3)
    return per_frame


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="host_budget.json")
    parser.add_argument("--frames", type=int, default=96)
    parser.add_argument("--budget-ms", type=float, default=7.0,
                        help="the PCIe-host per-frame budget claimed in "
                             "csrc/codec.cpp (chip at ~145 FPS)")
    args = parser.parse_args()

    from quber_tpu import transport_native as native
    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.models import MaskRefinerConfig
    from quber_tpu.ops.preprocess import normalize_depth
    from quber_tpu.predictor import MaskRefinerPredictor, rle_decode

    # the bench.py serving configuration (tuned) — the layout constants the
    # producer thread actually uses
    cfg = MaskRefinerConfig(dtype="bfloat16", top_k_instances=24)
    pred = MaskRefinerPredictor(cfg, max_instances=24, max_in_runs=2560,
                                max_depth_nz=24576, max_rle_runs=6144)

    rng = np.random.RandomState(7)  # bench.py's scene stream
    h, w = cfg.height, cfg.width
    frames, labels = [], []
    for _ in range(args.frames):
        rgb, depth_mm, mask_arr = render_scene(rng, h, w, (250.0, 1500.0))
        depth = normalize_depth(depth_mm)[..., 0]
        frames.append((rgb, depth, [m > 0 for m in mask_arr]))
        label = np.zeros((h, w), np.int32)
        for k, m in enumerate(mask_arr, start=1):
            label[m > 0] = k
        labels.append(label)

    have_native = native.available()
    results = {}
    # Codec-choice context for readers of the artifact: the hardened
    # (round-3) synthetic textures escape the 4-bit RGB delta codec's
    # 12.5% budget on ~most frames (measured ~27% mean escape fraction;
    # real camera RGB with sigma<=5 LSB noise stays under ~9%). Since
    # round 5 those frames fall through to the 5-bit codec (escapes ~6%
    # mean / 17% max vs an 18.75% budget) instead of raw RGB — the
    # negotiation below mirrors predictor._pack_batch exactly.

    def pack_rle(rgb, depth, masks):
        buf = pred._pack_inputs_rle(rgb, depth, masks, rgb_codec=4)
        if buf is None:
            buf = pred._pack_inputs_rle(rgb, depth, masks, rgb_codec=5)
        # 5-bit budget overflow falls back to the plain-RGB RLE layout,
        # exactly like the production packer (predictor._pack_batch)
        return buf if buf is not None else pred._pack_inputs_rle(rgb, depth, masks)

    if have_native:
        results["pack_rle_native_ms"] = _stats(
            _time_per_frame(pack_rle, frames))
        results["pack_dense_native_ms"] = _stats(
            _time_per_frame(pred._pack_inputs, frames))

    # byte-identical numpy fallbacks: force the native lib "unavailable"
    native._LIB, saved = False, native._LIB
    try:
        results["pack_rle_numpy_ms"] = _stats(_time_per_frame(pack_rle, frames))
        results["pack_dense_numpy_ms"] = _stats(
            _time_per_frame(pred._pack_inputs, frames))
    finally:
        native._LIB = saved

    # ---- output decode (consumer side) ----
    # RLE path: encode each GT label map into the device's packed layout
    # (value << 24 | start) and time the host decode. Grouped panoptic maps
    # from trained weights have the same run structure as GT label maps.
    hw = h * w
    rle_bufs = []
    runs_per_frame = []
    for label in labels:
        flat = label.reshape(-1).astype(np.uint32)
        starts = np.flatnonzero(
            np.concatenate([[True], flat[1:] != flat[:-1]])).astype(np.uint32)
        runs_per_frame.append(len(starts))
        packed = np.zeros((pred.max_rle_runs,), np.uint32)
        packed[: len(starts)] = (flat[starts] << 24) | starts
        buf = np.zeros((pred._rle_bytes,), np.uint8)
        buf[:4] = np.array([len(starts)], np.uint32).view(np.uint8)
        buf[4 : 4 + 4 * pred.max_rle_runs] = packed.view(np.uint8)
        rle_bufs.append(buf)

    def decode_rle(buf):
        n_runs = int(buf[:4].view(np.uint32)[0])
        pan = rle_decode(buf[4 : 4 + 4 * pred.max_rle_runs].view(np.uint32),
                         n_runs, hw)
        return pan.reshape(h, w)

    results["decode_rle_ms"] = _stats(
        _time_per_frame(decode_rle, [(b,) for b in rle_bufs]))

    # raw path: bitplane-packed panoptic map (the overflow fallback layout)
    raw_bufs = []
    for label in labels:
        flat = label.reshape(-1)
        planes = [np.packbits(((flat >> k) & 1).astype(np.uint8))
                  for k in range(pred._pan_bits)]
        raw_bufs.append(np.concatenate(planes))
    results["decode_raw_ms"] = _stats(
        _time_per_frame(pred._unpack_pan_planes, [(b,) for b in raw_bufs]))

    # ---- transfer volumes: what each layout puts on the wire ----
    pack_bytes = [len(pack_rle(*f)) for f in frames]
    results["bytes_per_frame"] = {
        "in_rle_measured_mean": int(np.mean(pack_bytes)),
        "in_rle_codec_layout": pred._in_bytes_rlec,
        "in_rle_codec5_layout": pred._in_bytes_rlec5,
        "in_rle_layout": pred._in_bytes_rle,
        "in_dense_layout": pred._in_bytes,
        "out_rle_layout": pred._rle_bytes,
        "out_raw_layout": pred._pan_bytes + 1 + 4 * pred._scores_len,
    }
    results["rle_runs_per_frame_mean"] = int(np.mean(runs_per_frame))

    # the steady-state producer cost per frame = pack; consumer = decode.
    # They run on different threads, so the host ceiling is 1/max(stage).
    pack_key = "pack_rle_native_ms" if have_native else "pack_rle_numpy_ms"
    worst = max(results[pack_key]["p50"], results["decode_rle_ms"]["p50"])
    out = {
        "host": {"cpus": os.cpu_count(), "native_codecs": have_native},
        "frames": args.frames,
        "image": [h, w],
        "budget_ms": args.budget_ms,
        **results,
        "host_fps_ceiling": round(1e3 / worst, 1),
        "pack_within_budget": bool(results[pack_key]["p95"] < args.budget_ms),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
