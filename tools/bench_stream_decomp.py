"""Decompose the streaming serving loop into its pipeline stages.

bench.py reports one streaming-from-host number; this tool answers WHY it
is what it is, by timing each stage of the same loop in isolation on the
same scenes:

  pack     host: _pack_batch per batch (C++ codecs; also in host_budget.json)
  h2d      link: device_put_split + a real transfer fence per stacked batch
           (the only reliable fence on this transport is a bulk readback —
           see .claude/skills/verify), giving the TRUE per-batch transfer
           time including RTT, unlike the online tuner's in-flight EMA
  compute  chip: the staged pipeline rate (inputs already in HBM)
  drain    consumer: blocking D2H + host decode per batch

Steady-state streaming throughput of the pipelined loop is bounded by the
SLOWEST stage (stages overlap across batches); the report compares that
bound with the measured streaming rate, so the artifact states whether
the loop runs at the link's ceiling and what the ceiling is.

    python tools/bench_stream_decomp.py --out stream_decomp.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="stream_decomp.json")
    parser.add_argument("--frames", type=int, default=96)
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.models import MaskRefinerConfig
    from quber_tpu.ops.preprocess import normalize_depth
    from quber_tpu.predictor import (
        MaskRefinerPredictor,
        device_put_split,
        transport_fence,
    )
    from quber_tpu.profiling import enable_compilation_cache
    from quber_tpu.train.checkpoint import load_quantized_params

    enable_compilation_cache()
    qckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "flagship_synth_int8.npz")
    params = load_quantized_params(qckpt) if os.path.exists(qckpt) else None
    cfg = MaskRefinerConfig(dtype="bfloat16", top_k_instances=24)
    pred = MaskRefinerPredictor(cfg, params=params, max_instances=24,
                                max_in_runs=2560, max_depth_nz=24576,
                                max_rle_runs=6144)

    rng = np.random.RandomState(7)
    h, w = cfg.height, cfg.width
    frames = []
    for _ in range(args.frames):
        rgb, depth_mm, mask_arr = render_scene(rng, h, w, (250.0, 1500.0))
        depth = normalize_depth(depth_mm)[..., 0]
        frames.append((rgb, depth, [m > 0 for m in mask_arr]))
    batches = [frames[i:i + args.batch]
               for i in range(0, len(frames), args.batch)]

    # ---- pack (host) ----
    t0 = time.perf_counter()
    staged_bufs = [pred._pack_batch(b, args.batch, True) for b in batches]
    t_pack = time.perf_counter() - t0
    wire = sum(s[1].nbytes for s in staged_bufs)

    # ---- h2d (link): transfer + REAL fence per batch ----
    # one warm transfer first (transport warmup can stall minutes cold)
    warm = device_put_split(staged_bufs[0][1])
    transport_fence(warm)
    t0 = time.perf_counter()
    for _rle, stacked, _real in staged_bufs:
        bufs = device_put_split(stacked)
        transport_fence(bufs)
    t_h2d = time.perf_counter() - t0

    # ---- compute + drain (chip + consumer), inputs already in HBM ----
    staged = pred.stage_frames(frames, batch_size=args.batch)
    n = sum(1 for _ in pred.predict_batch_stream_staged(staged))  # warm/compile
    assert n == args.frames
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = sum(1 for _ in pred.predict_batch_stream_staged(staged))
        rates.append(args.frames / (time.perf_counter() - t0))
    t_staged = args.frames / sorted(rates)[1]

    # ---- the full pipelined loop, measured (best of 3: the tunneled
    # link's bandwidth swings minute to minute, and each stage above was
    # necessarily measured at a different moment of that swing) ----
    stream_trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = sum(1 for _ in pred.predict_batch_stream(frames,
                                                     batch_size=args.batch))
        assert n == args.frames
        stream_trials.append(time.perf_counter() - t0)
    t_stream = min(stream_trials)

    per_frame = {
        "pack_ms": round(1e3 * t_pack / args.frames, 2),
        "h2d_ms": round(1e3 * t_h2d / args.frames, 2),
        "compute_drain_ms": round(1e3 * t_staged / args.frames, 2),
        "stream_ms": round(1e3 * t_stream / args.frames, 2),
    }
    slowest = max(per_frame["pack_ms"], per_frame["h2d_ms"],
                  per_frame["compute_drain_ms"])
    bound_fps = 1e3 / slowest
    measured_fps = 1e3 / per_frame["stream_ms"]
    bottleneck = max(
        ("pack", per_frame["pack_ms"]),
        ("h2d", per_frame["h2d_ms"]),
        ("compute_drain", per_frame["compute_drain_ms"]),
        key=lambda kv: kv[1])[0]
    out = {
        "frames": args.frames,
        "batch": args.batch,
        "wire_kb_per_frame": round(wire / args.frames / 1024, 1),
        "stream_trials_s": [round(t, 2) for t in stream_trials],
        "per_frame_ms": per_frame,
        "link_mbps_fenced": round(wire / 1e6 / t_h2d, 1),
        "pipeline_bound_fps": round(bound_fps, 2),
        "measured_stream_fps": round(measured_fps, 2),
        "pipeline_efficiency": round(measured_fps / bound_fps, 3),
        "bottleneck": bottleneck,
        "staged_fps": round(1e3 / per_frame["compute_drain_ms"], 2),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
