"""Headline benchmark: end-to-end single-image mask refinement FPS per chip.

Measures the FULL refine pipeline of quber_tpu.predictor.MaskRefinerPredictor
(initial-mask encoding -> dual-trunk backbone -> hierarchical heads -> center
NMS -> pixel grouping -> instance extraction) at the reference's eval
resolution 480x640 with a realistic OCID-like instance count, as one fused
XLA program on the TPU.

Baseline: the reference publishes no numbers (BASELINE.md); the driver
north-star is >30 FPS/chip end-to-end refine. vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from quber_tpu.models import MaskRefinerConfig
    from quber_tpu.predictor import MaskRefinerPredictor
    from quber_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()  # warm runs skip the ~2x45 s pipeline compiles

    cfg = MaskRefinerConfig(dtype="bfloat16")
    # trained weights when available (the production serving path: coherent
    # panoptic maps keep the smaller RLE output on); random init otherwise —
    # throughput is weight-independent, only the output-path choice differs
    params, weights = None, "random"
    ckpt = os.environ.get("QUBER_BENCH_CKPT", "output/flagship_synth/ckpt")
    if os.path.isdir(ckpt):
        try:
            from quber_tpu.train.checkpoint import load_eval_params

            params = load_eval_params(ckpt)
            weights = "trained"
        except Exception:
            pass
    # 24 instance slots cover the benchmark datasets (OCID maxes ~20
    # objects) at 2.6x less mask-transfer volume than the default 64
    predictor = MaskRefinerPredictor(cfg, params=params, max_instances=24)

    # OCID-like synthetic scene: 8 instances on a 480x640 RGB-D frame.
    # RGB is full-entropy noise (worst case for the transport — real camera
    # RGB is also incompressible). Depth is what a real sensor returns: a
    # smooth table plane with smooth object surfaces, quantized to u8
    # (eval/preprocess_utils.py:12-28 normalize_depth semantics), which the
    # predictor's delta-coded input layout exploits.
    rng = np.random.RandomState(7)
    h, w = cfg.height, cfg.width
    ys, xs = np.mgrid[:h, :w]
    masks = []
    depth_f = 120.0 + 80.0 * (ys / h)  # tilted table plane
    for _ in range(8):
        cy, cx = rng.randint(80, h - 80), rng.randint(80, w - 80)
        r = rng.randint(30, 60)
        m = (ys - cy) ** 2 + (xs - cx) ** 2 <= r * r
        masks.append(m)
        # spherical object surface proud of the table
        bump = np.sqrt(np.maximum(r * r - (ys - cy) ** 2 - (xs - cx) ** 2, 0.0))
        depth_f = np.where(m, depth_f - 0.3 * bump, depth_f)
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    depth = np.clip(depth_f, 0, 255).astype(np.uint8)

    # warmup: compile the streaming pipeline + first (slow) D2H through the
    # transport; sanity-check shapes only.
    batch_size = 16
    frames_warm = [(rgb, depth, masks)] * batch_size
    # with random params the panoptic maps are fragmented and the adaptive
    # stream would switch to the raw path after one batch anyway — pin it to
    # skip compiling the RLE variant. Trained weights run the adaptive
    # (production) path, which keeps the smaller RLE output on.
    use_rle = None if weights == "trained" else False
    for pan, count, scores in predictor.predict_batch_stream(
        frames_warm, batch_size=batch_size, use_rle=use_rle
    ):
        assert pan.shape == (h, w) and 0 <= count <= 24, (pan.shape, count)

    # timed: batched streaming refine (producer-thread pipeline: input
    # packing + H2D + dispatch run up to 2 batches ahead of the consumer's
    # blocking D2H, so transport and device compute overlap). Throughput
    # metric, matching the harness's batch eval workload; per-image sync
    # latency is bounded below by the transport round-trip on tunneled TPUs.
    # median of 3 trials: the transport to tunneled TPUs has multi-second
    # congestion swings that would otherwise dominate the measurement
    iters = 96
    frames = [(rgb, depth, masks)] * iters
    rates = []
    for _ in range(3):
        t0 = time.time()
        n_out = 0
        for pan, count, scores in predictor.predict_batch_stream(
            frames, batch_size=batch_size, use_rle=use_rle
        ):
            n_out += 1
        assert n_out == iters
        rates.append(iters / (time.time() - t0))
    fps = sorted(rates)[1]

    print(json.dumps({
        "metric": "e2e_refine_fps_per_chip_480x640",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "weights": weights,
    }))


if __name__ == "__main__":
    sys.exit(main())
