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
    # objects) at 2.6x less mask-transfer volume than the default 64.
    # Input budgets tightened to the benchmark scene statistics with real
    # margin (scene: ~1.1k mask runs, ~17k depth deltas, ~96k rgb escapes;
    # output ~4k runs): H2D is the dominant per-frame cost on the tunneled
    # transport, so every KB of fixed layout counts. Overflow falls back
    # to the dense layout.
    predictor = MaskRefinerPredictor(
        cfg, params=params, max_instances=24,
        max_in_runs=2048, max_depth_nz=20480, max_rle_runs=6144,
    )

    # The production input distribution: an OCID-like rendered tabletop
    # scene (quber_tpu/data/synthetic.py — the distribution the checkpoint
    # trained on), 8 instances on a 480x640 RGB-D frame. RGB is textured
    # per object with per-pixel sensor noise (sigma 2-10 LSB) — like real
    # camera frames it delta-codes to ~0.6x, which the predictor's 4-bit
    # RGB codec exploits; full-entropy inputs fall back to the dense
    # layout automatically. Depth is normalized to u8 exactly as the eval
    # pipeline does (eval/preprocess_utils.py:12-28).
    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.ops.preprocess import normalize_depth

    rng = np.random.RandomState(7)
    h, w = cfg.height, cfg.width
    rgb, depth_mm, mask_arr = render_scene(rng, h, w, (250.0, 1500.0),
                                           n_objects=8)
    depth = normalize_depth(depth_mm)[..., 0]
    masks = [m > 0 for m in mask_arr]

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
    # blocking D2H, so transport and device compute overlap; the H2D
    # stream count adapts online to the link — see _H2DTuner). Throughput
    # metric, matching the harness's batch eval workload; per-image sync
    # latency is bounded below by the transport round-trip on tunneled TPUs.
    # median of 5 trials: the transport to tunneled TPUs has multi-second
    # congestion swings that would otherwise dominate the measurement
    iters = 96
    frames = [(rgb, depth, masks)] * iters
    rates = []
    for _ in range(5):
        t0 = time.time()
        n_out = 0
        for pan, count, scores in predictor.predict_batch_stream(
            frames, batch_size=batch_size, use_rle=use_rle
        ):
            n_out += 1
        assert n_out == iters
        rates.append(iters / (time.time() - t0))
    fps = sorted(rates)[len(rates) // 2]

    streams, mbps = predictor._h2d_tuner.best()
    print(json.dumps({
        "metric": "e2e_refine_fps_per_chip_480x640",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "weights": weights,
        "h2d_streams": streams,
        "h2d_mbps": round(mbps, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
