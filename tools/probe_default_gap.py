"""Attribute the tuned-vs-default bench gap (VERDICT r4 item 5).

BENCH_r04.json: tuned (top_k=24, slots=24) 173.3 FPS vs default
(top_k=200, slots=64) 141.0 FPS = 1.32 ms/frame unexplained. The two
configs differ on TWO axes; this probe times the 2x2 grid
{top_k 24,200} x {max_instances 24,64} on identical staged frames so the
gap decomposes into its top_k-scaled part (NMS top-k candidate sort,
score-table pad) and its slot-scaled part (initial-mask encoding vmap,
output tables).

Usage: python tools/probe_default_gap.py [--iters 64] [--trials 3]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from quber_tpu.models import MaskRefinerConfig
    from quber_tpu.predictor import MaskRefinerPredictor
    from quber_tpu.profiling import enable_compilation_cache
    from quber_tpu.train.checkpoint import load_default_params
    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.ops.preprocess import normalize_depth

    enable_compilation_cache()
    params = load_default_params()
    weights = "trained-int8" if params is not None else "random"
    use_rle = None if params is not None else False

    rng = np.random.RandomState(7)
    frames = []
    for _ in range(args.iters):
        rgb, depth_mm, mask_arr = render_scene(rng, 480, 640, (250.0, 1500.0))
        frames.append((rgb, normalize_depth(depth_mm)[..., 0],
                       [m > 0 for m in mask_arr]))

    results = {}
    for top_k, slots in [(24, 24), (200, 24), (24, 64), (200, 64)]:
        cfg = MaskRefinerConfig(dtype="bfloat16", top_k_instances=top_k)
        kw = dict(max_instances=slots)
        if slots == 24:  # the tuned budgets ride along with the tuned slots
            kw.update(max_in_runs=2560, max_depth_nz=24576, max_rle_runs=6144)
        pred = MaskRefinerPredictor(cfg, params=params, **kw)
        staged = pred.stage_frames(frames, batch_size=args.batch_size)
        for _ in pred.predict_batch_stream_staged(staged, use_rle=use_rle):
            pass  # warmup/compile
        rates = []
        for _ in range(args.trials):
            t0 = time.time()
            n = sum(1 for _ in pred.predict_batch_stream_staged(
                staged, use_rle=use_rle))
            assert n == args.iters
            rates.append(args.iters / (time.time() - t0))
        fps = sorted(rates)[len(rates) // 2]
        results[f"k{top_k}_n{slots}"] = round(fps, 2)
        print(f"top_k={top_k:4d} slots={slots:3d}: {fps:7.2f} fps "
              f"({1e3/fps:.2f} ms/frame)", flush=True)
        del pred, staged

    base = results["k24_n24"]
    out = {"weights": weights, **results}
    for key in ("k200_n24", "k24_n64", "k200_n64"):
        out[key + "_extra_ms"] = round(1e3 / results[key] - 1e3 / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
