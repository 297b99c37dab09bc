"""Clutter degradation curve: refinement quality vs objects-per-scene.

Round-2 left a single OOD point (12-20 objects: Boundary F refined 83.6 vs
95.6 in-distribution, eval_clutter.csv) with no curve and no diagnosis of
whether the drop is CAPACITY (the tuned 24-center top-k / 24 instance
slots) or LEARNED PRIOR (the checkpoint never saw >8 objects). This tool
renders scenes at fixed instance counts and evaluates each count under
both predictor configurations:

  tuned   — top_k_instances=24, 24 mask slots (bench.py's serving config)
  default — top_k_instances=200, 64 mask slots (the reference's
            post_processing.py:165-222 defaults; the harness's own config)

through the standard perturbed-gt protocol (EVAL_SYNTH.md). Rows append to
the eval CSV; a summary table + the capacity-vs-prior verdict print at the
end and are written as JSON.

    python tools/eval_clutter_curve.py --weights-file weights/flagship_synth_int8.npz \
        --n 50 --points 4 8 12 16 20 24 --out eval_clutter_curve.csv
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def _render(out_dir: str, n: int, n_objects: int, shapes: str, seed: int):
    import imageio.v2 as imageio

    from quber_tpu.data.synthetic import render_scene

    for sub in ("image_color", "disparity", "annotation"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        rgb, depth_mm, masks = render_scene(
            rng, 480, 640, depth_range=(250.0, 1500.0),
            n_objects=n_objects, shapes=shapes)
        label = np.zeros(rgb.shape[:2], np.uint8)
        for k, m in enumerate(masks, start=1):
            label[m > 0] = k
        name = f"synth_{i:05d}.png"
        imageio.imwrite(os.path.join(out_dir, "image_color", name), rgb)
        imageio.imwrite(os.path.join(out_dir, "disparity", name),
                        np.round(depth_mm).astype(np.uint16))
        imageio.imwrite(os.path.join(out_dir, "annotation", name), label)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights-file",
                        default="weights/flagship_synth_int8.npz")
    parser.add_argument("--points", type=int, nargs="+",
                        default=[4, 8, 12, 16, 20, 24])
    parser.add_argument("--configs", nargs="+",
                        default=["tuned", "default"],
                        choices=["tuned", "default"])
    parser.add_argument("--n", type=int, default=50, help="scenes per point")
    parser.add_argument("--shapes", default="mixed",
                        choices=["convex", "mixed", "concave"])
    parser.add_argument("--data-root", default="datasets/clutter_curve")
    parser.add_argument("--out", default="eval_clutter_curve.csv")
    parser.add_argument("--summary", default="eval_clutter_curve.json")
    parser.add_argument("--seed", type=int, default=5000,
                        help="held-out scene seeds (training uses 0..)")
    args = parser.parse_args()

    from quber_tpu.evaluation.harness import run_eval
    from quber_tpu.evaluation.refiner_models import QuBERRefiner
    from quber_tpu.models import MaskRefinerConfig
    from quber_tpu.profiling import enable_compilation_cache
    from quber_tpu.train.checkpoint import load_eval_params

    enable_compilation_cache()
    params = load_eval_params(args.weights_file)

    variants = {
        # bench.py's serving config: top-k sized to the slot budget
        "tuned": (MaskRefinerConfig(dtype="bfloat16", top_k_instances=24), 24),
        # reference-default generality (post_processing.py:165-222)
        "default": (MaskRefinerConfig(dtype="bfloat16"), 64),
    }

    curve = []
    for n_obj in args.points:
        data_dir = os.path.join(args.data_root,
                                f"{args.shapes}_{n_obj:02d}obj")
        marker = os.path.join(data_dir, "image_color")
        if not os.path.isdir(marker) or len(os.listdir(marker)) < args.n:
            print(f"rendering {args.n} scenes at {n_obj} objects -> {data_dir}")
            _render(data_dir, args.n, n_obj, args.shapes,
                    seed=args.seed + n_obj)
        for tag in args.configs:
            cfg, slots = variants[tag]
            refiner = QuBERRefiner(cfg, params, max_instances=slots,
                                   use_fg_filter=False)
            print(f"== n_objects={n_obj} config={tag} "
                  f"(top_k={cfg.top_k_instances}, slots={slots})")
            results = run_eval(
                base_model="perturbed-gt",
                refiner_model=refiner,
                test_dataset="OSD",
                dataset_path=data_dir,
                config=cfg,
                params=params,
                limit=args.n,
                csv_path=args.out,
            )
            curve.append({
                "n_objects": n_obj, "config": tag,
                "top_k": cfg.top_k_instances, "slots": slots,
                "initial_objects_f": results["initial"]["Objects F-measure"],
                "refined_objects_f": results["refined"]["Objects F-measure"],
                "initial_boundary_f": results["initial"]["Boundary F-measure"],
                "refined_boundary_f": results["refined"]["Boundary F-measure"],
                "refined_miou": results["refined"].get("obj_mIOU"),
            })

    print(f"\n{'n_obj':>5} {'config':>8} {'ObjF i->r':>14} {'BdyF i->r':>14}")
    for row in curve:
        print(f"{row['n_objects']:>5} {row['config']:>8} "
              f"{100 * row['initial_objects_f']:>6.1f}->{100 * row['refined_objects_f']:<6.1f} "
              f"{100 * row['initial_boundary_f']:>6.1f}->{100 * row['refined_boundary_f']:<6.1f}")

    # capacity-vs-prior: at each point, how much does default generality
    # (200 centers / 64 slots) buy over the tuned 24/24 config?
    diag = {}
    if {"tuned", "default"} <= set(args.configs):
        by = {(r["n_objects"], r["config"]): r for r in curve}
        gaps = {n: round(100 * (by[(n, "default")]["refined_boundary_f"]
                                - by[(n, "tuned")]["refined_boundary_f"]), 2)
                for n in args.points if (n, "default") in by and (n, "tuned") in by}
        diag["boundary_f_default_minus_tuned"] = gaps
        worst_gap = max(abs(v) for v in gaps.values()) if gaps else 0.0
        diag["verdict"] = (
            "capacity: the default config recovers the drop"
            if worst_gap > 3.0 else
            "learned-prior: config generality does not move the curve "
            f"(max |gap| {worst_gap:.1f} points) - the degradation is the "
            "checkpoint's training distribution, not top-k/slot capacity"
        )
        print("\ndefault-minus-tuned Boundary F by n_objects:", gaps)
        print("verdict:", diag["verdict"])

    with open(args.summary, "w") as f:
        json.dump({"points": curve, "diagnosis": diag,
                   "weights": args.weights_file, "shapes": args.shapes,
                   "n_per_point": args.n}, f, indent=1)
    print(f"curve -> {args.summary}")


if __name__ == "__main__":
    main()
