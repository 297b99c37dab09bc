"""Render a synthetic tabletop eval dataset in the OSD directory layout.

The reference benchmarks on OSD (image_color/ + disparity/ + annotation/
PNG triples, eval/eval_utils.py:107-118); no benchmark data ships with
this environment, so this tool materializes the train_net synthetic-scene
renderer to disk in that exact layout. run_eval.py then drives the REAL
harness end-to-end (walkers, per-image loop, Hungarian metrics, timing
artifacts) against it:

    python tools/make_synthetic_dataset.py --out datasets/synthetic_osd \
        --n 200 --seed 9000 --depth-range 250 1500
    python run_eval.py --base-model perturbed-gt \
        --refiner-model maskrefiner-nofilter --test-dataset OSD \
        --dataset-path datasets/synthetic_osd --weights-file <ckpt>

Depth is written as 16-bit mm PNGs; pick --depth-range to match the eval
path's normalize_depth window (250..1500 mm, preprocess_utils.py:12-28)
and train with the same INPUT.DEPTH_RANGE for consistent normalization.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--n", type=int, default=200)
    parser.add_argument("--seed", type=int, default=9000)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--depth-range", type=float, nargs=2,
                        default=(250.0, 1500.0))
    args = parser.parse_args()

    import cv2
    import numpy as np

    from train_net import synthetic_records

    for sub in ("image_color", "disparity", "annotation"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    records = synthetic_records(args.n, args.height, args.width,
                                seed=args.seed,
                                depth_range=tuple(args.depth_range))
    for i, rec in enumerate(records):
        name = f"scene_{i:04d}.png"
        # cv2.imwrite/imread round-trip preserves the raw channel order the
        # training mapper sees
        cv2.imwrite(os.path.join(args.out, "image_color", name), rec["rgb"])
        depth16 = np.clip(rec["depth_mm"], 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(args.out, "disparity", name), depth16)
        anno = np.zeros(rec["gt_masks"].shape[1:], np.uint8)
        for k, m in enumerate(rec["gt_masks"]):
            anno[m > 0] = k + 1  # later (nearer) objects overwrite
        cv2.imwrite(os.path.join(args.out, "annotation", name), anno)
    print(f"wrote {args.n} scenes -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
