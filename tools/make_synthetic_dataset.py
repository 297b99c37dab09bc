"""Render a synthetic tabletop dataset to disk in the OSD directory layout.

OSD-0.2-depth layout (eval_utils.py:117-124 / quber_tpu.evaluation.datasets
build_file_lists): root/image_color/*.png, root/disparity/*.png (16-bit mm
depth), root/annotation/*.png (instance label image, 0 = background).

This gives the evaluation harness (run_eval.py) a real on-disk dataset with
ground truth so the full train -> eval metric loop can run self-contained:

    python tools/make_synthetic_dataset.py --out datasets/synth_osd \
        --n 200 --seed 1000 --depth-range 250 1500
    python train_net.py --synthetic --depth-range 250 1500 ...
    python run_eval.py --base-model perturbed-gt --refiner-model maskrefiner \
        --test-dataset OSD --dataset-path datasets/synth_osd --weights-file ...

Depth is written as 16-bit PNG in integer mm, which normalize_depth's OSD
defaults (min 250 / max 1500, preprocess_utils.py:12-28) map onto the full
0..255 range when rendered with --depth-range 250 1500.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--n", type=int, default=200)
    parser.add_argument("--seed", type=int, default=1000)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--depth-range", type=float, nargs=2,
                        default=(250.0, 1500.0))
    parser.add_argument("--dropout-frac", type=float, default=0.002,
                        help="fraction of zero-depth sensor-dropout pixels "
                             "(exercises the inpaint path)")
    parser.add_argument("--n-objects", type=int, nargs=2, default=None,
                        metavar=("LO", "HI"),
                        help="objects per scene sampled uniformly in "
                             "[LO, HI] (default: the renderer's 3-8); "
                             "e.g. 12 20 renders cluttered scenes")
    parser.add_argument("--shapes", default="mixed",
                        choices=["convex", "mixed", "concave"],
                        help="silhouette vocabulary: convex superellipses "
                             "only, the mixed default (concave composites, "
                             "holes, thin bars, textured surfaces), or "
                             "all-concave stress scenes")
    args = parser.parse_args()

    import imageio.v2 as imageio

    from quber_tpu.data.synthetic import render_scene

    for sub in ("image_color", "disparity", "annotation"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    rng = np.random.RandomState(args.seed)
    for i in range(args.n):
        n_objects = (rng.randint(args.n_objects[0], args.n_objects[1] + 1)
                     if args.n_objects else None)
        rgb, depth_mm, masks = render_scene(
            rng, args.height, args.width, depth_range=args.depth_range,
            dropout_frac=args.dropout_frac, n_objects=n_objects,
            shapes=args.shapes,
        )
        label = np.zeros(rgb.shape[:2], np.uint8)
        for k, m in enumerate(masks, start=1):
            label[m > 0] = k
        name = f"synth_{i:05d}.png"
        imageio.imwrite(os.path.join(args.out, "image_color", name), rgb)
        imageio.imwrite(
            os.path.join(args.out, "disparity", name),
            np.round(depth_mm).astype(np.uint16),
        )
        imageio.imwrite(os.path.join(args.out, "annotation", name), label)
    print(f"wrote {args.n} scenes to {args.out}")


if __name__ == "__main__":
    main()
