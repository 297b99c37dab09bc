"""Render a synthetic tabletop dataset to disk in a benchmark layout.

Layouts mirror the reference eval walkers (eval_utils.py:107-224 /
quber_tpu.evaluation.datasets.build_file_lists):

  osd     root/image_color/*.png, root/disparity/*.png (16-bit mm),
          root/annotation/*.png (labels from 1)            [:117-124]
  ocid    root/{ARID20,YCB10,ARID10}/<floor|table>/<bottom|top>[/<cat>]/
          <seq>/{rgb,depth,label}/*.png — the three-level tree walk; label
          images carry the real OCID background-label convention (floor
          scenes: floor=1, objects from 2; table scenes: floor=1, table=2,
          objects from 3) that load_annotation zeroes  [:129-198, :242-250]
  wisdom  root/color_ims/image_%06d.png, root/depth_ims_numpy/
          image_%06d.npy (float32 METERS), root/modal_segmasks/
          image_%06d.png, root/test_indices.npy selecting the eval subset
          (twin renders extra non-test frames so wrong indexing is caught)
          [:118-127]
  hope / dopose   root/{rgb,depth,annotation}/*.png        [:204-224]

This gives the evaluation harness (run_eval.py) real on-disk datasets with
ground truth so the full train -> eval metric loop runs self-contained:

    python tools/make_synthetic_dataset.py --out datasets/synth_osd \
        --n 200 --seed 1000 --depth-range 250 1500
    python tools/make_synthetic_dataset.py --layout ocid --out datasets/synth_ocid --n 36
    python run_eval.py --base-model perturbed-gt --refiner-model maskrefiner \
        --test-dataset OCID --dataset-path datasets/synth_ocid --weights-file ...

Depth PNGs are 16-bit integer mm, which normalize_depth's defaults (min 250
/ max 1500, preprocess_utils.py:12-28) map onto the full 0..255 range when
rendered with --depth-range 250 1500; WISDOM depth is float32 meters as the
real dataset ships it (normalize_depth(depth, 0.25, 1.5) path).
"""

import argparse
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's directory vocabulary per OCID sub-dataset
# (eval_utils.py:129-198)
OCID_TREE = {
    "ARID20": [["floor", "table"], ["bottom", "top"]],
    "YCB10": [["floor", "table"], ["bottom", "top"],
              ["cuboid", "curved", "mixed"]],
    "ARID10": [["floor", "table"], ["bottom", "top"],
               ["box", "curved", "fruits", "mixed", "non-fruits"]],
}


def _render(rng, args, i):
    from quber_tpu.data.synthetic import render_scene

    n_objects = (rng.randint(args.n_objects[0], args.n_objects[1] + 1)
                 if args.n_objects else None)
    rgb, depth_mm, masks = render_scene(
        rng, args.height, args.width, depth_range=tuple(args.depth_range),
        dropout_frac=args.dropout_frac, n_objects=n_objects,
        shapes=args.shapes,
    )
    label = np.zeros(rgb.shape[:2], np.uint8)
    for k, m in enumerate(masks, start=1):
        label[m > 0] = k
    return rgb, depth_mm, label


def write_osd(args, rng, subdirs=("image_color", "disparity", "annotation")):
    import imageio.v2 as imageio

    for sub in subdirs:
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
    for i in range(args.n):
        rgb, depth_mm, label = _render(rng, args, i)
        name = f"synth_{i:05d}.png"
        imageio.imwrite(os.path.join(args.out, subdirs[0], name), rgb)
        imageio.imwrite(os.path.join(args.out, subdirs[1], name),
                        np.round(depth_mm).astype(np.uint16))
        imageio.imwrite(os.path.join(args.out, subdirs[2], name), label)
    return args.n


def _ocid_labels(label, depth_mm, floor_or_table):
    """Apply the OCID background-label convention to a rendered label image.

    Real OCID annotations label the support planes: floor scenes carry
    floor=1 with objects from 2; table scenes carry floor=1, table=2 with
    objects from 3 (BG_LABELS, eval_utils.py:33-36). The twin shifts the
    instance ids and paints the planes so a broken label-zeroing path
    inflates the metrics instead of silently passing."""
    shift = 1 if floor_or_table == "floor" else 2
    out = np.where(label > 0, label + shift, 0).astype(np.uint8)
    support = (label == 0) & (depth_mm > 0)
    if floor_or_table == "floor":
        out[support] = 1
    else:
        out[support] = 2
        out[:8, :][label[:8, :] == 0] = 1  # far strip: floor seen past table
    return out


def write_ocid(args, rng):
    import imageio.v2 as imageio

    leaves = []
    for sub, levels in OCID_TREE.items():
        for combo in itertools.product(*levels):
            leaves.append(os.path.join(args.out, sub, *combo, "seq01"))
    n = 0
    for i in range(args.n):
        leaf = leaves[i % len(leaves)]
        f_or_t = "floor" if f"{os.sep}floor{os.sep}" in leaf else "table"
        for sub in ("rgb", "depth", "label"):
            os.makedirs(os.path.join(leaf, sub), exist_ok=True)
        rgb, depth_mm, label = _render(rng, args, i)
        label = _ocid_labels(label, depth_mm, f_or_t)
        name = f"result_{i:04d}.png"
        imageio.imwrite(os.path.join(leaf, "rgb", name), rgb)
        imageio.imwrite(os.path.join(leaf, "depth", name),
                        np.round(depth_mm).astype(np.uint16))
        imageio.imwrite(os.path.join(leaf, "label", name), label)
        n += 1
    return n


def write_wisdom(args, rng):
    import imageio.v2 as imageio

    for sub in ("color_ims", "depth_ims_numpy", "modal_segmasks"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
    # render n test frames plus distractor non-test frames, then select the
    # test subset through a shuffled, non-contiguous test_indices.npy —
    # exactly the real dataset's indexing contract
    total = args.n + max(2, args.n // 4)
    idx = rng.permutation(total)[:args.n]
    for i in range(total):
        rgb, depth_mm, label = _render(rng, args, i)
        name = f"image_{i:06d}"
        imageio.imwrite(os.path.join(args.out, "color_ims", name + ".png"), rgb)
        np.save(os.path.join(args.out, "depth_ims_numpy", name + ".npy"),
                (depth_mm / 1000.0).astype(np.float32))  # meters
        imageio.imwrite(os.path.join(args.out, "modal_segmasks", name + ".png"),
                        label)
    np.save(os.path.join(args.out, "test_indices.npy"),
            np.sort(idx).astype(np.int64))
    return args.n


WRITERS = {
    "osd": write_osd,
    "ocid": write_ocid,
    "wisdom": write_wisdom,
    "hope": lambda a, r: write_osd(a, r, ("rgb", "depth", "annotation")),
    "dopose": lambda a, r: write_osd(a, r, ("rgb", "depth", "annotation")),
}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--layout", default="osd", choices=sorted(WRITERS))
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
    args = parser.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    n = WRITERS[args.layout](args, rng)
    print(f"wrote {n} scenes to {args.out} ({args.layout} layout)")


if __name__ == "__main__":
    main()
