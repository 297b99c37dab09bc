"""Dataset visualization tiles.

CLI equivalent of the reference's inspection scripts
/root/reference/tools/ours/vis_osd.py (OSD-layout rgb/depth/GT overlay) and
visualize_perturbate_masks.py (GT vs perturbed masks from a perturbed COCO
JSON). One tool, two modes:

    # OSD-layout tree (image_color/ disparity/ annotation/)
    python tools/visualize_dataset.py osd --root datasets/synth_osd \
        --out-dir vis/ [--limit 8]

    # perturbed panoptic/instance JSON: GT vs perturbed side by side
    python tools/visualize_dataset.py perturbed --json train_perturbed.json \
        --image-root imgs/ --out-dir vis/ [--limit 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_PALETTE_SEED = 5


def overlay_masks(rgb, masks, alpha=0.6):
    """Color overlay of an instance-mask stack (Visualizer-style)."""
    import numpy as np

    out = rgb.astype(np.float32).copy()
    rng = np.random.RandomState(_PALETTE_SEED)
    for m in masks:
        color = rng.randint(40, 255, 3).astype(np.float32)
        sel = np.asarray(m, bool)
        out[sel] = (1 - alpha) * out[sel] + alpha * color
    return out.astype(np.uint8)


def label_to_masks(label):
    import numpy as np

    ids = [i for i in np.unique(label) if i != 0]
    return [label == i for i in ids]


def run_osd(args):
    import glob

    import imageio.v2 as imageio
    import numpy as np

    from quber_tpu.ops.preprocess import normalize_depth

    rgb_paths = sorted(glob.glob(os.path.join(args.root, "image_color", "*.png")))
    if args.limit:
        rgb_paths = rgb_paths[: args.limit]
    os.makedirs(args.out_dir, exist_ok=True)
    for rgb_path in rgb_paths:
        name = os.path.basename(rgb_path)
        rgb = np.asarray(imageio.imread(rgb_path))[..., :3]
        depth = np.asarray(imageio.imread(
            os.path.join(args.root, "disparity", name))).astype(np.float32)
        anno = np.asarray(imageio.imread(
            os.path.join(args.root, "annotation", name)))
        depth_vis = normalize_depth(depth, args.depth_min, args.depth_max)
        overlay = overlay_masks(rgb, label_to_masks(anno))
        tile = np.concatenate([rgb, depth_vis, overlay], axis=1)
        imageio.imwrite(os.path.join(args.out_dir, name), tile)
    print(f"wrote {len(rgb_paths)} tiles to {args.out_dir}")


def run_perturbed(args):
    import imageio.v2 as imageio
    import numpy as np

    from quber_tpu.data import rle

    with open(args.json) as f:
        coco = json.load(f)
    by_image: dict = {}
    for ann in coco.get("annotations", []):
        by_image.setdefault(ann.get("image_id"), []).append(ann)
    images = coco["images"][: args.limit] if args.limit else coco["images"]
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for img in images:
        perturbed = img.get("perturbed_segmentation")
        if not perturbed:
            continue
        rgb = np.asarray(imageio.imread(
            os.path.join(args.image_root, img["file_name"])))[..., :3]
        pert_masks = [rle.decode(r) for r in perturbed]
        gt_masks = []
        for ann in by_image.get(img["id"], []):
            if "segments_info" in ann:  # panoptic record: decode via PNG ids
                continue
            seg = ann.get("visible_mask", ann.get("segmentation"))
            if isinstance(seg, dict):
                gt_masks.append(rle.decode(seg))
        left = overlay_masks(rgb, gt_masks)
        right = overlay_masks(rgb, pert_masks)
        tile = np.concatenate([left, right], axis=1)
        out_name = os.path.splitext(os.path.basename(img["file_name"]))[0] + ".png"
        imageio.imwrite(os.path.join(args.out_dir, out_name), tile)
        n += 1
    print(f"wrote {n} gt|perturbed tiles to {args.out_dir}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="mode", required=True)
    p_osd = sub.add_parser("osd")
    p_osd.add_argument("--root", required=True)
    p_osd.add_argument("--out-dir", required=True)
    p_osd.add_argument("--limit", type=int, default=8)
    p_osd.add_argument("--depth-min", type=float, default=250.0)
    p_osd.add_argument("--depth-max", type=float, default=1500.0)
    p_pert = sub.add_parser("perturbed")
    p_pert.add_argument("--json", required=True)
    p_pert.add_argument("--image-root", required=True)
    p_pert.add_argument("--out-dir", required=True)
    p_pert.add_argument("--limit", type=int, default=8)
    args = parser.parse_args()
    if args.mode == "osd":
        run_osd(args)
    else:
        run_perturbed(args)


if __name__ == "__main__":
    main()
