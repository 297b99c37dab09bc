"""Dataset preprocessors: HOPE / DoPose / TOD normalization.

Covers the reference's one-off preprocessors (tools/ours HOPE/DoPose
scripts, tod/1_tod_to_coco.py): normalize BOP-style scene trees into the
flat rgb/ depth/ annotation/ layout the eval walkers expect, and convert a
TOD-style segmentation tree into COCO-instance JSON (RLE) ready for
detection2panoptic.py -> perturbate_masks.py -> panoptic2eee.py.

    python tools/preprocess_datasets.py hope --root raw_hope/ --out hope_preprocessed/
    python tools/preprocess_datasets.py dopose --root raw_dopose/ --out DoPose/ [--every 50]
    python tools/preprocess_datasets.py tod --root TOD/ --out TODv2/annotations/train.json
"""

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def flatten_bop(root: str, out: str, every: int = 1):
    """BOP scene tree (scene/rgb|depth|mask_visib) -> flat rgb/depth/annotation."""
    import numpy as np
    import imageio.v2 as imageio

    for sub in ("rgb", "depth", "annotation"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    count = 0
    for scene in sorted(os.listdir(root)):
        scene_dir = os.path.join(root, scene)
        if not os.path.isdir(scene_dir):
            continue
        rgbs = sorted(glob.glob(os.path.join(scene_dir, "rgb", "*")))
        for idx, rgb_path in enumerate(rgbs):
            if idx % every:
                continue
            frame = os.path.splitext(os.path.basename(rgb_path))[0]
            name = f"{scene}_{frame}.png"
            shutil.copy(rgb_path, os.path.join(out, "rgb", name))
            depth_path = os.path.join(scene_dir, "depth", os.path.basename(rgb_path))
            if os.path.exists(depth_path):
                shutil.copy(depth_path, os.path.join(out, "depth", name))
            # merge per-instance visible masks into a label image
            masks = sorted(glob.glob(os.path.join(scene_dir, "mask_visib", f"{frame}_*")))
            label = None
            for i, mp in enumerate(masks):
                m = np.asarray(imageio.imread(mp)) > 0
                if label is None:
                    label = np.zeros(m.shape, np.uint8)
                label[m] = i + 1
            if label is not None:
                imageio.imwrite(os.path.join(out, "annotation", name), label)
            count += 1
    print(f"wrote {count} frames to {out}")


def tod_to_coco(root: str, out_json: str):
    """TOD-style tree (scene dirs with rgb/depth/seg label PNGs) -> COCO
    instance JSON with RLE segmentations."""
    import numpy as np
    import imageio.v2 as imageio

    from quber_tpu.data import rle

    images, annotations = [], []
    img_id, ann_id = 1, 1
    for scene in sorted(os.listdir(root)):
        seg_paths = sorted(glob.glob(os.path.join(root, scene, "segmentation*.png")))
        for seg_path in seg_paths:
            label = np.asarray(imageio.imread(seg_path))
            h, w = label.shape[:2]
            base = os.path.basename(seg_path).replace("segmentation", "rgb")
            images.append({
                "id": img_id, "file_name": os.path.join(scene, base),
                "height": int(h), "width": int(w),
                "depth_file_name": os.path.join(
                    scene, base.replace("rgb", "depth")),
            })
            for v in np.unique(label):
                if v <= 1:  # 0 bg, 1 table (TOD convention)
                    continue
                mask = (label == v).astype(np.uint8)
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "iscrowd": 0, "segmentation": rle.encode(mask),
                    "area": int(mask.sum()),
                })
                ann_id += 1
            img_id += 1
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "object", "isthing": 1}],
        }, f)
    print(f"wrote {out_json}: {len(images)} images, {len(annotations)} instances")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("hope", "dopose"):
        p = sub.add_parser(name)
        p.add_argument("--root", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("--every", type=int, default=1 if name == "hope" else 50)
    p = sub.add_parser("tod")
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    args = parser.parse_args()

    if args.cmd in ("hope", "dopose"):
        flatten_bop(args.root, args.out, args.every)
    else:
        tod_to_coco(args.root, args.out)


if __name__ == "__main__":
    main()
