"""Panoptic COCO -> semantic segmentation converter.

CLI equivalent of /root/reference/tools/ours/panoptic2semantic_segmentation.py:
all segments of the same semantic class in one image are combined; with
--things-other every thing-class segment collapses into a single 'other'
class (id 183, matching the reference's OTHER_CLASS_ID).

Two output modes (mutually exclusive, like the reference):

    # per-image semantic label PNGs
    python tools/panoptic2semantic.py --json panoptic.json \
        --panoptic-root pngs/ --semantic-dir semantic_pngs/

    # COCO detection-style JSON with one merged RLE per (image, category)
    python tools/panoptic2semantic.py --json panoptic.json \
        --panoptic-root pngs/ --out-json semantic.json \
        [--categories-json categories.json] [--things-other]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OTHER_CLASS_ID = 183  # reference panoptic2semantic_segmentation.py:35


def merge_rles(masks):
    """Union of binary masks -> one RLE (reference uses COCOmask.merge)."""
    import numpy as np

    from quber_tpu.data import rle

    return rle.encode((np.sum(masks, axis=0) > 0).astype(np.uint8))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--json", required=True, help="panoptic COCO JSON")
    parser.add_argument("--panoptic-root", required=True,
                        help="folder with the panoptic id-encoded PNGs")
    parser.add_argument("--out-json", default=None,
                        help="write COCO detection-style semantic JSON")
    parser.add_argument("--semantic-dir", default=None,
                        help="write per-image uint8 semantic label PNGs")
    parser.add_argument("--categories-json", default=None,
                        help="categories list/dict with isthing flags "
                        "(defaults to the panoptic JSON's categories)")
    parser.add_argument("--things-other", action="store_true",
                        help="collapse all thing classes into id 183")
    args = parser.parse_args()

    if (args.out_json is None) == (args.semantic_dir is None):
        parser.error("exactly one of --out-json / --semantic-dir is required")

    import imageio.v2 as imageio
    import numpy as np

    from quber_tpu.data.datasets import rgb2id

    with open(args.json) as f:
        coco = json.load(f)

    if args.categories_json:
        with open(args.categories_json) as f:
            cat_list = json.load(f)
    else:
        cat_list = coco.get("categories", [])
    if isinstance(cat_list, dict):
        cat_list = list(cat_list.values())
    isthing = {c["id"]: int(c.get("isthing", 1)) for c in cat_list}

    if args.semantic_dir:
        os.makedirs(args.semantic_dir, exist_ok=True)

    records = []
    annotations = coco.get("annotations", [])
    for i, ann in enumerate(annotations):
        pan_png = np.asarray(
            imageio.imread(os.path.join(args.panoptic_root, ann["file_name"]))
        )
        pan = rgb2id(pan_png) if pan_png.ndim == 3 else pan_png.astype(np.uint32)

        # group segment masks by (possibly remapped) semantic category
        by_cat: dict[int, list[np.ndarray]] = {}
        for seg in ann["segments_info"]:
            cat_id = seg["category_id"]
            if args.things_other and isthing.get(cat_id, 1) == 1:
                cat_id = OTHER_CLASS_ID
            by_cat.setdefault(cat_id, []).append(pan == seg["id"])

        if args.semantic_dir:
            semantic = np.zeros(pan.shape, np.uint8)
            for cat_id, masks in by_cat.items():
                for m in masks:
                    semantic[m] = cat_id
            out_name = os.path.splitext(ann["file_name"])[0] + ".png"
            imageio.imwrite(os.path.join(args.semantic_dir, out_name), semantic)
        else:
            for cat_id, masks in by_cat.items():
                merged = merge_rles(masks)
                union = np.sum(masks, axis=0) > 0
                ys, xs = np.where(union)
                bbox = (
                    [float(xs.min()), float(ys.min()),
                     float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)]
                    if len(xs) else [0.0, 0.0, 0.0, 0.0]
                )
                records.append({
                    "image_id": ann["image_id"],
                    "category_id": int(cat_id),
                    "segmentation": merged,
                    "area": int(union.sum()),
                    "bbox": bbox,
                    "iscrowd": 0,
                })
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(annotations)} images processed")

    if args.out_json:
        out = {
            "images": [
                {k: v for k, v in im.items() if k != "perturbed_segmentation"}
                for im in coco.get("images", [])
            ],
            "annotations": records,
            "categories": cat_list,
        }
        with open(args.out_json, "w") as f:
            json.dump(out, f)
        print(f"wrote {len(records)} semantic records to {args.out_json}")
    else:
        print(f"wrote semantic PNGs for {len(annotations)} images to "
              f"{args.semantic_dir}")


if __name__ == "__main__":
    main()
