"""COCO detection -> panoptic format converter.

CLI equivalent of /root/reference/tools/ours/detection2panoptic_coco_format.py:
turns per-instance RLE/polygon annotations into panoptic id-encoded PNGs +
a panoptic JSON (segments_info per image).

    python tools/detection2panoptic.py --json instances.json \
        --out-json panoptic.json --out-dir panoptic_pngs/
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def id2rgb(ids):
    import numpy as np

    ids = np.asarray(ids, dtype=np.uint32)
    return np.stack(
        [ids % 256, (ids // 256) % 256, (ids // 65536) % 256], axis=-1
    ).astype("uint8")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--json", required=True)
    parser.add_argument("--out-json", required=True)
    parser.add_argument("--out-dir", required=True)
    args = parser.parse_args()

    import numpy as np
    import imageio.v2 as imageio

    from quber_tpu.data import rle

    with open(args.json) as f:
        coco = json.load(f)
    os.makedirs(args.out_dir, exist_ok=True)
    by_image: dict = {}
    for ann in coco["annotations"]:
        by_image.setdefault(ann["image_id"], []).append(ann)

    pan_annotations = []
    for img in coco["images"]:
        h, w = img["height"], img["width"]
        panoptic = np.zeros((h, w), np.uint32)
        segments_info = []
        for j, ann in enumerate(by_image.get(img["id"], []), start=1):
            seg = ann["segmentation"]
            if isinstance(seg, dict):
                mask = rle.decode(seg)
            else:
                # COCO polygon list(s): [[x0, y0, x1, y1, ...], ...]
                import cv2

                mask = np.zeros((h, w), np.uint8)
                for poly in seg:
                    pts = np.asarray(poly, np.float32).reshape(-1, 2)
                    cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
            panoptic[mask > 0] = j
            segments_info.append({
                "id": j,
                "category_id": ann.get("category_id", 1),
                "iscrowd": ann.get("iscrowd", 0),
                "area": int(mask.sum()),
            })
        png_name = os.path.splitext(img["file_name"])[0] + ".png"
        imageio.imwrite(os.path.join(args.out_dir, os.path.basename(png_name)), id2rgb(panoptic))
        pan_annotations.append({
            "image_id": img["id"],
            "file_name": os.path.basename(png_name),
            "segments_info": segments_info,
        })

    out = {
        "images": coco["images"],
        "annotations": pan_annotations,
        "categories": coco.get("categories", [{"id": 1, "name": "object", "isthing": 1}]),
    }
    with open(args.out_json, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out_json} and {len(pan_annotations)} PNGs to {args.out_dir}")


if __name__ == "__main__":
    main()
