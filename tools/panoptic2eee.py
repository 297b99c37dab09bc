"""Offline quadruple-error-map generator.

CLI equivalent of /root/reference/tools/ours/panoptic2eee.py: for each image,
compares the GT panoptic masks with the stored perturbed masks and writes the
8 TP/TN/FP/FN mask+boundary error maps as compressed RLEs into the images[]
records (keys tp_mask...fn_boundary).

    python tools/panoptic2eee.py --json train_panoptic_perturbed.json \
        --panoptic-root panoptic_pngs/ [--out updated.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--json", required=True)
    parser.add_argument("--panoptic-root", required=True)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import numpy as np
    import imageio.v2 as imageio

    from quber_tpu.data import rle
    from quber_tpu.data.datasets import rgb2id
    from quber_tpu.data.eee import compute_eee_maps

    with open(args.json) as f:
        coco = json.load(f)
    anns = {a["image_id"]: a for a in coco.get("annotations", [])}

    for i, img in enumerate(coco["images"]):
        ann = anns.get(img["id"])
        if ann is None or "perturbed_segmentation" not in img:
            continue
        pan_path = os.path.join(
            args.panoptic_root, ann.get("file_name", img["file_name"]).replace(".jpg", ".png")
        )
        panoptic = rgb2id(np.asarray(imageio.imread(pan_path)))
        gt = np.asarray([
            (panoptic == seg["id"]).astype(np.uint8) for seg in ann["segments_info"]
        ])
        pert = np.asarray([rle.decode(r) for r in img["perturbed_segmentation"]])
        maps = compute_eee_maps(gt, pert)
        for key, value in maps.items():
            img[key] = rle.encode(value.astype(np.uint8))
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(coco['images'])}")

    out = args.out or args.json
    with open(out, "w") as f:
        json.dump(coco, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
