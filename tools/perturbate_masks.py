"""Offline mask-perturbation generator.

CLI equivalent of /root/reference/tools/ours/perturbate_masks.py (and its
_coco/_armbench variants): reads a COCO-panoptic JSON + panoptic PNGs,
corrupts each image's GT masks (FP add / over- & under-segmentation /
delete / boundary jitter to a target IoU), and writes the perturbed masks as
compressed RLEs into `images[*].perturbed_segmentation` of a new
*_perturbed.json.

    python tools/perturbate_masks.py --json train_panoptic.json \
        --panoptic-root panoptic_pngs/ --out train_panoptic_perturbed.json \
        [--iou-low 0.8 --iou-high 1.0 --seed 7]
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
    parser.add_argument("--iou-low", type=float, default=0.8)
    parser.add_argument("--iou-high", type=float, default=1.0)
    parser.add_argument("--fp-ratio", type=float, default=0.15)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    import numpy as np
    import imageio.v2 as imageio

    from quber_tpu.data import rle
    from quber_tpu.data.datasets import rgb2id
    from quber_tpu.data.perturb import perturb_masks

    with open(args.json) as f:
        coco = json.load(f)
    anns = {a["image_id"]: a for a in coco.get("annotations", [])}
    rng = np.random.RandomState(args.seed)

    for i, img in enumerate(coco["images"]):
        ann = anns.get(img["id"])
        if ann is None:
            continue
        pan_path = os.path.join(
            args.panoptic_root, ann.get("file_name", img["file_name"]).replace(".jpg", ".png")
        )
        panoptic = rgb2id(np.asarray(imageio.imread(pan_path)))
        masks = np.asarray([
            (panoptic == seg["id"]).astype(np.uint8) for seg in ann["segments_info"]
        ])
        pert = perturb_masks(
            masks, rng, target_iou=(args.iou_low, args.iou_high),
            ratios={"fp": args.fp_ratio},
        )
        img["perturbed_segmentation"] = [rle.encode(m) for m in pert]
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(coco['images'])}")

    out = args.out or args.json.replace(".json", "_perturbed.json")
    with open(out, "w") as f:
        json.dump(coco, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
