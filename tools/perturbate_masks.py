"""Offline mask-perturbation generator.

CLI equivalent of /root/reference/tools/ours/perturbate_masks.py and its
variants (_coco, _armbench, _from_is): corrupts each image's GT masks (FP
add / over- & under-segmentation / merge / split / delete / boundary
jitter to a target IoU) and writes the perturbed masks as RLEs into
`images[*].perturbed_segmentation` of a new *_perturbed.json. When the
source images are readable, false positives and over-/under-segmentations
are seeded from Felzenszwalb graph-segmentation proposals exactly as the
reference does (perturbate_masks.py:88-133); otherwise the image-free
ellipse-proposal pipeline is used.

Formats:
  panoptic (default) — COCO-panoptic JSON + panoptic PNGs
      python tools/perturbate_masks.py --json train_panoptic.json \
          --panoptic-root panoptic_pngs/ [--image-root imgs/]
  coco — COCO instance JSON (visible_mask/segmentation RLEs), the
      perturbate_masks.py / _coco / _armbench flow
      python tools/perturbate_masks.py --format coco \
          --json coco_anns_uoais_sim_train.json --image-root train/
  from_is — replay a real instance segmenter's outputs as the perturbed
      masks (perturbate_masks_from_is.py:95-96: per-image npy stacks)
      python tools/perturbate_masks.py --format from_is \
          --json coco_anns.json --npy-root results/uoaisnet/npy
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _perturb(masks, rgb, rng, args):
    import numpy as np

    from quber_tpu.data.perturb import perturb_masks, perturb_masks_reference

    if masks.size == 0:
        return masks
    if rgb is not None and not args.no_felzenszwalb:
        return perturb_masks_reference(
            masks, rgb, rng, iou_target=(args.iou_low, args.iou_high)
        )
    return perturb_masks(
        np.asarray(masks), rng, target_iou=(args.iou_low, args.iou_high),
        ratios={"fp": args.fp_ratio},
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--format", default="panoptic",
                        choices=("panoptic", "coco", "armbench", "from_is"))
    parser.add_argument("--json", required=True)
    parser.add_argument("--panoptic-root", default=None,
                        help="panoptic PNG dir (panoptic format)")
    parser.add_argument("--image-root", default=None,
                        help="RGB image dir (enables Felzenszwalb proposals)")
    parser.add_argument("--npy-root", default=None,
                        help="per-image npy mask stacks (from_is format)")
    parser.add_argument("--out", default=None)
    parser.add_argument("--iou-low", type=float, default=0.8)
    parser.add_argument("--iou-high", type=float, default=1.0)
    parser.add_argument("--fp-ratio", type=float, default=0.15,
                        help="FP ratio for the image-free fallback pipeline")
    parser.add_argument("--no-felzenszwalb", action="store_true",
                        help="force the image-free ellipse-proposal pipeline")
    parser.add_argument("--category-id", type=int, default=None,
                        help="keep only this category (armbench uses 2)")
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()
    if args.format == "armbench":
        args.format = "coco"
        if args.category_id is None:
            args.category_id = 2  # armbench 'object' class

    import imageio.v2 as imageio
    import numpy as np

    from quber_tpu.data import rle
    from quber_tpu.data.datasets import rgb2id

    with open(args.json) as f:
        coco = json.load(f)
    rng = np.random.RandomState(args.seed)

    def load_rgb(img):
        if args.image_root is None:
            return None
        path = os.path.join(args.image_root, img["file_name"])
        if not os.path.isfile(path):
            return None
        import cv2

        return cv2.imread(path)

    suffix = "_perturbed"
    if args.format == "panoptic":
        if not args.panoptic_root:
            parser.error("--panoptic-root required for panoptic format")
        anns = {a["image_id"]: a for a in coco.get("annotations", [])}
        for i, img in enumerate(coco["images"]):
            ann = anns.get(img["id"])
            if ann is None:
                continue
            pan_path = os.path.join(
                args.panoptic_root,
                ann.get("file_name", img["file_name"]).replace(".jpg", ".png"),
            )
            panoptic = rgb2id(np.asarray(imageio.imread(pan_path)))
            masks = np.asarray([
                (panoptic == seg["id"]).astype(np.uint8)
                for seg in ann["segments_info"]
            ])
            pert = _perturb(masks, load_rgb(img), rng, args)
            img["perturbed_segmentation"] = [rle.encode(m) for m in pert]
            if (i + 1) % 100 == 0:
                print(f"{i + 1}/{len(coco['images'])}")
    elif args.format == "coco":
        anns_by_img: dict = {}
        for a in coco.get("annotations", []):
            if args.category_id is None or a.get("category_id") == args.category_id:
                anns_by_img.setdefault(a["image_id"], []).append(a)
        for i, img in enumerate(coco["images"]):
            masks = []
            for a in anns_by_img.get(img["id"], []):
                seg = a.get("visible_mask") or a.get("segmentation")
                if isinstance(seg, dict):
                    masks.append(rle.decode(seg))
            masks = (np.asarray(masks, np.uint8) if masks
                     else np.zeros((0, img["height"], img["width"]), np.uint8))
            pert = _perturb(masks, load_rgb(img), rng, args)
            img["perturbed_segmentation"] = [rle.encode(m) for m in pert]
            if (i + 1) % 100 == 0:
                print(f"{i + 1}/{len(coco['images'])}")
    elif args.format == "from_is":
        if not args.npy_root:
            parser.error("--npy-root required for from_is format")
        suffix = "_perturbed_is"
        for i, img in enumerate(coco["images"]):
            npy = os.path.join(args.npy_root, f"{img['id']}.npy")
            if not os.path.isfile(npy):
                img["perturbed_segmentation"] = []
                continue
            masks = np.load(npy).astype(np.uint8)
            # the reference replays IS outputs verbatim (no corruption):
            # they already carry real segmentation errors
            img["perturbed_segmentation"] = [rle.encode(m) for m in masks]

    out = args.out or args.json.replace(".json", f"{suffix}.json")
    with open(out, "w") as f:
        json.dump(coco, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
