"""Offline copy-paste dataset augmentation.

CLI equivalent of /root/reference/tools/ours/copy_and_paste_aug.py: for each
image, produce `--variants` augmented copies by pasting 3-10 donor instances
(cropped from random other images, preferring barely-occluded ones) into the
scene. Each paste mirrors the reference's geometry:

- the paste point lands within +-0.5 box-extents of a random existing GT
  instance, and the paste must overlap existing instances by >= 50 px (the
  augmentation exists to create realistic occlusions, reference :170-176);
- the donor crop is rescaled by z_median/z so its apparent size matches the
  scene depth at the paste point, and its depth values are shifted by
  (z - z_median) so it sits at the local surface depth (reference :139-148);
- half the pasted crops get a Gaussian blur (soft sensor edges, :149-151);
- occluded pixels are removed from the existing GT masks; the pasted mask
  becomes a new instance (reference :181-185).

Writes augmented rgb/depth PNGs plus a COCO instance JSON with RLE
segmentations (the `_augmented` annotations consumed by the
`*_augmented` dataset registrations in quber_tpu/data/datasets.py).

    python tools/copy_paste_aug.py --json instances.json --image-root imgs/ \
        --out-dir augmented/ --out-json instances_augmented.json \
        [--variants 4] [--min-paste 3] [--max-paste 10] [--seed 0]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_bbox(mask):
    import numpy as np

    ys, xs = np.where(mask)
    if len(xs) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max() - xs.min()), int(ys.max() - ys.min())


def load_donor(coco, by_image, image_root, rng, rle_decode, imread):
    """A random barely-occluded instance crop: (rgb, depth, mask) patches."""
    import numpy as np

    images = coco["images"]
    for _ in range(64):
        img = images[rng.randint(len(images))]
        anns = by_image.get(img["id"], [])
        if not anns:
            continue
        ann = anns[rng.randint(len(anns))]
        if ann.get("occluded_rate", 0.0) >= 0.05:
            continue
        seg = ann.get("visible_mask", ann["segmentation"])
        mask = rle_decode(seg)
        box = get_bbox(mask)
        if box is None:
            continue
        x, y, w, h = box
        rgb = imread(os.path.join(image_root, img["file_name"]))[..., :3]
        depth = imread(os.path.join(image_root, img["depth_file_name"]))
        rgb = rgb * mask[:, :, None]
        depth = depth * mask
        return (
            rgb[y:y + h + 1, x:x + w + 1],
            depth[y:y + h + 1, x:x + w + 1],
            mask[y:y + h + 1, x:x + w + 1],
        )
    return None


def paste_instance(rng, rgb, depth, gt_masks, donor, min_overlap=50):
    """One reference-style paste attempt loop. Mutates rgb/depth/gt_masks
    in place on success; returns the pasted mask or None."""
    import cv2
    import numpy as np

    H, W = rgb.shape[:2]
    for _ in range(10):
        gt_mask = gt_masks[rng.randint(len(gt_masks))]
        box = get_bbox(gt_mask)
        if box is None:
            continue
        x_gt, y_gt, w_gt, h_gt = box
        rgb_crop, depth_crop, mask_crop = (a.copy() for a in donor)
        h, w = mask_crop.shape
        x0 = rng.randint(max(int(x_gt - w_gt * 0.5), 0),
                         min(int(x_gt + w_gt * 0.5), W - 1) + 1)
        y0 = rng.randint(max(int(y_gt - h_gt * 0.5), 0),
                         min(int(y_gt + h_gt * 0.5), H - 1) + 1)

        # depth-aware rescale: apparent size follows the scene depth at the
        # paste point (reference copy_and_paste_aug.py:139-148)
        z = float(depth[y0, x0])
        inside = depth_crop[mask_crop > 0]
        z_median = float(np.median(inside)) if inside.size else 0.0
        if z <= 0 or z_median <= 0:
            continue
        w = int(w * z_median / z)
        h = int(h * z_median / z)
        if w == 0 or h == 0:
            continue
        rgb_crop = cv2.resize(rgb_crop, (w, h))
        mask_crop = cv2.resize(mask_crop, (w, h), interpolation=cv2.INTER_NEAREST)
        depth_crop = cv2.resize(depth_crop, (w, h), interpolation=cv2.INTER_NEAREST)
        if rng.rand() < 0.5:
            rgb_crop = cv2.GaussianBlur(rgb_crop, (5, 5), 2)

        w = min(w, W - x0)
        h = min(h, H - y0)
        rgb_crop, mask_crop, depth_crop = (
            rgb_crop[:h, :w], mask_crop[:h, :w], depth_crop[:h, :w])

        mask_to_add = np.zeros((H, W), mask_crop.dtype)
        mask_to_add[y0:y0 + h, x0:x0 + w] = mask_crop
        overlap = np.logical_and(
            mask_to_add[None].astype(bool), np.asarray(gt_masks, bool)
        ).any(0)
        if overlap.sum() < min_overlap:  # must create an occlusion (:170-176)
            continue

        region = mask_to_add.astype(bool)
        rgb_patch = np.zeros_like(rgb)
        rgb_patch[y0:y0 + h, x0:x0 + w] = rgb_crop
        depth_patch = np.zeros_like(depth)
        # shift the donor to the local surface depth; clamp so the shift
        # cannot wrap around in unsigned depth dtypes
        shifted = np.clip(
            depth_crop.astype(np.float64) + z - z_median,
            0, np.iinfo(depth.dtype).max if np.issubdtype(depth.dtype, np.integer)
            else np.finfo(depth.dtype).max)
        depth_patch[y0:y0 + h, x0:x0 + w] = shifted.astype(depth.dtype)
        rgb[region] = rgb_patch[region]
        depth[region] = depth_patch[region]
        for k in range(len(gt_masks)):
            gt_masks[k] = np.logical_and(gt_masks[k], ~region).astype(np.uint8)
        gt_masks.append(mask_to_add)
        return mask_to_add
    return None


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--json", required=True, help="COCO instance JSON")
    parser.add_argument("--image-root", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--out-json", required=True)
    parser.add_argument("--variants", type=int, default=4)
    parser.add_argument("--min-paste", type=int, default=3)
    parser.add_argument("--max-paste", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import imageio.v2 as imageio
    import numpy as np

    from quber_tpu.data import rle

    rng = np.random.RandomState(args.seed)
    with open(args.json) as f:
        coco = json.load(f)
    by_image: dict = {}
    for ann in coco["annotations"]:
        by_image.setdefault(ann["image_id"], []).append(ann)
    os.makedirs(args.out_dir, exist_ok=True)

    def imread(path):
        return np.asarray(imageio.imread(path))

    out_images, out_annos = [], []
    new_img_id, new_ann_id = 1, 1
    for img in coco["images"]:
        anns = by_image.get(img["id"], [])
        if not anns:
            continue
        base_rgb = imread(os.path.join(args.image_root, img["file_name"]))[..., :3]
        base_depth = imread(os.path.join(args.image_root, img["depth_file_name"]))
        for _ in range(args.variants):
            rgb = base_rgb.copy()
            depth = base_depth.copy()
            gt_masks = [
                rle.decode(a.get("visible_mask", a["segmentation"])) for a in anns
            ]
            n_paste = rng.randint(args.min_paste, args.max_paste + 1)
            for _ in range(n_paste):
                donor = load_donor(coco, by_image, args.image_root, rng,
                                   rle.decode, imread)
                if donor is not None:
                    paste_instance(rng, rgb, depth, gt_masks, donor)

            rgb_name = f"{new_img_id}.png"
            depth_name = f"{new_img_id}_depth.png"
            imageio.imwrite(os.path.join(args.out_dir, rgb_name),
                            rgb.astype(np.uint8))
            imageio.imwrite(os.path.join(args.out_dir, depth_name),
                            base_depth.dtype.type(depth))
            for gt_mask in gt_masks:
                if gt_mask.sum() == 0:
                    continue
                out_annos.append({
                    "id": new_ann_id, "image_id": new_img_id, "category_id": 1,
                    "segmentation": rle.encode(gt_mask),
                    "bbox": get_bbox(gt_mask), "area": int(gt_mask.sum()),
                    "iscrowd": 0,
                })
                new_ann_id += 1
            info = dict(img)
            info["id"] = new_img_id
            info["file_name"] = rgb_name
            info["depth_file_name"] = depth_name
            out_images.append(info)
            new_img_id += 1

    with open(args.out_json, "w") as f:
        json.dump({
            "images": out_images,
            "annotations": out_annos,
            "categories": coco.get(
                "categories",
                [{"id": 1, "name": "object", "supercategory": "shape"}]),
        }, f)
    print(f"wrote {len(out_images)} augmented images "
          f"({len(out_annos)} instances) to {args.out_dir}")


if __name__ == "__main__":
    main()
