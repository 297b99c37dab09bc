"""Armbench instance-segmentation eval entry point.

Functional equivalent of /root/reference/eval/run_eval_armbench.py, which
walks a COCO instance JSON (mix-object-tote test split, object category),
replays recorded initial masks, refines them RGB-only (armbench ships no
depth — the reference passes depth=None into its refiner wrapper), and
dumps instance visualizations. The reference script carries hardcoded
paths and no metric aggregation; this entry point keeps its semantics and
adds the Overlap/Boundary P/R/F tables + CSV row the rest of the harness
produces.

    python tools/run_eval_armbench.py --json test.json --image-root images/ \
        [--category 2] [--npy-folder vis_npy/] \
        --config-file configs/mask_refiner_rgb_only.yaml \
        [--weights-file output/.../ckpt] [--visualize --vis-dir vis/]

Without --npy-folder, initial masks come from perturbed ground truth (the
controlled-error-injection seam, eval/base_model.py GT family) so the
entry point is runnable end to end without recorded detector outputs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import OrderedDict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ann_to_mask(ann, h, w):
    """COCO segmentation (compressed-string / uncompressed RLE / polygon)
    -> bool [h, w]."""
    from quber_tpu.data import rle as rle_mod

    seg = ann["segmentation"]
    if isinstance(seg, dict):
        return rle_mod.decode(seg) > 0
    mask = np.zeros((h, w), np.uint8)
    import cv2

    for poly in seg:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask > 0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--json", required=True, help="COCO instance JSON")
    parser.add_argument("--image-root", required=True)
    parser.add_argument("--category", type=int, default=2,
                        help="category id to evaluate (reference: 2 = the "
                             "mix-object-tote 'Object' class)")
    parser.add_argument("--npy-folder", default="",
                        help="replay recorded initial masks "
                             "(vis_npy/<stem>.npy, reference :37); default "
                             "perturbed ground truth")
    parser.add_argument("--config-file", default="configs/mask_refiner_rgb_only.yaml")
    parser.add_argument("--weights-file", default=None)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--vis-dir", default="./vis_armbench")
    parser.add_argument("--csv", default="./eval_results.csv")
    parser.add_argument("--tag", default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from quber_tpu.config import load_config
    from quber_tpu.data.perturb import perturb_masks
    from quber_tpu.evaluation.harness import save_csv, print_table, aggregate, PRINT_KEYS
    from quber_tpu.evaluation.metrics import multilabel_metrics
    from quber_tpu.predictor import MaskRefinerPredictor
    from quber_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()

    model_cfg, _ = load_config(args.config_file)
    params = None
    if args.weights_file:
        from quber_tpu.train.checkpoint import load_eval_params

        params = load_eval_params(args.weights_file)
    predictor = MaskRefinerPredictor(model_cfg, params=params)
    ch, cw = model_cfg.height, model_cfg.width

    with open(args.json) as f:
        coco = json.load(f)
    anns_by_img: dict = {}
    for a in coco.get("annotations", []):
        if args.category and a.get("category_id") != args.category:
            continue
        anns_by_img.setdefault(a["image_id"], []).append(a)
    images = [im for im in coco["images"] if anns_by_img.get(im["id"])]
    if args.limit:
        images = images[:args.limit]
    print(f"armbench eval: {len(images)} images with category {args.category}")

    rng = np.random.RandomState(args.seed)
    init_all, ref_all, times = [], [], []
    import cv2

    for im in images:
        h, w = im["height"], im["width"]
        img_path = os.path.join(args.image_root, im["file_name"])
        gt = np.stack([ann_to_mask(a, h, w) for a in anns_by_img[im["id"]]])

        if args.npy_folder:
            stem = os.path.splitext(im["file_name"])[0]
            initial = np.load(os.path.join(args.npy_folder, stem + ".npy")) > 0
        else:
            initial = perturb_masks(gt.astype(np.uint8), rng)
            initial = np.asarray(initial) > 0

        # RGB-only refine: armbench has no depth; the model config selects
        # its rgb slice, depth plane rides as zeros (reference passes
        # depth=None, refiner_model.py armbench branch)
        rgb = cv2.imread(img_path)
        rgb = cv2.resize(rgb, (cw, ch))
        zero_depth = np.zeros((ch, cw, 3), np.uint8)
        init_model = [
            cv2.resize(m.astype(np.uint8), (cw, ch),
                       interpolation=cv2.INTER_NEAREST) > 0
            for m in initial
        ]
        t0 = time.time()
        pan, count, scores = predictor.predict_packed(rgb, zero_depth, init_model)
        times.append(time.time() - t0)
        refined = [
            cv2.resize((np.asarray(pan) == k).astype(np.uint8), (w, h),
                       interpolation=cv2.INTER_NEAREST) > 0
            for k in range(1, int(count) + 1)
        ]

        gt_label = np.zeros((h, w), np.int32)
        for k, m in enumerate(gt, 1):
            gt_label[m] = k
        init_label = np.zeros((h, w), np.int32)
        for k, m in enumerate(initial, 1):
            init_label[m] = k
        ref_label = np.zeros((h, w), np.int32)
        for k, m in enumerate(refined, 1):
            ref_label[m] = k
        init_all.append(multilabel_metrics(init_label, gt_label))
        ref_all.append(multilabel_metrics(ref_label, gt_label))

        if args.visualize:
            os.makedirs(args.vis_dir, exist_ok=True)
            vis = cv2.resize(rgb, (w, h)).copy()
            for lbl, col in ((init_label, (0, 0, 255)), (ref_label, (0, 255, 0))):
                edges = cv2.Canny((lbl > 0).astype(np.uint8) * 255, 50, 150)
                vis[edges > 0] = col
            cv2.imwrite(os.path.join(
                args.vis_dir, os.path.splitext(im["file_name"])[0] + ".jpg"), vis)

    avg_ms = 1000 * float(np.mean(times[1:] or times)) if times else 0.0
    tag = args.tag or f"armbench|{os.path.basename(args.json)}"
    for stage, all_m in (("initial", init_all), ("refined", ref_all)):
        agg = aggregate(all_m)
        print_table(f"{stage} (armbench, n={len(all_m)})", agg)
        row = OrderedDict(
            [("dataset", "armbench"), ("stage", stage),
             ("base", "npy" if args.npy_folder else "perturbed-gt"),
             ("refiner", "QuBERRefiner"), ("tag", tag),
             ("n_images", len(all_m)), ("avg_ms", avg_ms)]
            + [(k, agg.get(k)) for k in PRINT_KEYS]
        )
        save_csv(args.csv, row)


if __name__ == "__main__":
    main()
