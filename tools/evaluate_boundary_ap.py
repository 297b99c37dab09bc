"""COCO-style instance AP with Boundary IoU (and plain mask IoU).

CLI equivalent of /root/reference/tools/evaluate_coco_boundary_ap.py, which
defers to the boundary-iou-api package (COCO + COCOeval with
iou_type="boundary"). That package is not available here, so this is a
self-contained re-derivation of the protocol:

- Boundary IoU (Cheng et al., CVPR 2021): each mask M is reduced to its
  inner boundary band M ∩ erode(M)^c with erosion distance
  round(dilation_ratio * image diagonal) (default ratio 0.02, matching the
  reference CLI default); the evaluation IoU is
  min(mask IoU, boundary IoU) — the paper's combined measure, which keeps
  small objects (whose band covers the whole mask) scored by mask IoU.
- COCO AP protocol: per image/category greedy matching of detections
  (score-descending) to GT at IoU thresholds 0.50:0.05:0.95, maxDets=100,
  101-point interpolated precision, AP averaged over classes and
  thresholds; crowd GTs are ignore-regions (detections matching them are
  neither TP nor FP).

    python tools/evaluate_boundary_ap.py --gt-json gt.json --dt-json dt.json \
        [--iou-type boundary|segm] [--dilation-ratio 0.02]
"""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

IOU_THRS = [0.5 + 0.05 * i for i in range(10)]
RECALL_THRS = [0.01 * i for i in range(101)]
MAX_DETS = 100


def decode_any(seg, h, w):
    """Decode an RLE dict or COCO polygon list to a binary mask."""
    import numpy as np

    from quber_tpu.data import rle

    if isinstance(seg, dict):
        return rle.decode(seg).astype(bool)
    # polygon list -> fill via cv2 (same rasterization detection2panoptic uses)
    import cv2

    mask = np.zeros((h, w), np.uint8)
    for poly in seg:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask.astype(bool)


def boundary_band(mask, dilation_ratio):
    """Inner boundary band: mask minus erode(mask) at ratio*diag distance
    (same construction as quber_tpu.data.eee.mask_to_boundary, which cites
    the reference's panoptic2eee erosion semantics)."""
    import numpy as np

    from quber_tpu.data.eee import mask_to_boundary

    return mask_to_boundary(
        np.ascontiguousarray(mask), dilation_ratio=dilation_ratio
    ).astype(bool)


def iou_matrix(dt_masks, gt_masks, dt_bands=None, gt_bands=None):
    """[n_dt, n_gt] IoU; with bands, min(mask IoU, boundary IoU)."""
    import numpy as np

    n_dt, n_gt = len(dt_masks), len(gt_masks)
    ious = np.zeros((n_dt, n_gt))
    for i, dm in enumerate(dt_masks):
        for j, gm in enumerate(gt_masks):
            inter = np.logical_and(dm, gm).sum()
            union = dm.sum() + gm.sum() - inter
            m_iou = inter / union if union else 0.0
            if dt_bands is not None:
                bi = np.logical_and(dt_bands[i], gt_bands[j]).sum()
                bu = np.logical_or(dt_bands[i], gt_bands[j]).sum()
                b_iou = bi / bu if bu else 0.0
                m_iou = min(m_iou, b_iou)
            ious[i, j] = m_iou
    return ious


def match_image(ious, dt_scores, gt_iscrowd, thr):
    """Greedy COCO matching at one threshold.

    Returns per-dt matched flags: 1 = TP, 0 = FP, -1 = ignored (crowd).
    """
    n_dt, n_gt = ious.shape
    gt_used = [False] * n_gt
    flags = []
    for i in sorted(range(n_dt), key=lambda k: -dt_scores[k]):
        best, best_iou = -1, thr
        for j in range(n_gt):
            if gt_used[j] and not gt_iscrowd[j]:
                continue
            # prefer non-crowd matches; crowd only if nothing else reaches thr
            if best > -1 and not gt_iscrowd[best] and gt_iscrowd[j]:
                continue
            if ious[i, j] >= best_iou:
                best, best_iou = j, ious[i, j]
        if best == -1:
            flags.append((i, 0))
        elif gt_iscrowd[best]:
            flags.append((i, -1))
        else:
            gt_used[best] = True
            flags.append((i, 1))
    return dict(flags)


def average_precision(tp_flags, scores, n_gt):
    """101-point interpolated AP from pooled (score, flag) detections."""
    import numpy as np

    if n_gt == 0:
        return None
    order = np.argsort([-s for s in scores], kind="mergesort")
    flags = np.asarray(tp_flags)[order]
    keep = flags >= 0
    flags = flags[keep]
    if len(flags) == 0:
        return 0.0
    tp = np.cumsum(flags == 1)
    fp = np.cumsum(flags == 0)
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1)
    # monotone non-increasing precision envelope
    for k in range(len(precision) - 2, -1, -1):
        precision[k] = max(precision[k], precision[k + 1])
    idx = np.searchsorted(recall, RECALL_THRS, side="left")
    return float(np.mean([precision[i] if i < len(precision) else 0.0
                          for i in idx]))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gt-json", required=True)
    parser.add_argument("--dt-json", required=True)
    parser.add_argument("--iou-type", default="boundary",
                        choices=["boundary", "segm"])
    parser.add_argument("--dilation-ratio", default=0.02, type=float)
    args = parser.parse_args()

    with open(args.gt_json) as f:
        gt_coco = json.load(f)
    with open(args.dt_json) as f:
        dts = json.load(f)
    if isinstance(dts, dict):
        dts = dts.get("annotations", [])
    for d in dts:
        d.pop("bbox", None)  # reference drops box predictions (:37-38)

    img_hw = {im["id"]: (im["height"], im["width"])
              for im in gt_coco["images"]}
    cat_ids = sorted({a["category_id"] for a in gt_coco["annotations"]})

    gts_by_key = defaultdict(list)
    for a in gt_coco["annotations"]:
        gts_by_key[(a["image_id"], a["category_id"])].append(a)
    dts_by_key = defaultdict(list)
    for d in dts:
        dts_by_key[(d["image_id"], d["category_id"])].append(d)

    use_boundary = args.iou_type == "boundary"
    # pooled per (category, threshold): detection flags + scores
    pooled = {(c, t): ([], []) for c in cat_ids for t in IOU_THRS}
    n_gt_per_cat = defaultdict(int)

    keys = sorted(set(gts_by_key) | set(dts_by_key))
    for key in keys:
        image_id, cat = key
        if image_id not in img_hw:
            continue
        h, w = img_hw[image_id]
        gts = gts_by_key.get(key, [])
        image_dts = sorted(
            dts_by_key.get(key, []), key=lambda d: -d["score"]
        )[:MAX_DETS]
        n_gt_per_cat[cat] += sum(1 for g in gts if not g.get("iscrowd", 0))
        if not image_dts:
            continue
        gt_masks = [decode_any(g["segmentation"], h, w) for g in gts]
        dt_masks = [decode_any(d["segmentation"], h, w) for d in image_dts]
        gt_bands = dt_bands = None
        if use_boundary:
            gt_bands = [boundary_band(m, args.dilation_ratio) for m in gt_masks]
            dt_bands = [boundary_band(m, args.dilation_ratio) for m in dt_masks]
        ious = iou_matrix(dt_masks, gt_masks, dt_bands, gt_bands)
        scores = [d["score"] for d in image_dts]
        iscrowd = [bool(g.get("iscrowd", 0)) for g in gts]
        for thr in IOU_THRS:
            flags = match_image(ious, scores, iscrowd, thr)
            fl, sc = pooled[(cat, thr)]
            for i in range(len(image_dts)):
                fl.append(flags[i])
                sc.append(scores[i])

    ap_per_thr = defaultdict(list)
    for (cat, thr), (fl, sc) in pooled.items():
        ap = average_precision(fl, sc, n_gt_per_cat[cat])
        if ap is not None:
            ap_per_thr[thr].append(ap)

    mean_ap = {t: (sum(v) / len(v) if v else float("nan"))
               for t, v in sorted(ap_per_thr.items())}
    overall = sum(mean_ap.values()) / len(mean_ap) if mean_ap else float("nan")
    label = "Boundary AP" if use_boundary else "Mask AP"
    print(f"{label} (dilation_ratio={args.dilation_ratio}): "
          f"{100 * overall:.2f}")
    print(f"  AP50: {100 * mean_ap.get(0.5, float('nan')):.2f}   "
          f"AP75: {100 * mean_ap.get(0.75, float('nan')):.2f}")
    return overall


if __name__ == "__main__":
    main()
