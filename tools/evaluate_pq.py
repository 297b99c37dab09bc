"""Panoptic-Quality evaluator (PQ / SQ / RQ, per class + means).

CLI equivalent of /root/reference/tools/evaluate_pq_for_semantic_segmentation.py
(whose core is panopticapi's pq_compute_single_image): each distinct pixel
label in a prediction/GT label image is a segment whose id doubles as its
category id; segments match when IoU > 0.5 (IoU unions subtract the
VOID-overlap from the prediction area, exactly as the reference does);
unmatched GT segments are FN, unmatched predictions are FP unless >50% of
their area lies on VOID. PQ = sum(IoU of TPs) / (TP + FP/2 + FN/2),
SQ = sum(IoU)/TP, RQ = TP / (TP + FP/2 + FN/2).

The reference iterates python dicts per (gt, pred) label pair; here the
confusion matrix comes from one np.unique over gt * OFFSET + pred, and the
matching/count logic is vectorized over segment pairs.

    python tools/evaluate_pq.py --gt-dir gt_labels/ --pred-dir pred_labels/ \
        [--ignore-label 255]
"""

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OFFSET = 256 * 256 * 256  # reference evaluate_pq...py:45


def pq_stats_single_image(gt, pred, ignore_label=255):
    """Per-category {iou_sum, tp, fp, fn} for one label-image pair.

    Matches pq_compute_single_image (reference :41-137) with id==category:
    at most one prediction can have IoU>0.5 with a GT segment, so greedy
    set-matching and thresholded matching coincide.
    """
    import numpy as np

    gt = gt.astype(np.uint64)
    pred = pred.astype(np.uint64)
    void = np.uint64(ignore_label)

    pair, inter = np.unique(gt * np.uint64(OFFSET) + pred, return_counts=True)
    gt_ids_p = (pair // np.uint64(OFFSET)).astype(np.int64)
    pr_ids_p = (pair % np.uint64(OFFSET)).astype(np.int64)

    gt_ids, gt_area = np.unique(gt, return_counts=True)
    pr_ids, pr_area = np.unique(pred, return_counts=True)
    gt_area = dict(zip(gt_ids.astype(np.int64), gt_area))
    pr_area = dict(zip(pr_ids.astype(np.int64), pr_area))

    # VOID overlap per prediction id: subtracted from match unions, and the
    # >50%-on-VOID rule exempts unmatched predictions from FP (ref :128-135)
    void_inter = {
        int(p): int(c)
        for g, p, c in zip(gt_ids_p, pr_ids_p, inter)
        if g == int(void)
    }

    stats = defaultdict(lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})
    gt_matched, pr_matched = set(), set()
    for g, p, c in zip(gt_ids_p, pr_ids_p, inter):
        g, p, c = int(g), int(p), int(c)
        if g == int(void) or p == int(void):
            continue
        if g != p:  # id==category: only same-category pairs can match
            continue
        union = pr_area[p] + gt_area[g] - c - void_inter.get(p, 0)
        iou = c / union
        if iou > 0.5:
            stats[g]["tp"] += 1
            stats[g]["iou"] += iou
            gt_matched.add(g)
            pr_matched.add(p)

    for g in gt_area:
        if g != int(void) and g not in gt_matched:
            stats[g]["fn"] += 1
    for p in pr_area:
        if p == int(void) or p in pr_matched:
            continue
        if void_inter.get(p, 0) / pr_area[p] > 0.5:
            continue
        stats[p]["fp"] += 1
    return stats


def aggregate(per_image_stats):
    """Sum per-category stats and derive PQ/SQ/RQ per class + means."""
    totals = defaultdict(lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})
    for stats in per_image_stats:
        for cat, s in stats.items():
            for k in s:
                totals[cat][k] += s[k]

    results = {}
    for cat, s in sorted(totals.items()):
        denom = s["tp"] + 0.5 * s["fp"] + 0.5 * s["fn"]
        if denom == 0:
            continue
        pq = s["iou"] / denom
        sq = s["iou"] / s["tp"] if s["tp"] else 0.0
        rq = s["tp"] / denom
        results[cat] = {"pq": pq, "sq": sq, "rq": rq, **s}
    n = len(results)
    mean = {
        k: (sum(r[k] for r in results.values()) / n if n else 0.0)
        for k in ("pq", "sq", "rq")
    }
    return results, mean


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gt-dir", required=True,
                        help="folder of GT label PNGs (uint8/uint16 ids)")
    parser.add_argument("--pred-dir", required=True,
                        help="folder of predicted label PNGs (same names)")
    parser.add_argument("--ignore-label", type=int, default=255)
    parser.add_argument("--out-json", default=None)
    args = parser.parse_args()

    import imageio.v2 as imageio
    import numpy as np

    gt_files = sorted(
        glob.glob(os.path.join(args.gt_dir, "*.png"))
        + glob.glob(os.path.join(args.gt_dir, "*.pbm"))
    )
    if not gt_files:
        raise SystemExit(f"no label images under {args.gt_dir}")

    per_image = []
    for gt_path in gt_files:
        pred_path = os.path.join(args.pred_dir, os.path.basename(gt_path))
        if not os.path.exists(pred_path):
            raise SystemExit(f"missing prediction for {gt_path}")
        gt = np.asarray(imageio.imread(gt_path))
        pred = np.asarray(imageio.imread(pred_path))
        if gt.shape != pred.shape:
            raise SystemExit(f"shape mismatch for {gt_path}")
        per_image.append(pq_stats_single_image(gt, pred, args.ignore_label))

    results, mean = aggregate(per_image)
    print(f"{'class':>8} {'PQ':>7} {'SQ':>7} {'RQ':>7} {'tp':>5} {'fp':>5} {'fn':>5}")
    for cat, r in results.items():
        print(f"{cat:>8} {100 * r['pq']:>7.2f} {100 * r['sq']:>7.2f} "
              f"{100 * r['rq']:>7.2f} {r['tp']:>5} {r['fp']:>5} {r['fn']:>5}")
    print(f"{'mean':>8} {100 * mean['pq']:>7.2f} {100 * mean['sq']:>7.2f} "
          f"{100 * mean['rq']:>7.2f}   (over {len(results)} classes, "
          f"{len(per_image)} images)")

    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"per_class": results, "mean": mean}, f, indent=2)


if __name__ == "__main__":
    main()
