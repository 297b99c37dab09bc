"""Overlap & Boundary P/R/F metrics with Hungarian matching.

Re-implementation of the reference's UOIS evaluation
(/root/reference/eval/evaluation.py:22-274, seg2bmap at
eval/utilities.py:672-696), itself modeled on the Davis-2017 / Dave et al.
protocol. Definitions preserved exactly:

  * per-pair object P/R/F from pixel overlaps of Hungarian-matched
    (GT x prediction) instances; the assignment maximizes the pairwise
    F-matrix (we use scipy.optimize.linear_sum_assignment instead of the
    vendored 751-line pure-Python Munkres — same optimum)
  * boundary P/R/F from 1-px external contours (cv2.findContours) dilated by
    a disk of radius ceil(0.003 * image diagonal)
  * OSN (object-size-normalized) variants, F@.75 detection rates, mIoU
  * the reference's exact edge-case returns for empty GT/prediction

The O(G*P) pairwise loops are vectorized with one [G, H*W] x [H*W, P]
intersection matmul instead of nested Python loops over mask pairs.
"""

from __future__ import annotations

import numpy as np

BACKGROUND_LABEL = 0
OBJECTS_LABEL = 1


def disk(radius: int) -> np.ndarray:
    """Disk structuring element (skimage.morphology.disk semantics)."""
    r = int(radius)
    y, x = np.ogrid[-r : r + 1, -r : r + 1]
    return (x**2 + y**2 <= r**2).astype(np.uint8)


def seg2bmap(seg: np.ndarray) -> np.ndarray:
    """1-px-wide external-contour boundary map of a binary mask.

    cv2.findContours(RETR_EXTERNAL) + drawContours, matching
    eval/utilities.py:672-696 (the boundary lives on the mask and ignores
    hole rims).
    """
    import cv2

    seg = np.ascontiguousarray(seg.astype(np.uint8))
    contours, _ = cv2.findContours(seg, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    bmap = np.zeros_like(seg)
    cv2.drawContours(bmap, contours, -1, 1, 1)
    return bmap


def boundary_overlap(predicted_mask, gt_mask, bound_th: float = 0.003):
    """(precision_tps, recall_tps) between dilated boundaries
    (evaluation.py:22-54)."""
    import cv2

    bound_pix = (
        bound_th
        if bound_th >= 1
        else np.ceil(bound_th * np.linalg.norm(predicted_mask.shape))
    )
    fg_boundary = seg2bmap(predicted_mask)
    gt_boundary = seg2bmap(gt_mask)
    bp = disk(bound_pix)
    gt_dil = cv2.dilate(gt_boundary, bp, iterations=1)
    fg_dil = cv2.dilate(fg_boundary, bp, iterations=1)
    return (
        int(np.logical_and(fg_boundary, gt_dil).sum()),
        int(np.logical_and(gt_boundary, fg_dil).sum()),
    )


def _edge_case(num_pred: int, num_gt: int, value_p: float, value_r: float, all_correct: bool):
    f = 1.0 if all_correct else 0.0
    pct = 1.0 if all_correct else 0.0
    out = {
        "Objects F-measure": f,
        "Objects Precision": value_p,
        "Objects Recall": value_r,
        "Boundary F-measure": f,
        "Boundary Precision": value_p,
        "Boundary Recall": value_r,
        "Objects OSN F-measure": f,
        "Objects OSN Precision": value_p,
        "Objects OSN Recall": value_r,
        "Boundary OSN F-measure": f,
        "Boundary OSN Precision": value_p,
        "Boundary OSN Recall": value_r,
        "obj_detected": num_pred,
        "obj_detected_075": 0.0,
        "obj_gt": num_gt,
        "obj_detected_075_percentage": pct,
        "obj_detected_075_percentage_normalized": pct,
    }
    return out


def multilabel_metrics(
    prediction: np.ndarray,
    gt: np.ndarray,
    obj_detect_threshold: float = 0.75,
    compute_boundary_stuff: bool = True,
) -> dict:
    """Metrics between two [H, W] label images (0 = background).

    Mirrors evaluation.py:57-274 including its edge cases. Pixel overlap
    statistics are computed with a single one-hot intersection matmul.
    """
    labels_gt = np.unique(gt)
    labels_gt = labels_gt[labels_gt != BACKGROUND_LABEL]
    labels_pred = np.unique(prediction)
    labels_pred = labels_pred[labels_pred != BACKGROUND_LABEL]
    g, p = len(labels_gt), len(labels_pred)

    if p == 0 and g > 0:
        return _edge_case(p, g, 1.0, 0.0, False)  # all false negatives
    if p > 0 and g == 0:
        return _edge_case(p, g, 0.0, 1.0, False)  # all false positives
    if p == 0 and g == 0:
        return _edge_case(p, g, 1.0, 1.0, True)  # correctly predicted nothing

    # one-hot intersection counts [G, P] in one pass
    gt_flat = gt.reshape(-1)
    pred_flat = prediction.reshape(-1)
    gt_idx = np.searchsorted(labels_gt, gt_flat)
    pred_idx = np.searchsorted(labels_pred, pred_flat)
    gt_valid = np.isin(gt_flat, labels_gt)
    pred_valid = np.isin(pred_flat, labels_pred)
    both = gt_valid & pred_valid
    inter = np.zeros((g, p), np.int64)
    np.add.at(inter, (gt_idx[both], pred_idx[both]), 1)
    gt_areas = np.bincount(gt_idx[gt_valid], minlength=g).astype(np.int64)
    pred_areas = np.bincount(pred_idx[pred_valid], minlength=p).astype(np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        obj_P = inter / pred_areas[None, :]
        obj_R = inter / gt_areas[:, None]
        obj_F = 2 * obj_P * obj_R / (obj_P + obj_R)
        union = gt_areas[:, None] + pred_areas[None, :] - inter
        obj_iou = inter / union
    obj_F = np.nan_to_num(obj_F)

    if compute_boundary_stuff:
        pred_masks = [(prediction == l) for l in labels_pred]
        gt_masks = [(gt == l) for l in labels_gt]
        bound_counts_pred = np.array([seg2bmap(m).sum() for m in pred_masks], np.float64)
        bound_counts_gt = np.array([seg2bmap(m).sum() for m in gt_masks], np.float64)
        bound_tps = np.zeros((g, p, 2))
        for i in range(g):
            for j in range(p):
                bound_tps[i, j] = boundary_overlap(pred_masks[j], gt_masks[i])
        with np.errstate(divide="ignore", invalid="ignore"):
            bound_P = bound_tps[..., 0] / bound_counts_pred[None, :]
            bound_R = bound_tps[..., 1] / bound_counts_gt[:, None]
            bound_F = 2 * bound_P * bound_R / (bound_P + bound_R)
        bound_F = np.nan_to_num(bound_F)

    # Hungarian assignment maximizing pairwise F (evaluation.py:208-212)
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(obj_F.max() - obj_F)
    idx = (rows, cols)

    num_obj_detected = int(np.sum(obj_F[idx] > obj_detect_threshold))

    precision = inter[idx].sum() / np.maximum((pred_flat != BACKGROUND_LABEL).sum(), 1)
    recall = inter[idx].sum() / np.maximum((gt_flat != BACKGROUND_LABEL).sum(), 1)
    F_measure = (
        0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    )

    obj_F_osn = obj_F[idx].sum() / max(p, g)
    obj_P_osn = np.nan_to_num(obj_P)[idx].sum() / p
    obj_R_osn = np.nan_to_num(obj_R)[idx].sum() / g
    obj_iou_osn = float(np.mean(np.nan_to_num(obj_iou)[idx]))
    i_over_u = float(inter[idx].sum() / np.maximum(union[idx].sum(), 1))

    result = {
        "Objects F-measure": float(F_measure),
        "Objects Precision": float(precision),
        "Objects Recall": float(recall),
        "Objects OSN F-measure": float(obj_F_osn),
        "Objects OSN Precision": float(obj_P_osn),
        "Objects OSN Recall": float(obj_R_osn),
        "obj_detected": p,
        "obj_detected_075": num_obj_detected,
        "obj_gt": g,
        "obj_detected_075_percentage": num_obj_detected / g,
        "obj_detected_075_percentage_normalized": num_obj_detected / max(g, p),
        "obj_mIOU_osn": obj_iou_osn,
        "obj_mIOU": i_over_u,
    }

    if compute_boundary_stuff:
        b_prec = bound_tps[idx][:, 0].sum() / np.maximum(bound_counts_pred.sum(), 1)
        b_rec = bound_tps[idx][:, 1].sum() / np.maximum(bound_counts_gt.sum(), 1)
        b_f = 0.0 if b_prec + b_rec == 0 else 2 * b_prec * b_rec / (b_prec + b_rec)
        result.update({
            "Boundary F-measure": float(b_f),
            "Boundary Precision": float(b_prec),
            "Boundary Recall": float(b_rec),
            "Boundary OSN F-measure": float(bound_F[idx].sum() / max(p, g)),
            "Boundary OSN Precision": float(np.nan_to_num(bound_P)[idx].sum() / p),
            "Boundary OSN Recall": float(np.nan_to_num(bound_R)[idx].sum() / g),
        })
    else:
        for k in ["Boundary F-measure", "Boundary Precision", "Boundary Recall",
                  "Boundary OSN F-measure", "Boundary OSN Precision", "Boundary OSN Recall"]:
            result[k] = None
    return result
