"""Host-side quadruple error-map generation (offline tool core).

numpy/cv2 twin of quber_tpu.ops.morphology.quadruple_error_maps for the
offline data-generation path (reference: tools/ours/panoptic2eee.py:23-132);
the on-device op is the jit-able variant used inside pipelines.
"""

from __future__ import annotations

import numpy as np


def mask_to_boundary(mask: np.ndarray, dilation_ratio: float = 0.02) -> np.ndarray:
    import cv2

    h, w = mask.shape
    diag = np.sqrt(h**2 + w**2)
    n = max(1, int(round(dilation_ratio * diag)))
    padded = cv2.copyMakeBorder(mask.astype(np.uint8), 1, 1, 1, 1, cv2.BORDER_CONSTANT, value=0)
    eroded = cv2.erode(padded, np.ones((3, 3), np.uint8), iterations=n)
    return mask.astype(np.uint8) - eroded[1 : h + 1, 1 : w + 1]


def masks_to_fg(masks: np.ndarray) -> np.ndarray:
    if len(masks) == 0:
        return np.zeros((0, 0), np.uint8)
    return (np.sum(masks, axis=0) > 0).astype(np.uint8)


def masks_to_boundary(masks: np.ndarray, dilation_ratio: float = 0.01) -> np.ndarray:
    if len(masks) == 0:
        return np.zeros((0, 0), np.uint8)
    b = np.sum([mask_to_boundary(m, dilation_ratio) for m in masks], axis=0)
    return (b > 0).astype(np.uint8)


def compute_eee_maps(gt_masks: np.ndarray, pred_masks: np.ndarray) -> dict:
    """8 TP/TN/FP/FN maps for fg region + boundary band
    (panoptic2eee.py:110-123)."""
    h, w = (gt_masks.shape[1:] if len(gt_masks) else pred_masks.shape[1:])
    zero = np.zeros((h, w), np.uint8)
    gt_fg = masks_to_fg(gt_masks) if len(gt_masks) else zero
    pr_fg = masks_to_fg(pred_masks) if len(pred_masks) else zero
    gt_b = masks_to_boundary(gt_masks) if len(gt_masks) else zero
    pr_b = masks_to_boundary(pred_masks) if len(pred_masks) else zero

    def table(gt, pr):
        gt, pr = gt.astype(bool), pr.astype(bool)
        return {
            "tp": (gt & pr), "tn": (~gt & ~pr), "fp": (~gt & pr), "fn": (gt & ~pr),
        }

    m = table(gt_fg, pr_fg)
    b = table(gt_b, pr_b)
    return {
        "tp_mask": m["tp"].astype(np.float32), "tn_mask": m["tn"].astype(np.float32),
        "fp_mask": m["fp"].astype(np.float32), "fn_mask": m["fn"].astype(np.float32),
        "tp_boundary": b["tp"].astype(np.float32), "tn_boundary": b["tn"].astype(np.float32),
        "fp_boundary": b["fp"].astype(np.float32), "fn_boundary": b["fn"].astype(np.float32),
    }
