"""Mask perturbation: controlled error injection for refiner training data.

Offline host-side tooling (numpy/cv2) re-creating the corruption taxonomy of
/root/reference/tools/ours/perturbate_masks.py:24-246 and
perturbation_utils.py:39-149: false-positive additions, over-/under-
segmentation, merges, splits, deletions, and boundary jitter toward a target
IoU in [0.8, 1.0]. This *is* the framework's domain-level fault injection
(SURVEY §5): the refiner learns to undo exactly these corruptions.

The reference seeds false positives from Felzenszwalb graph-segmentation
proposals; that package isn't available here, so proposals are synthesized as
randomly deformed ellipses — statistically similar spurious blobs without the
external dependency.
"""

from __future__ import annotations

import numpy as np

DEFAULT_RATIOS = {
    "fp": 0.15,        # add a spurious instance
    "over": 0.10,      # over-segment: split one GT instance in two
    "under": 0.10,     # under-segment: merge two adjacent instances
    "delete": 0.05,    # drop an instance entirely
    "boundary": 1.0,   # boundary jitter applied to every surviving mask
}


def random_blob(rng, h, w, area_scale=0.02):
    """Random deformed-ellipse blob mask (FP proposal stand-in)."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    cy, cx = rng.randint(h // 8, 7 * h // 8), rng.randint(w // 8, 7 * w // 8)
    a = max(8, int(np.sqrt(area_scale * h * w) * rng.uniform(0.5, 1.5)))
    b = max(8, int(a * rng.uniform(0.4, 1.0)))
    angle = rng.uniform(0, 180)
    cv2.ellipse(mask, (cx, cy), (a, b), angle, 0, 360, 1, -1)
    # deform with coarse noise thresholding
    noise = rng.rand(h // 16 + 1, w // 16 + 1)
    noise = cv2.resize(noise, (w, h), interpolation=cv2.INTER_CUBIC)
    return ((mask > 0) & (noise > 0.25)).astype(np.uint8)


def perturb_seg(mask: np.ndarray, rng, iterations=(1, 6)) -> np.ndarray:
    """Random local erode/dilate (perturbation_utils.py:39-71 flavor): pick a
    few random rectangular regions and erode or dilate the mask inside them."""
    import cv2

    out = mask.astype(np.uint8).copy()
    h, w = mask.shape
    for _ in range(rng.randint(1, 4)):
        it = rng.randint(*iterations)
        op = cv2.erode if rng.rand() < 0.5 else cv2.dilate
        y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
        y1, x1 = rng.randint(y0 + h // 4, h), rng.randint(x0 + w // 4, w)
        region = out[y0:y1, x0:x1]
        out[y0:y1, x0:x1] = op(region, np.ones((3, 3), np.uint8), iterations=it)
    return out


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a > 0, b > 0).sum()
    union = np.logical_or(a > 0, b > 0).sum()
    return float(inter) / max(union, 1)


def modify_boundary(mask: np.ndarray, rng, target_iou=(0.8, 1.0), max_tries=8) -> np.ndarray:
    """Jitter a mask's boundary until IoU vs the original lands in
    target_iou (perturbation_utils.py:73-149 objective)."""
    lo, hi = target_iou
    target = rng.uniform(lo, hi)
    best = mask.astype(np.uint8)
    for _ in range(max_tries):
        cand = perturb_seg(mask, rng)
        iou = mask_iou(cand, mask)
        if iou <= target and cand.sum() > 0:
            return cand
        if cand.sum() > 0:
            best = cand
    return best


def split_mask(mask: np.ndarray, rng):
    """Split a mask along a random line through its centroid."""
    ys, xs = np.nonzero(mask)
    if len(ys) < 32:
        return [mask]
    cy, cx = ys.mean(), xs.mean()
    theta = rng.uniform(0, np.pi)
    n = np.array([np.cos(theta), np.sin(theta)])
    h, w = mask.shape
    yy, xx = np.mgrid[:h, :w]
    side = ((yy - cy) * n[0] + (xx - cx) * n[1]) > 0
    a = (mask > 0) & side
    b = (mask > 0) & ~side
    out = [m.astype(np.uint8) for m in (a, b) if m.sum() >= 16]
    return out or [mask]


def merge_masks(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two masks closed with a dilation bridge."""
    import cv2

    u = ((a > 0) | (b > 0)).astype(np.uint8)
    closed = cv2.morphologyEx(u, cv2.MORPH_CLOSE, np.ones((15, 15), np.uint8))
    return closed


def perturb_masks(
    masks: np.ndarray,
    rng=None,
    target_iou=(0.8, 1.0),
    ratios: dict | None = None,
) -> np.ndarray:
    """Apply the full corruption pipeline to a GT mask stack [N, H, W].

    Operation order mirrors perturbate_masks.py:89-246: FP add ->
    over-/under-segmentation -> delete -> per-mask boundary jitter to the
    IoU target. Returns a (possibly different-length) uint8 stack.
    """
    rng = rng or np.random.RandomState(0)
    ratios = {**DEFAULT_RATIOS, **(ratios or {})}
    masks = [m.astype(np.uint8) for m in masks]
    if not masks:
        return np.zeros((0, 480, 640), np.uint8)
    h, w = masks[0].shape

    out = list(masks)
    if rng.rand() < ratios["fp"]:
        blob = random_blob(rng, h, w)
        if blob.sum() >= 64:
            out.append(blob)
    if len(out) >= 1 and rng.rand() < ratios["over"]:
        i = rng.randint(len(out))
        pieces = split_mask(out.pop(i), rng)
        out.extend(pieces)
    if len(out) >= 2 and rng.rand() < ratios["under"]:
        i, j = rng.choice(len(out), 2, replace=False)
        merged = merge_masks(out[i], out[j])
        out = [m for k, m in enumerate(out) if k not in (i, j)] + [merged]
    if len(out) >= 2 and rng.rand() < ratios["delete"]:
        out.pop(rng.randint(len(out)))

    if ratios["boundary"] > 0:
        out = [
            modify_boundary(m, rng, target_iou) if rng.rand() < ratios["boundary"] else m
            for m in out
        ]
    out = [m for m in out if m.sum() > 0]
    return np.asarray(out, np.uint8) if out else np.zeros((0, h, w), np.uint8)
