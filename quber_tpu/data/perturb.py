"""Mask perturbation: controlled error injection for refiner training data.

Offline host-side tooling (numpy/cv2) re-creating the corruption taxonomy of
/root/reference/tools/ours/perturbate_masks.py:24-246 and
perturbation_utils.py:39-149: false-positive additions, over-/under-
segmentation, merges, splits, deletions, and boundary jitter toward a target
IoU in [0.8, 1.0]. This *is* the framework's domain-level fault injection
(SURVEY §5): the refiner learns to undo exactly these corruptions.

Two proposal sources for the spurious/segment-aligned corruptions:
  * `perturb_masks_reference(gt_masks, rgb, ...)` — the reference's exact
    flow, seeding FP and over-/under-segmentation from Felzenszwalb
    graph-segmentation proposals of the RGB image
    (quber_tpu.data.felzenszwalb, dependency-free re-implementation) with
    the reference's per-image ratio sampling.
  * `perturb_masks(masks, ...)` — image-free variant (deformed-ellipse FP
    proposals) for callers without pixels (on-the-fly GT perturbation in
    the synthetic mapper / PerturbedGT base model); passes through to the
    reference flow when `rgb` is supplied.
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


# reference per-image ratio ranges (perturbate_masks.py:24-30)
REFERENCE_RATIO_RANGES = {
    "fp": (0.0, 0.2),
    "gs": (0.0, 0.3),
    "merge": (0.0, 0.1),
    "delete": (0.0, 0.1),
    "split": (0.0, 0.1),
}
MIN_MASK_RATIO = 0.01


def _split_by_random_line(mask, rng, min_area, tries=10):
    """Axis-aligned random split (perturbate_masks.py:164-196)."""
    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return None
    y_min, y_max = ys.min(), ys.max()
    x_min, x_max = xs.min(), xs.max()
    for _ in range(tries):
        m1 = mask.copy()
        if rng.rand() < 0.5:
            y1 = rng.randint(y_min, max(y_min + 1, y_max))
            if rng.rand() < 0.5:
                m1[y1:y_max + 1, :] = 0
            else:
                m1[y_min:y1, :] = 0
        else:
            x1 = rng.randint(x_min, max(x_min + 1, x_max))
            if rng.rand() < 0.5:
                m1[:, x1:x_max + 1] = 0
            else:
                m1[:, x_min:x1] = 0
        m2 = np.where(m1 != 0, 0, mask)
        if m1.sum() >= min_area and m2.sum() >= min_area:
            return m1, m2
    return None


def perturb_masks_reference(
    gt_masks: np.ndarray,
    rgb: np.ndarray,
    rng=None,
    iou_target=(0.8, 1.0),
    proposals: np.ndarray | None = None,
) -> np.ndarray:
    """The reference's exact perturbation flow (perturbate_masks.py:67-233).

    gt_masks [N, H, W] {0,1}; rgb [H, W, 3] uint8 (proposal source; ignored
    when `proposals` is given). Returns a perturbed uint8 stack.
    """
    import cv2

    rng = rng or np.random.RandomState(0)
    gt_masks = np.asarray(gt_masks, np.uint8)
    if gt_masks.size == 0:
        return gt_masks.reshape((0,) + rgb.shape[:2])
    h, w = gt_masks.shape[1:]
    min_area = h * w * MIN_MASK_RATIO

    r = {k: rng.uniform(*v) for k, v in REFERENCE_RATIO_RANGES.items()}

    if proposals is None:
        from quber_tpu.data.felzenszwalb import felzenszwalb_proposals

        proposals = felzenszwalb_proposals(rgb, scale=4, sigma=0.2, k=50,
                                           min_size=50)

    out = []
    max_gt_area = max(int(m.sum()) for m in gt_masks)
    # FP add: proposals disjoint from GT (perturbate_masks.py:103-118)
    for gs in proposals:
        if rng.rand() > r["fp"]:
            continue
        area = gs.sum()
        if area < min_area or area > max_gt_area * 2.0:
            continue
        if max((mask_iou(g, gs) for g in gt_masks), default=0.0) < 0.3:
            out.append(gs.astype(np.uint8))
    # over-/under-segmentation: proposals overlapping GT (:121-133)
    for gs in proposals:
        if rng.rand() > r["gs"]:
            continue
        if gs.sum() < min_area:
            continue
        if max((mask_iou(g, gs) for g in gt_masks), default=0.0) > 0.3:
            out.append(gs.astype(np.uint8))
    # keep GT masks not yet represented (:136-144)
    for g in gt_masks:
        if max((mask_iou(g, p) for p in out), default=0.0) < 0.3:
            out.append(g.copy())

    # merge close pairs (dilation-10 adjacency, :147-161)
    for i in range(len(out)):
        if rng.rand() > r["merge"]:
            continue
        m1 = out[i]
        if m1.sum() == 0:
            continue
        dil = cv2.dilate(m1, np.ones((10, 10), np.uint8))
        for j in range(len(out)):
            if i == j or out[j].sum() == 0:
                continue
            if int((dil & (out[j] > 0)).sum()) > 0:
                out[i] = ((m1 > 0) | (out[j] > 0)).astype(np.uint8)
                out[j] = np.zeros_like(out[j])
    out = [m for m in out if m.sum() > 0]

    # split by a random axis-aligned line (:164-196)
    for i in range(len(out)):
        if rng.rand() > r["split"]:
            continue
        pieces = _split_by_random_line(out[i], rng, min_area)
        if pieces is not None:
            out[i] = pieces[0]
            out.append(pieces[1])

    # delete (:200-205)
    out = [m for m in out if rng.rand() > r["delete"]]

    # boundary jitter to the IoU target (:208-210)
    out = [modify_boundary(m, rng, iou_target) for m in out]
    out = [m for m in out if m.sum() > 0]
    return (np.asarray(out, np.uint8) if out
            else np.zeros((0, h, w), np.uint8))


def perturb_masks(
    masks: np.ndarray,
    rng=None,
    target_iou=(0.8, 1.0),
    ratios: dict | None = None,
    rgb: np.ndarray | None = None,
) -> np.ndarray:
    """Apply the full corruption pipeline to a GT mask stack [N, H, W].

    Operation order mirrors perturbate_masks.py:89-246: FP add ->
    over-/under-segmentation -> delete -> per-mask boundary jitter to the
    IoU target. Returns a (possibly different-length) uint8 stack.
    """
    rng = rng or np.random.RandomState(0)
    if rgb is not None:
        return perturb_masks_reference(np.asarray(masks), rgb, rng,
                                       iou_target=target_iou)
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
