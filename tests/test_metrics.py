"""Metric tests: vectorized implementation vs a naive per-pair oracle."""

import numpy as np
import cv2
import pytest
from scipy.optimize import linear_sum_assignment

from quber_tpu.evaluation import metrics as M


def naive_metrics(prediction, gt):
    """Slow per-pair oracle following the published protocol."""
    labels_gt = [l for l in np.unique(gt) if l != 0]
    labels_pred = [l for l in np.unique(prediction) if l != 0]
    g, p = len(labels_gt), len(labels_pred)
    if g == 0 or p == 0:
        return None  # edge cases checked separately
    obj_F = np.zeros((g, p))
    obj_tp = np.zeros((g, p))
    for i, gl in enumerate(labels_gt):
        gm = gt == gl
        for j, pl in enumerate(labels_pred):
            pm = prediction == pl
            tp = np.logical_and(gm, pm).sum()
            obj_tp[i, j] = tp
            prec = tp / pm.sum()
            rec = tp / gm.sum()
            obj_F[i, j] = 0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
    rows, cols = linear_sum_assignment(obj_F.max() - obj_F)
    idx = (rows, cols)
    precision = obj_tp[idx].sum() / (prediction > 0).sum()
    recall = obj_tp[idx].sum() / (gt > 0).sum()
    F = 0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    return {
        "Objects F-measure": F,
        "Objects Precision": precision,
        "Objects Recall": recall,
        "Objects OSN F-measure": obj_F[idx].sum() / max(g, p),
        "obj_detected_075": int((obj_F[idx] > 0.75).sum()),
    }


def label_image(rng, blobs, n, h=120, w=160):
    masks = blobs(rng, n, h, w)
    img = np.zeros((h, w), np.int32)
    for i, m in enumerate(masks):
        img[m > 0] = i + 1
    return img


def test_matches_naive_oracle(rng, blobs):
    gt = label_image(rng, blobs, 5)
    # prediction: perturbed copy (shifted) plus one spurious blob
    pred = np.roll(gt, 4, axis=1)
    spur = blobs(rng, 1, 120, 160)[0]
    pred[(spur > 0) & (pred == 0)] = 99
    got = M.multilabel_metrics(pred, gt, compute_boundary_stuff=False)
    want = naive_metrics(pred, gt)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_perfect_prediction(rng, blobs):
    gt = label_image(rng, blobs, 4)
    # relabel the prediction arbitrarily: metrics must be permutation-invariant
    perm = {0: 0, 1: 3, 2: 1, 3: 4, 4: 2}
    pred = np.vectorize(perm.get)(gt).astype(np.int32)
    m = M.multilabel_metrics(pred, gt)
    assert m["Objects F-measure"] == 1.0
    assert m["Objects Precision"] == 1.0
    assert m["Objects Recall"] == 1.0
    assert m["Boundary F-measure"] == 1.0
    assert m["obj_detected_075_percentage"] == 1.0
    assert m["obj_mIOU"] == 1.0


def test_edge_cases():
    empty = np.zeros((32, 32), np.int32)
    one = empty.copy()
    one[8:24, 8:24] = 1
    m = M.multilabel_metrics(empty, one)  # all false negatives
    assert m["Objects F-measure"] == 0.0 and m["Objects Precision"] == 1.0
    assert m["Objects Recall"] == 0.0
    m = M.multilabel_metrics(one, empty)  # all false positives
    assert m["Objects Precision"] == 0.0 and m["Objects Recall"] == 1.0
    m = M.multilabel_metrics(empty, empty)  # correctly nothing
    assert m["Objects F-measure"] == 1.0
    assert m["obj_detected_075_percentage"] == 1.0


def test_boundary_overlap_identical_masks():
    mask = np.zeros((64, 64), np.uint8)
    mask[10:40, 12:50] = 1
    p_tp, r_tp = M.boundary_overlap(mask, mask)
    n_boundary = M.seg2bmap(mask).sum()
    assert p_tp == r_tp == n_boundary


def test_boundary_prf_degrades_with_shift(rng, blobs):
    gt = label_image(rng, blobs, 3)
    scores = []
    for shift in [0, 2, 8]:
        pred = np.roll(gt, shift, axis=1)
        m = M.multilabel_metrics(pred, gt)
        scores.append(m["Boundary F-measure"])
    assert scores[0] == 1.0
    assert scores[0] >= scores[1] >= scores[2]
    assert scores[2] < 1.0


def test_seg2bmap_matches_cv2_external():
    # mask with a hole: external contour must ignore the hole rim
    mask = np.zeros((32, 32), np.uint8)
    mask[4:28, 4:28] = 1
    mask[12:20, 12:20] = 0
    bmap = M.seg2bmap(mask)
    # hole rim not marked
    assert bmap[11, 12] == 0 or bmap[11, 12] == 0  # inner ring above the hole
    inner = bmap[10:22, 10:22]
    assert inner.sum() == 0
    # outer rim marked
    assert bmap[4, 10] == 1 and bmap[27, 10] == 1
