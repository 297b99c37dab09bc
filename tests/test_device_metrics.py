"""Device overlap metrics vs the host metric module."""

import numpy as np
import jax.numpy as jnp

from quber_tpu.evaluation import metrics as HM
from quber_tpu.evaluation import device_metrics as DM


def label_image(rng, blobs, n, h=120, w=160):
    masks = blobs(rng, n, h, w)
    img = np.zeros((h, w), np.int32)
    for i, m in enumerate(masks):
        img[m > 0] = i + 1
    return img


def test_intersection_matrix(rng, blobs):
    gt = label_image(rng, blobs, 3)
    pred = np.roll(gt, 5, axis=1)
    inter = np.asarray(DM.intersection_matrix(jnp.asarray(pred), jnp.asarray(gt)))
    for gi in range(4):
        for pj in range(4):
            want = np.logical_and(gt == gi, pred == pj).sum()
            assert inter[gi, pj] == want, (gi, pj)


def test_device_overlap_matches_host(rng, blobs):
    for trial in range(3):
        gt = label_image(rng, blobs, 4)
        pred = np.roll(gt, 3 * (trial + 1), axis=1)
        # drop one prediction to exercise unbalanced assignment
        pred[pred == 2] = 0
        pred_c = np.zeros_like(pred)
        # compact pred labels 1..P
        for i, l in enumerate(sorted(set(np.unique(pred)) - {0})):
            pred_c[pred == l] = i + 1
        inter = np.asarray(DM.intersection_matrix(jnp.asarray(pred_c), jnp.asarray(gt)))
        got = DM.overlap_metrics_from_matrix(inter)
        want = HM.multilabel_metrics(pred_c, gt, compute_boundary_stuff=False)
        for k, v in got.items():
            assert abs(v - want[k]) < 1e-9, (k, v, want[k])


def test_device_overlap_edge_cases():
    empty = np.zeros((32, 32), np.int32)
    one = empty.copy()
    one[4:20, 4:20] = 1
    inter = np.asarray(DM.intersection_matrix(jnp.asarray(empty), jnp.asarray(one)))
    m = DM.overlap_metrics_from_matrix(inter)
    assert m["Objects Precision"] == 1.0 and m["Objects Recall"] == 0.0
