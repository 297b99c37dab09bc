"""Golden tests: quber_tpu.ops.morphology vs cv2-based reference semantics.

The expected values are computed here with cv2/numpy following the reference
recipe (pad 1 zero ring -> cv2.erode 3x3 x N -> crop; logical-AND error
tables), independently of the reference source.
"""

import cv2
import numpy as np
import jax.numpy as jnp

from quber_tpu.ops import morphology as M


def cv2_mask_to_boundary(mask, dilation_ratio):
    h, w = mask.shape
    diag = np.sqrt(h**2 + w**2)
    n = max(1, int(round(dilation_ratio * diag)))
    padded = cv2.copyMakeBorder(mask, 1, 1, 1, 1, cv2.BORDER_CONSTANT, value=0)
    eroded = cv2.erode(padded, np.ones((3, 3), np.uint8), iterations=n)
    return mask - eroded[1 : h + 1, 1 : w + 1]


def test_erode_matches_cv2(rng):
    mask = (rng.rand(64, 80) > 0.6).astype(np.uint8)
    for n in [1, 2, 5]:
        padded = cv2.copyMakeBorder(mask, 1, 1, 1, 1, cv2.BORDER_CONSTANT, value=0)
        want = cv2.erode(padded, np.ones((3, 3), np.uint8), iterations=n)[1:-1, 1:-1]
        got = np.asarray(M.erode(jnp.asarray(mask), n))
        np.testing.assert_array_equal(got, want, err_msg=f"iterations={n}")


def test_dilate_matches_cv2(rng):
    mask = (rng.rand(48, 64) > 0.9).astype(np.uint8)
    for n in [1, 3]:
        want = cv2.dilate(mask, np.ones((3, 3), np.uint8), iterations=n)
        got = np.asarray(M.dilate(jnp.asarray(mask), n))
        np.testing.assert_array_equal(got, want)


def test_mask_to_boundary_matches_cv2(rng, blobs):
    masks = blobs(rng, 3, 120, 160)
    for mask in masks:
        for ratio in [0.01, 0.02]:
            want = cv2_mask_to_boundary(mask, ratio)
            got = np.asarray(M.mask_to_boundary(jnp.asarray(mask), ratio))
            np.testing.assert_array_equal(got, want)


def test_boundary_batched_equals_loop(rng, blobs):
    masks = blobs(rng, 4, 96, 128)
    batched = np.asarray(M.mask_to_boundary(jnp.asarray(masks), 0.02))
    for i, mask in enumerate(masks):
        single = np.asarray(M.mask_to_boundary(jnp.asarray(mask), 0.02))
        np.testing.assert_array_equal(batched[i], single)


def test_quadruple_error_maps(rng, blobs):
    h, w = 120, 160
    gt = blobs(rng, 4, h, w)
    pred = blobs(rng, 3, h, w)
    # pad stacks to a common MAX_INSTANCES with explicit validity
    maxn = 6
    gt_p = np.zeros((maxn, h, w), np.uint8)
    gt_p[:4] = gt
    pr_p = np.zeros((maxn, h, w), np.uint8)
    pr_p[:3] = pred
    out = M.quadruple_error_maps(
        jnp.asarray(gt_p),
        jnp.asarray(pr_p),
        gt_valid=jnp.asarray([1, 1, 1, 1, 0, 0], bool),
        pred_valid=jnp.asarray([1, 1, 1, 0, 0, 0], bool),
    )

    gt_fg = (gt.sum(0) > 0).astype(np.uint8)
    pr_fg = (pred.sum(0) > 0).astype(np.uint8)
    gt_bnd = (sum(cv2_mask_to_boundary(m, 0.01) for m in gt) > 0).astype(np.uint8)
    pr_bnd = (sum(cv2_mask_to_boundary(m, 0.01) for m in pred) > 0).astype(np.uint8)

    np.testing.assert_array_equal(np.asarray(out["gt_fg"]), gt_fg)
    np.testing.assert_array_equal(np.asarray(out["pred_fg"]), pr_fg)
    np.testing.assert_array_equal(np.asarray(out["gt_boundary"]), gt_bnd)
    np.testing.assert_array_equal(np.asarray(out["pred_boundary"]), pr_bnd)

    em = np.asarray(out["mask"]).astype(bool)
    np.testing.assert_array_equal(em[0], (gt_fg & pr_fg).astype(bool))  # TP
    np.testing.assert_array_equal(em[1], (~gt_fg.astype(bool)) & (~pr_fg.astype(bool)))  # TN
    np.testing.assert_array_equal(em[2], (~gt_fg.astype(bool)) & pr_fg.astype(bool))  # FP
    np.testing.assert_array_equal(em[3], gt_fg.astype(bool) & (~pr_fg.astype(bool)))  # FN

    eb = np.asarray(out["boundary"]).astype(bool)
    np.testing.assert_array_equal(eb[0], (gt_bnd & pr_bnd).astype(bool))
    np.testing.assert_array_equal(eb[3], gt_bnd.astype(bool) & (~pr_bnd.astype(bool)))

    # partition-of-unity sanity: the four maps tile the image exactly
    assert np.all(em.sum(0) == 1)
    assert np.all(eb.sum(0) == 1)


def test_seg2bmap_simple_square():
    mask = np.zeros((16, 16), np.uint8)
    mask[4:10, 5:12] = 1
    got = np.asarray(M.seg2bmap(jnp.asarray(mask)))
    # cv2 external-contour boundary for a solid rectangle = its 1px rim
    want = np.zeros_like(mask)
    cont, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    cv2.drawContours(want, cont, -1, 1, 1)
    np.testing.assert_array_equal(got, want)


def test_boundary_touching_image_border():
    # a mask touching the image border must still produce a boundary there
    mask = np.ones((32, 32), np.uint8)
    got = np.asarray(M.mask_to_boundary(jnp.asarray(mask), 0.02))
    want = cv2_mask_to_boundary(mask, 0.02)
    np.testing.assert_array_equal(got, want)
    assert got[0, 0] == 1
