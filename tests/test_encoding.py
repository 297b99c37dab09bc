"""Golden tests: center/offset encodings vs a fresh numpy implementation of
the reference semantics (windowed Gaussian paint + last-wins offsets)."""

import numpy as np
import jax.numpy as jnp

from quber_tpu.ops import encoding as E


def numpy_encode(masks, h, w, sigma=10, normalize=True):
    """Straightforward numpy re-derivation of the paint loop (test oracle)."""
    size = 6 * sigma + 3
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    x0 = y0 = 3 * sigma + 1
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))

    center = np.zeros((h, w), np.float32)
    offset = np.zeros((2, h, w), np.float32)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    for mask in masks:
        idx = np.where(mask != 0)
        if len(idx[0]) == 0:
            continue
        cy, cx = np.mean(idx[0]), np.mean(idx[1])
        ry, rx = int(round(cy)), int(round(cx))
        ul = int(np.round(rx - 3 * sigma - 1)), int(np.round(ry - 3 * sigma - 1))
        br = int(np.round(rx + 3 * sigma + 2)), int(np.round(ry + 3 * sigma + 2))
        gx0, gx1 = max(0, -ul[0]), min(br[0], w) - ul[0]
        gy0, gy1 = max(0, -ul[1]), min(br[1], h) - ul[1]
        cx0, cx1 = max(0, ul[0]), min(br[0], w)
        cy0, cy1 = max(0, ul[1]), min(br[1], h)
        center[cy0:cy1, cx0:cx1] = np.maximum(center[cy0:cy1, cx0:cx1], g[gy0:gy1, gx0:gx1])
        sy = h if normalize else 1.0
        sx = w if normalize else 1.0
        offset[0][idx] = (cy - yy[idx]) / sy
        offset[1][idx] = (cx - xx[idx]) / sx
    return np.stack([center, offset[0], offset[1]], axis=0)


def test_encode_matches_numpy(rng, blobs):
    h, w = 120, 160
    masks = blobs(rng, 5, h, w)
    want = numpy_encode(masks, h, w, sigma=10)
    got = np.asarray(E.encode_initial_masks(jnp.asarray(masks), sigma=10))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encode_overlapping_last_wins(rng):
    h, w = 64, 64
    m1 = np.zeros((h, w), np.uint8)
    m1[10:40, 10:40] = 1
    m2 = np.zeros((h, w), np.uint8)
    m2[25:55, 25:55] = 1  # overlaps m1; painted second -> wins in overlap
    masks = np.stack([m1, m2])
    want = numpy_encode(masks, h, w)
    got = np.asarray(E.encode_initial_masks(jnp.asarray(masks)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encode_empty_and_padding(rng, blobs):
    h, w = 96, 128
    real = blobs(rng, 2, h, w)
    padded = np.zeros((6, h, w), np.uint8)
    padded[:2] = real
    want = numpy_encode(real, h, w)
    got = np.asarray(E.encode_initial_masks(jnp.asarray(padded)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # all-empty input -> zero encoding
    zero = np.asarray(E.encode_initial_masks(jnp.zeros((4, h, w), bool)))
    assert np.all(zero == 0)


def test_encode_center_near_border(rng):
    # instance hugging the image corner: the Gaussian window must clip
    h, w = 80, 80
    m = np.zeros((h, w), np.uint8)
    m[0:6, 0:6] = 1
    want = numpy_encode(m[None], h, w)
    got = np.asarray(E.encode_initial_masks(jnp.asarray(m[None])))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_train_targets(rng, blobs):
    h, w = 120, 160
    masks = blobs(rng, 3, h, w)
    out = E.panoptic_train_targets(jnp.asarray(masks), sigma=10)
    enc = numpy_encode(masks, h, w, normalize=False)
    np.testing.assert_allclose(np.asarray(out["center"]), enc[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["offset"][0]), enc[1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["offset"][1]), enc[2], atol=1e-4)
    fg = (masks.sum(0) > 0).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out["sem_seg"]), fg)
    np.testing.assert_array_equal(np.asarray(out["center_weights"][0]), fg)
    # small-instance weighting: blobs of < 4096 px get weight 3
    areas = masks.reshape(3, -1).sum(1)
    sem_w = np.asarray(out["sem_seg_weights"])
    for m, a in zip(masks, areas):
        expected = 3.0 if a < 4096 else 1.0
        region = m.astype(bool)
        # overlap with other blobs can raise the weight, so only check the
        # exclusive region of each mask
        exclusive = region & ~((masks.sum(0) - m) > 0)
        if exclusive.any():
            assert np.all(sem_w[exclusive] == expected)
