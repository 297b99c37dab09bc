"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from quber_tpu.ops import encoding as E
from quber_tpu.ops import grouping as G
from quber_tpu.ops.pallas_kernels import group_pixels_pallas


def test_group_pixels_pallas_matches_xla(rng, blobs):
    h, w = 120, 160
    masks = blobs(rng, 5, h, w)
    enc = np.asarray(E.encode_initial_masks(jnp.asarray(masks), normalize=False))
    heat, offsets = enc[0], enc[1:]
    centers, valid = G.find_instance_centers(jnp.asarray(heat), 0.3, 7, 200)
    want = np.asarray(G.group_pixels(centers, valid, jnp.asarray(offsets)))
    got = np.asarray(
        group_pixels_pallas(centers, valid, jnp.asarray(offsets), interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_group_pixels_pallas_odd_size(rng):
    # non-TILE-multiple pixel count exercises the padding path
    h, w = 33, 41
    offsets = rng.randn(2, h, w).astype(np.float32)
    k = 200
    centers = np.zeros((k, 2), np.int32)
    centers[:3] = [[5, 7], [20, 30], [30, 10]]
    valid = np.zeros((k,), bool)
    valid[:3] = True
    want = np.asarray(G.group_pixels(jnp.asarray(centers), jnp.asarray(valid), jnp.asarray(offsets)))
    got = np.asarray(group_pixels_pallas(jnp.asarray(centers), jnp.asarray(valid),
                                         jnp.asarray(offsets), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_group_pixels_pallas_batched_matches_single(rng, blobs):
    from quber_tpu.ops.pallas_kernels import group_pixels_pallas_batched

    h, w, b = 64, 128, 3
    all_centers, all_valid, all_offsets, singles = [], [], [], []
    for i in range(b):
        masks = blobs(rng, 3, h, w, min_r=8, max_r=16)
        enc = np.asarray(E.encode_initial_masks(jnp.asarray(masks), normalize=False))
        centers, valid = G.find_instance_centers(jnp.asarray(enc[0]), 0.3, 7, 200)
        all_centers.append(np.asarray(centers))
        all_valid.append(np.asarray(valid))
        all_offsets.append(enc[1:])
        singles.append(np.asarray(G.group_pixels(centers, valid, jnp.asarray(enc[1:]))))
    got = np.asarray(group_pixels_pallas_batched(
        jnp.asarray(np.stack(all_centers)), jnp.asarray(np.stack(all_valid)),
        jnp.asarray(np.stack(all_offsets)), interpret=True,
    ))
    for i in range(b):
        np.testing.assert_array_equal(got[i], singles[i])


def test_encode_pallas_matches_xla(rng, blobs):
    from quber_tpu.ops.encoding import instance_stats
    from quber_tpu.ops.pallas_kernels import encode_initial_masks_pallas

    h, w, n = 64, 128, 6
    masks = np.zeros((n, h, w), bool)
    masks[:4] = blobs(rng, 4, h, w, min_r=8, max_r=16) > 0
    # overlapping pair exercises the last-wins owner chain
    masks[1] |= masks[0]
    valid = np.array([True, True, True, True, False, False])

    for normalize in (True, False):
        ref = np.asarray(E.encode_initial_masks(
            jnp.asarray(masks), jnp.asarray(valid), sigma=10, normalize=normalize
        ))
        areas, centers = instance_stats(jnp.asarray(masks), jnp.asarray(valid))
        ok = jnp.asarray(valid) & (areas > 0)
        got = np.asarray(encode_initial_masks_pallas(
            jnp.asarray(masks), ok, centers, sigma=10, normalize=normalize,
            interpret=True,
        ))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_encode_pallas_empty(rng):
    from quber_tpu.ops.encoding import instance_stats
    from quber_tpu.ops.pallas_kernels import encode_initial_masks_pallas

    h, w, n = 64, 128, 4
    masks = jnp.zeros((n, h, w), bool)
    valid = jnp.zeros((n,), bool)
    areas, centers = instance_stats(masks, valid)
    got = np.asarray(encode_initial_masks_pallas(
        masks, valid & (areas > 0), centers, interpret=True
    ))
    assert got.shape == (3, h, w)
    np.testing.assert_array_equal(got, 0.0)


def test_encode_pallas_batched_matches_single(rng, blobs):
    from quber_tpu.ops.encoding import instance_stats
    from quber_tpu.ops.pallas_kernels import (
        encode_initial_masks_pallas, encode_initial_masks_pallas_batched,
    )

    h, w, n, b = 64, 128, 4, 3
    all_m, all_ok, all_c, singles = [], [], [], []
    for i in range(b):
        masks = blobs(rng, n - 1, h, w, min_r=8, max_r=16) > 0
        masks = np.concatenate([masks, np.zeros((1, h, w), bool)])
        valid = np.array([True] * (n - 1) + [False])
        areas, centers = instance_stats(jnp.asarray(masks), jnp.asarray(valid))
        ok = jnp.asarray(valid) & (areas > 0)
        all_m.append(masks)
        all_ok.append(np.asarray(ok))
        all_c.append(np.asarray(centers))
        singles.append(np.asarray(encode_initial_masks_pallas(
            jnp.asarray(masks), ok, centers, interpret=True
        )))
    got = np.asarray(encode_initial_masks_pallas_batched(
        jnp.asarray(np.stack(all_m)), jnp.asarray(np.stack(all_ok)),
        jnp.asarray(np.stack(all_c)), interpret=True,
    ))
    for i in range(b):
        np.testing.assert_allclose(got[i], singles[i], rtol=1e-6)
