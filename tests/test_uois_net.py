"""UOIS-Net-3D component tests (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from quber_tpu.models.uois_net import (
    DepthSeedingNetwork,
    RegionRefinementNetwork,
    dsn_losses,
)
from quber_tpu.ops.meanshift import cluster_points_euclidean


def test_dsn_shapes(rng):
    m = DepthSeedingNetwork()
    xyz = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), xyz)
    fg, off = m.apply(v, xyz)
    assert fg.shape == (1, 32, 32, 2)
    assert off.shape == (1, 32, 32, 3)


def test_rrn_shapes(rng):
    m = RegionRefinementNetwork()
    x = jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 32, 32, 1)


def test_cluster_points_euclidean(rng):
    # two separated 3D blobs of votes within a fg mask
    h, w = 48, 48
    votes = np.zeros((h, w, 3), np.float32)
    votes[:, :24] = [0.3, 0.0, 0.8]
    votes[:, 24:] = [-0.2, 0.1, 1.2]
    votes += 0.01 * rng.randn(h, w, 3).astype(np.float32)
    fg = np.ones((h, w), np.float32)
    out = cluster_points_euclidean(jnp.asarray(votes), jnp.asarray(fg),
                                   num_seeds=16, min_pixels=64)
    assert int(out["num_instances"]) == 2
    labels = np.asarray(out["labels"])
    left = labels[:, :22]
    right = labels[:, 26:]
    assert len(np.unique(left)) == 1 and len(np.unique(right)) == 1
    assert np.unique(left)[0] != np.unique(right)[0]


def test_cluster_points_background_excluded(rng):
    h, w = 32, 32
    votes = np.tile(np.array([0.1, 0.2, 0.9], np.float32), (h, w, 1))
    fg = np.zeros((h, w), np.float32)
    fg[8:24, 8:24] = 1
    out = cluster_points_euclidean(jnp.asarray(votes), jnp.asarray(fg),
                                   num_seeds=8, min_pixels=32)
    labels = np.asarray(out["labels"])
    assert int(out["num_instances"]) == 1
    assert np.all(labels[fg == 0] == 0)
    assert np.all(labels[fg > 0] == 1)


def test_dsn_losses(rng):
    fg_logits = jnp.asarray(rng.randn(1, 16, 16, 2).astype(np.float32))
    offsets = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    fg_t = jnp.asarray((rng.rand(1, 16, 16) > 0.5).astype(np.float32))
    off_t = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    losses = dsn_losses(fg_logits, offsets, fg_t, off_t)
    assert all(np.isfinite(float(v)) for v in losses.values())
    # perfect offsets on fg -> zero offset loss
    losses0 = dsn_losses(fg_logits, off_t, fg_t, off_t)
    assert float(losses0["loss_offset"]) == 0.0
