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


def test_inverse_frequency_weights_torch_oracle(rng):
    """inverse_frequency_weights == the reference's per-image unique-label
    loop (losses.py:18-51, weighted=True), re-derived with torch."""
    import torch

    from quber_tpu.models.uois_net import inverse_frequency_weights

    labels = rng.randint(0, 4, size=(2, 12, 12))
    t = torch.tensor(labels)
    want = torch.zeros(t.shape, dtype=torch.float32)
    for i in range(2):
        for obj in torch.unique(t[i]):
            n = torch.sum(t[i] == obj).float()
            want[i][t[i] == obj] = 1.0 / n
    got = inverse_frequency_weights(jnp.asarray(labels), 4)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-6)
    # ignore classes zero out, exactly like to_ignore
    got_ig = inverse_frequency_weights(jnp.asarray(labels), 4, ignore=(0, 1))
    want[torch.tensor(labels) == 0] = 0
    want[torch.tensor(labels) == 1] = 0
    np.testing.assert_allclose(np.asarray(got_ig), want.numpy(), rtol=1e-6)


def test_rrn_loss_torch_oracle(rng):
    """rrn_loss == BCEWithLogitsLossWeighted(weighted=True)
    (losses.py:118-135)."""
    import torch

    from quber_tpu.models.uois_net import rrn_loss

    logits = rng.randn(2, 10, 10).astype(np.float32)
    target = (rng.rand(2, 10, 10) > 0.6).astype(np.float32)
    tl, tt = torch.tensor(logits), torch.tensor(target)
    bce = torch.nn.BCEWithLogitsLoss(reduction="none")(tl, tt)
    w = torch.zeros_like(tt)
    for i in range(2):
        for obj in torch.unique(tt[i]):
            n = torch.sum(tt[i] == obj).float()
            w[i][tt[i] == obj] = 1.0 / n
    want = (bce * w).sum() / w.sum()
    got = rrn_loss(jnp.asarray(logits), jnp.asarray(target))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_dsn_separation_loss_prefers_own_center():
    """Votes sitting exactly on their own GT center score lower than votes
    sitting on the OTHER object's center (train.py:220-230 semantics)."""
    from quber_tpu.models.uois_net import dsn_separation_loss

    h, w = 16, 16
    labels = np.zeros((h, w), np.int32)
    labels[:, :8] = 2  # object 0
    labels[:, 8:] = 3  # object 1
    centers = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32)
    valid = jnp.asarray([True, True])
    good = np.zeros((h, w, 3), np.float32)
    good[:, :8] = [0.0, 0.0, 1.0]
    good[:, 8:] = [1.0, 1.0, 1.0]
    swapped = good[:, ::-1].copy()
    l_good = float(dsn_separation_loss(jnp.asarray(good), centers, valid,
                                       jnp.asarray(labels)))
    l_bad = float(dsn_separation_loss(jnp.asarray(swapped), centers, valid,
                                      jnp.asarray(labels)))
    assert l_good < 1e-3
    assert l_bad > l_good + 1.0


def test_dsn_cluster_loss_separated_beats_merged(rng):
    """Well-separated per-object vote clusters incur less cluster loss than
    everything collapsed to one point (pull/push semantics,
    losses.py:161-188)."""
    from quber_tpu.models.uois_net import dsn_cluster_loss

    h, w = 16, 16
    labels = np.zeros((h, w), np.int32)
    labels[:, :8] = 2
    labels[:, 8:] = 3
    tight = np.zeros((h, w, 3), np.float32)
    tight[:, :8] = [0.0, 0.0, 0.5]
    tight[:, 8:] = [0.5, 0.5, 0.5]
    merged = np.full((h, w, 3), 0.25, np.float32)
    key = jax.random.PRNGKey(0)
    l_tight = float(dsn_cluster_loss(jnp.asarray(tight), jnp.asarray(labels),
                                     key, num_classes=4))
    l_merged = float(dsn_cluster_loss(jnp.asarray(merged), jnp.asarray(labels),
                                      key, num_classes=4))
    assert l_tight < l_merged
    # no foreground -> exactly zero
    l_zero = float(dsn_cluster_loss(jnp.asarray(tight),
                                    jnp.zeros((h, w), jnp.int32), key,
                                    num_classes=4))
    assert l_zero == 0.0


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
