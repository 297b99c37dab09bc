"""Mean-shift clustering + UCN tests."""

import numpy as np
import jax
import jax.numpy as jnp

from quber_tpu.ops import meanshift as MS


def make_clusters(rng, n_clusters=4, d=16, pts=200, spread=0.05):
    """Points on the unit sphere around well-separated directions."""
    dirs = rng.randn(n_clusters, d)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # ensure separation
    xs, labels = [], []
    for i, c in enumerate(dirs):
        p = c[None] + spread * rng.randn(pts, d)
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        xs.append(p)
        labels += [i] * pts
    return np.concatenate(xs).astype(np.float32), np.asarray(labels)


def test_farthest_point_seeds_cover_clusters(rng):
    x, labels = make_clusters(rng)
    idx = np.asarray(MS.farthest_point_seeds(jnp.asarray(x), 8))
    seed_labels = set(labels[idx])
    assert seed_labels == {0, 1, 2, 3}


def test_mean_shift_converges_to_modes(rng):
    x, labels = make_clusters(rng)
    idx = np.asarray(MS.farthest_point_seeds(jnp.asarray(x), 8))
    seeds = MS.mean_shift(jnp.asarray(x), jnp.asarray(x[idx]), num_iters=10)
    seeds = np.asarray(seeds)
    # every converged seed must sit close to one of the true cluster means
    for s in seeds:
        sims = [float(np.dot(s, x[labels == i].mean(0) / np.linalg.norm(x[labels == i].mean(0))))
                for i in range(4)]
        assert max(sims) > 0.99


def test_merge_seeds():
    seeds = jnp.asarray([[1, 0], [0.999, 0.04], [0, 1], [0.03, 0.999]], jnp.float32)
    seeds = MS.l2_normalize(seeds)
    labels, reps = MS.merge_seeds(seeds, merge_threshold=0.95)
    labels = np.asarray(labels)
    assert labels[0] == labels[1] and labels[2] == labels[3]
    assert labels[0] != labels[2]
    assert np.asarray(reps).sum() == 2


def test_cluster_embeddings_segments_image(rng):
    # synthetic embedding image: 3 regions with distinct directions + noise
    h, w, d = 64, 64, 8
    dirs = np.eye(d)[:4].astype(np.float32)
    emb = np.tile(dirs[3], (h, w, 1))
    emb[:32, :32] = dirs[0]
    emb[:32, 32:] = dirs[1]
    emb[40:, 10:50] = dirs[2]
    emb = emb + 0.05 * rng.randn(h, w, d).astype(np.float32)
    out = MS.cluster_embeddings(jnp.asarray(emb), num_seeds=16, min_pixels=64)
    labels = np.asarray(out["labels"])
    n = int(out["num_instances"])
    assert n == 4
    # each quadrant should be one uniform label
    for region in [labels[:30, :30], labels[:30, 34:], labels[42:, 12:48]]:
        ids, counts = np.unique(region, return_counts=True)
        assert counts.max() / counts.sum() > 0.95


def test_cluster_embeddings_fg_mask(rng):
    h, w, d = 32, 32, 8
    emb = np.tile(np.eye(d)[0].astype(np.float32), (h, w, 1))
    emb[:, 16:] = np.eye(d)[1]
    fg = np.zeros((h, w), np.float32)
    fg[:, 16:] = 1
    out = MS.cluster_embeddings(jnp.asarray(emb), jnp.asarray(fg),
                                num_seeds=8, min_pixels=32)
    labels = np.asarray(out["labels"])
    assert int(out["num_instances"]) == 1
    assert np.all(labels[:, :16] == 0)
    assert np.all(labels[:, 16:] == 1)


def test_ucn_prototype_loss(rng):
    from quber_tpu.models.ucn import prototype_metric_loss

    h, w, d = 16, 16, 8
    labels = np.zeros((1, h, w), np.int32)
    labels[0, :, 8:] = 1
    # perfectly separated embeddings -> near-zero loss
    emb = np.tile(np.eye(d)[0].astype(np.float32), (1, h, w, 1))
    emb[0, :, 8:] = np.eye(d)[1]
    loss, parts = prototype_metric_loss(jnp.asarray(emb), jnp.asarray(labels))
    assert float(loss) < 1e-3
    # collapsed embeddings -> high loss
    emb_bad = np.tile(np.eye(d)[0].astype(np.float32), (1, h, w, 1))
    loss_bad, _ = prototype_metric_loss(jnp.asarray(emb_bad), jnp.asarray(labels))
    assert float(loss_bad) > 0.4


def test_ucn_net_shapes(rng):
    from quber_tpu.models.ucn import UCNEmbeddingNet

    model = UCNEmbeddingNet(embed_dim=16)
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), rgb, xyz)
    emb = model.apply(params, rgb, xyz)
    assert emb.shape == (1, 64, 64, 16)
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_instance_boxes_from_labels():
    from quber_tpu.models.ucn import instance_boxes_from_labels

    labels = np.zeros((64, 64), np.int32)
    labels[10:30, 12:36] = 1
    labels[40:60, 40:60] = 2
    boxes, valid = instance_boxes_from_labels(jnp.asarray(labels), 4)
    boxes, valid = np.asarray(boxes), np.asarray(valid)
    assert valid.tolist() == [True, True, False, False]
    # expanded square boxes contain the instances
    assert boxes[0][0] <= 12 and boxes[0][1] <= 10
    assert boxes[0][2] >= 35 and boxes[0][3] >= 29
    assert boxes[1][0] <= 40 and boxes[1][2] >= 59
    # invalid slots are zeroed
    np.testing.assert_array_equal(boxes[2:], 0)
