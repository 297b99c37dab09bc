"""MSMFormer smoke tests (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from quber_tpu.models.msmformer import MSMFormer, masks_from_queries


def test_msmformer_forward_shapes(rng):
    model = MSMFormer(dim=64, num_queries=8, encoder_layers=1, decoder_layers=1)
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), rgb, xyz)
    out = model.apply(v, rgb, xyz)
    assert out["mask_logits"].shape == (1, 8, 16, 16)  # stride 4
    assert out["objectness"].shape == (1, 8)
    assert np.isfinite(np.asarray(out["mask_logits"])).all()


def test_masks_from_queries():
    q, h, w = 4, 16, 16
    logits = np.full((q, h, w), -10.0, np.float32)
    logits[0, :8, :] = 10.0    # query 0 claims the top half
    logits[1, 8:, :] = 10.0    # query 1 claims the bottom half
    logits[2, :4, :4] = 12.0   # query 2 overlaps query 0 with higher prob
    objectness = np.asarray([5.0, 5.0, 5.0, -5.0], np.float32)  # query 3 rejected
    labels, n = masks_from_queries(
        jnp.asarray(logits), jnp.asarray(objectness), min_pixels=8
    )
    labels = np.asarray(labels)
    assert int(n) == 3
    # overlap resolves to the higher-probability query
    assert labels[0, 0] == 3  # query 2 (compacted id 3)
    assert labels[0, 8] == 1  # query 0
    assert labels[12, 0] == 2  # query 1


def test_masks_from_queries_rejects_all():
    logits = np.zeros((3, 8, 8), np.float32)
    objectness = np.full((3,), -10.0, np.float32)
    labels, n = masks_from_queries(jnp.asarray(logits), jnp.asarray(objectness))
    assert int(n) == 0
    assert np.all(np.asarray(labels) == 0)


def test_set_loss_perfect_vs_bad():
    from quber_tpu.models.msmformer import msmformer_set_loss

    q, h, w = 4, 16, 16
    gt = np.zeros((1, 2, h, w), np.float32)
    gt[0, 0, :8] = 1
    gt[0, 1, 8:] = 1
    valid = np.asarray([[True, True]])

    # perfect prediction: queries 0/1 reproduce the GT with high objectness
    logits = np.full((1, q, h, w), -10.0, np.float32)
    logits[0, 0, :8] = 10.0
    logits[0, 1, 8:] = 10.0
    objness = np.asarray([[8.0, 8.0, -8.0, -8.0]], np.float32)
    good = msmformer_set_loss(
        {"mask_logits": jnp.asarray(logits), "objectness": jnp.asarray(objness)},
        jnp.asarray(gt), jnp.asarray(valid))
    total_good = sum(float(v) for v in good.values())

    bad = msmformer_set_loss(
        {"mask_logits": jnp.asarray(-logits), "objectness": jnp.asarray(-objness)},
        jnp.asarray(gt), jnp.asarray(valid))
    total_bad = sum(float(v) for v in bad.values())
    assert total_good < 0.1 < total_bad


def test_set_loss_matching_invariance():
    from quber_tpu.models.msmformer import msmformer_set_loss

    # swapping which query owns which GT must not change the loss
    q, h, w = 3, 8, 8
    gt = np.zeros((1, 2, h, w), np.float32)
    gt[0, 0, :, :4] = 1
    gt[0, 1, :, 4:] = 1
    valid = np.asarray([[True, True]])
    logits = np.full((1, q, h, w), -9.0, np.float32)
    logits[0, 2, :, :4] = 9.0   # query 2 owns GT 0
    logits[0, 0, :, 4:] = 9.0   # query 0 owns GT 1
    objness = np.asarray([[7.0, -7.0, 7.0]], np.float32)
    out = msmformer_set_loss(
        {"mask_logits": jnp.asarray(logits), "objectness": jnp.asarray(objness)},
        jnp.asarray(gt), jnp.asarray(valid))
    assert sum(float(v) for v in out.values()) < 0.1


def test_hungarian_match_scipy_oracle(rng):
    """The on-device LAP == scipy.optimize.linear_sum_assignment: identical
    assignments on random continuous costs (unique optimum a.s.), invalid
    targets -> -1 without disturbing the valid ones."""
    from scipy.optimize import linear_sum_assignment

    from quber_tpu.models.msmformer import hungarian_match

    matcher = jax.jit(hungarian_match)
    for trial in range(20):
        q = rng.randint(3, 40)
        n = rng.randint(1, min(q, 12) + 1)
        cost = rng.randn(q, n).astype(np.float32) * 10
        valid = rng.rand(n) > 0.3
        got = np.asarray(matcher(jnp.asarray(cost), jnp.asarray(valid)))
        want = np.full((n,), -1, np.int32)
        cols = np.nonzero(valid)[0]
        if len(cols):
            r, c = linear_sum_assignment(cost[:, cols])
            want[cols[c]] = r
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_hungarian_match_grad_flows():
    """value_and_grad through a matched loss works (matching is a constant
    under differentiation, custom_jvp)."""
    from quber_tpu.models.msmformer import hungarian_match

    cost = jnp.asarray([[0.1, 2.0], [2.0, 0.1], [1.0, 1.0]], jnp.float32)
    valid = jnp.asarray([True, True])

    def loss(c):
        m = hungarian_match(c, valid)
        return jnp.sum(c[m, jnp.arange(2)])

    val, grad = jax.value_and_grad(loss)(cost)
    assert np.isclose(float(val), 0.2)
    assert np.asarray(grad).sum() == 2.0  # d(sum of 2 picks)/d(picked cells)
