"""RICE-class refiner component tests (CPU, tiny)."""

import numpy as np
import jax
import jax.numpy as jnp

from quber_tpu.models.rice import NodeScorer, masks_adjacent, split_mask_2means


def test_split_mask_2means():
    # two touching squares split along the gap
    mask = np.zeros((32, 64), np.float32)
    mask[8:24, 4:28] = 1
    mask[8:24, 36:60] = 1
    a, b = split_mask_2means(jnp.asarray(mask))
    a, b = np.asarray(a), np.asarray(b)
    # disjoint cover of the original
    np.testing.assert_array_equal(a + b, mask)
    assert a.sum() > 0 and b.sum() > 0
    # each half is one of the squares
    left = a if a[10, 10] else b
    right = b if a[10, 10] else a
    assert left[:, :28].sum() == left.sum()
    assert right[:, 36:].sum() == right.sum()


def test_masks_adjacent():
    masks = np.zeros((3, 32, 32), np.float32)
    masks[0, 4:12, 4:12] = 1
    masks[1, 4:12, 13:20] = 1   # 1 px gap from mask 0 -> adjacent via dilation
    masks[2, 24:30, 24:30] = 1  # far away
    adj = np.asarray(masks_adjacent(jnp.asarray(masks)))
    assert adj[0, 1] and adj[1, 0]
    assert not adj[0, 2] and not adj[2, 0]
    assert not adj.diagonal().any()


def test_node_scorer_shapes(rng):
    m = NodeScorer()
    x = jnp.asarray(rng.rand(4, 64, 64, 6).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (4,)
    assert np.isfinite(np.asarray(out)).all()
