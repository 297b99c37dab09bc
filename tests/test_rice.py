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


def _tiny_refiner(search):
    from quber_tpu.models.rice import RICERefiner

    class TinyRICE(RICERefiner):
        MAX_INST = 4
        CROP = 16
        ROUNDS = 2
        SAMPLES = 3
        DEPTH = 2
        CEM_ROUNDS = 2
        ELITES = 2

    return TinyRICE(search=search)


def _tiny_scene(rng):
    h = w = 32
    image6 = rng.rand(h, w, 6).astype(np.float32)
    masks = np.zeros((4, h, w), np.float32)
    masks[0, 4:16, 4:16] = 1    # two adjacent halves of one object
    masks[1, 4:16, 17:28] = 1
    masks[2, 20:30, 20:30] = 1  # a separate object
    valid = np.asarray([True, True, True, False])
    return image6, masks, valid


def test_cem_search_runs_and_respects_union(rng):
    ref = _tiny_refiner("cem")
    image6, masks, valid = _tiny_scene(rng)
    out_m, out_v = ref._search(ref.params, jnp.asarray(image6),
                               jnp.asarray(masks), jnp.asarray(valid),
                               jax.random.PRNGKey(0))
    out_m, out_v = np.asarray(out_m), np.asarray(out_v)
    assert out_m.shape == (4, 32, 32) and out_v.shape == (4,)
    assert out_v.sum() >= 1
    # ops only delete/split/merge: the union can never grow
    union0 = masks.max(0) > 0
    union1 = out_m.max(0) > 0.5
    assert not (union1 & ~union0).any()
    # deterministic under the same key
    out_m2, out_v2 = ref._search(ref.params, jnp.asarray(image6),
                                 jnp.asarray(masks), jnp.asarray(valid),
                                 jax.random.PRNGKey(0))
    np.testing.assert_array_equal(out_m, np.asarray(out_m2))


def test_greedy_search_still_available(rng):
    ref = _tiny_refiner("greedy")
    image6, masks, valid = _tiny_scene(rng)
    out_m, out_v = ref._search(ref.params, jnp.asarray(image6),
                               jnp.asarray(masks), jnp.asarray(valid),
                               jax.random.PRNGKey(0))
    assert np.asarray(out_m).shape == (4, 32, 32)
    assert np.asarray(out_v).sum() >= 1


def test_hypothesis_score_is_summed_not_meaned(rng):
    """Delete-exploit regression: the hypothesis score must be the SUM of
    node scores. Under a mean, deleting any below-average node raises the
    score, so the search culls true objects (measured on the synthetic
    benchmark: perturbed-GT Objects F 93 -> 76)."""
    import jax.numpy as jnp

    ref = _tiny_refiner("greedy")
    image6, masks, valid = _tiny_scene(rng)
    image6, masks, valid = (jnp.asarray(image6), jnp.asarray(masks),
                            jnp.asarray(valid))
    from quber_tpu.models.rice import hypothesis_node_crops

    crops, ok = hypothesis_node_crops(image6, masks, valid, crop=ref.CROP)
    node = ref.scorer.apply(ref.params, crops)
    s = ref._score_hypothesis(ref.params, image6, masks, valid)
    np.testing.assert_allclose(
        float(s), float(jnp.sum(node * ok)), rtol=1e-5
    )
    # removing a positive-scoring node must strictly lower the score
    node_np, ok_np = np.asarray(node), np.asarray(ok)
    pos = [i for i in range(len(node_np)) if ok_np[i] and node_np[i] > 0]
    if pos:
        i = pos[0]
        m2 = masks.at[i].set(0)
        v2 = valid.at[i].set(False)
        s2 = ref._score_hypothesis(ref.params, image6, m2, v2)
        assert float(s2) < float(s)
