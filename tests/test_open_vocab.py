"""Open-vocabulary family: text tower, Detic-class detector, GroundedSAM glue."""

import numpy as np
import jax
import jax.numpy as jnp

from quber_tpu.models.open_vocab import (
    VOCABULARIES,
    DeticDetector,
    TextEncoder,
    hash_tokenize,
)


def test_hash_tokenize_stable_and_padded():
    ids1, mask1 = hash_tokenize(["food_box shampoo", "mug"])
    ids2, _ = hash_tokenize(["food_box shampoo", "mug"])
    np.testing.assert_array_equal(ids1, ids2)  # deterministic (FNV, not hash())
    assert ids1.shape == (2, 16)
    # underscores split into words: "food box shampoo" = 3 tokens
    assert mask1[0, :3].all() and not mask1[0, 3:].any()
    assert mask1[1, 0] and not mask1[1, 1:].any()
    assert (ids1[mask1] > 0).all()  # 0 reserved for padding


def test_text_encoder_normalized(rng):
    enc = TextEncoder(vocab_size=512, dim=32, out_dim=16, depth=1, num_heads=2)
    ids, mask = hash_tokenize(VOCABULARIES["OSD"][:4], vocab_size=512)
    v = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
    out = np.asarray(enc.apply(v, jnp.asarray(ids), jnp.asarray(mask)))
    assert out.shape == (4, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    # different texts -> different embeddings
    assert not np.allclose(out[0], out[1])


def test_detic_detector_forward(rng):
    m = DeticDetector(max_proposals=16, max_detections=4, norm="GN")
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    text = jnp.asarray(rng.randn(5, 256).astype(np.float32))
    text = text / np.linalg.norm(text, axis=-1, keepdims=True)
    v = m.init(jax.random.PRNGKey(0), rgb, text)
    out = m.apply(v, rgb, text)
    assert out["boxes"].shape == (4, 4)
    assert out["scores"].shape == (4,)
    assert out["classes"].shape == (4,)
    assert out["masks"].shape == (4, 28, 28)
    assert np.isfinite(np.asarray(out["scores"])).all()
    cls = np.asarray(out["classes"])
    assert ((0 <= cls) & (cls < 5)).all()


def test_sam_decode_box_matches_corner_points(rng):
    # a box prompt is exactly its two corner points with labels (2, 3)
    from quber_tpu.models.sam_hq import SAMHQ, init_sam_variables

    model = SAMHQ(img_size=64, embed_dim=32, depth=1, num_heads=2,
                  global_blocks=(0,), window_size=2)
    v = init_sam_variables(model, jax.random.PRNGKey(0))
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    embed, interm = model.apply(v, img, method=SAMHQ.encode)
    box = jnp.asarray([[0.2, 0.3, 0.7, 0.8]]) * 64
    out_box = model.apply(v, embed, interm, box, method=SAMHQ.decode_box)
    pts = jnp.asarray([[[0.2, 0.3], [0.7, 0.8]]]) * 64
    labels = jnp.asarray([[2, 3]], jnp.int32)
    # pad=False: the reference pads point-only prompts but not box prompts
    out_pts = model.apply(v, embed, interm, pts, labels, False, False, False,
                          method=SAMHQ.decode_points)
    for a, b in zip(out_box, out_pts):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
