"""Shape/mechanics tests for the refiner baselines (CascadePSP, SAM-HQ) and
the fg-segmenter training loop."""

import numpy as np
import jax
import jax.numpy as jnp

from quber_tpu.models.cascadepsp import PSPModule, PSPNetUOAIS
from quber_tpu.models.sam_hq import SAMHQ, sam_hq_mask_loss
from quber_tpu.train.fg_train import (
    class_balanced_weights,
    create_fg_train_state,
    make_fg_train_step,
    weighted_ce_loss,
)


def test_psp_module_shapes(rng):
    # 28x28 feature grid (not divisible by bins 3/6 — exercises the
    # torch AdaptiveAvgPool2d floor/ceil cell bounds)
    x = jnp.asarray(rng.rand(1, 28, 28, 256).astype(np.float32))
    m = PSPModule(out_features=128)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 28, 28, 128)


def test_pspnet_uoais_forward(rng):
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    depth = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
    seg = jnp.asarray((rng.rand(1, 64, 64, 1) > 0.5).astype(np.float32) * 2 - 1)
    m = PSPNetUOAIS()
    v = m.init(jax.random.PRNGKey(0), rgb, depth, seg)
    out = m.apply(v, rgb, depth, seg)
    assert out["out_224"].shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out["out_224"])).all()
    assert set(out) >= {"out_28", "out_56", "out_224", "pred_224"}


def test_sam_hq_tiny_forward(rng):
    # tiny ViT config to keep CPU time sane
    model = SAMHQ(img_size=64, embed_dim=64, depth=2, num_heads=2,
                  global_blocks=(1,), window_size=2)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    prompt = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), img, prompt)
    masks, iou, all_masks = model.apply(v, img, prompt)
    # image embedding grid = 64/16 = 4 -> masks at 4x upscale = 16
    assert masks.shape == (1, 1, 16, 16)
    assert all_masks.shape == (1, 5, 16, 16)  # 4 SAM tokens + HQ token
    assert iou.shape == (1, 1)
    # loss sanity
    target = jnp.asarray((rng.rand(1, 16, 16) > 0.5).astype(np.float32))
    loss = sam_hq_mask_loss(masks[:, 0], target)
    assert np.isfinite(float(loss))


def test_class_balanced_weights():
    labels = np.zeros((1, 4, 4), np.int32)
    labels[0, :1] = 1  # 4 px of class 1, 12 px of class 0
    w = np.asarray(class_balanced_weights(jnp.asarray(labels), 2))
    # rarer class gets the larger weight; ratio = 12/4 = 3
    assert w[0, 0, 0] == np.float32(16 / (2 * 4))
    assert w[0, 3, 0] == np.float32(16 / (2 * 12))
    assert w[0, 0, 0] / w[0, 3, 0] == np.float32(3.0)


def test_fg_train_step_decreases_loss(rng):
    from quber_tpu.models.cgnet import CGNet

    model_train = CGNet(classes=2, in_channels=4, m=1, n=2, train=True)
    state, tx = create_fg_train_state(
        CGNet(classes=2, in_channels=4, m=1, n=2, train=False), (1, 32, 32, 4), lr=3e-3
    )
    step = make_fg_train_step(model_train, tx)
    images = jnp.asarray(rng.rand(2, 32, 32, 4).astype(np.float32))
    labels = jnp.asarray((rng.rand(2, 32, 32) > 0.7).astype(np.int32))
    first = None
    for _ in range(12):
        state, metrics = step(state, images, labels)
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first


def test_weighted_ce_perfect_prediction():
    labels = jnp.asarray(np.random.RandomState(0).randint(0, 2, (1, 8, 8)))
    logits = jax.nn.one_hot(labels, 2) * 30.0
    assert float(weighted_ce_loss(logits, labels)) < 1e-3


def test_sam_point_prompts(rng):
    from quber_tpu.models.sam_hq import SAMHQ, init_sam_variables

    model = SAMHQ(img_size=64, embed_dim=64, depth=2, num_heads=2,
                  global_blocks=(1,), window_size=2)
    v = init_sam_variables(model, jax.random.PRNGKey(0))
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    embed, interm = model.apply(v, img, method=SAMHQ.encode)
    pts = jnp.asarray(rng.rand(1, 2, 2).astype(np.float32) * 64)
    labels = jnp.ones((1, 2), jnp.int32)
    masks, iou, all_masks = model.apply(
        v, embed, interm, pts, labels, method=SAMHQ.decode_points)
    assert masks.shape == (1, 1, 16, 16)
    assert np.isfinite(np.asarray(masks)).all()
    # mask-prompt path still works with the same variables
    prompt = jnp.zeros((1, 16, 16, 1))
    masks2, iou2, _ = model.apply(v, embed, interm, prompt, method=SAMHQ.decode)
    assert masks2.shape == (1, 1, 16, 16)
