"""Model smoke tests + loss/upsample parity against torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from quber_tpu.models import MaskRefiner, MaskRefinerConfig, CGNet, LMFFNet
from quber_tpu.models import mask_refiner as mr
from quber_tpu.models.layers import upsample_bilinear


SMALL_CFG = MaskRefinerConfig(height=64, width=64)


def test_upsample_matches_torch(rng):
    x = rng.rand(1, 8, 10, 3).astype(np.float32)
    got = np.asarray(upsample_bilinear(jnp.asarray(x), scale=4))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=4,
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mask_refiner_forward_shapes(rng):
    cfg = SMALL_CFG
    model = MaskRefiner(cfg)
    images = jnp.asarray(rng.rand(1, 64, 64, 6).astype(np.float32) * 255)
    offsets = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images, offsets)
    out = model.apply(params, images, offsets)
    assert out["foreground"].shape == (1, 64, 64, 1)
    assert out["center"].shape == (1, 64, 64, 1)
    assert out["offset"].shape == (1, 64, 64, 2)
    assert out["eee_mask"].shape == (1, 64, 64, 2)  # e2 -> 2 channels
    assert out["eee_boundary"].shape == (1, 64, 64, 2)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_mask_refiner_param_count():
    # dual ResNet-50 trunks (~48M) + concat fusion (~15M) + ASPP-256 on a
    # 2048-ch res5 (~16M) + hierarchical heads (~3M) => ~82M total
    cfg = SMALL_CFG
    model = MaskRefiner(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 6)),
        jnp.zeros((1, 64, 64, 3)),
    )
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert 70e6 < n < 95e6, f"param count {n/1e6:.1f}M out of expected range"


def test_mask_refiner_error_types(rng):
    images = jnp.zeros((1, 64, 64, 6))
    offsets = jnp.zeros((1, 64, 64, 3))
    for etype, ch in [("e3", 4), ("e33", 3), ("e32", 2)]:
        cfg = MaskRefinerConfig(height=64, width=64, error_type=etype)
        model = MaskRefiner(cfg)
        params = model.init(jax.random.PRNGKey(0), images, offsets)
        out = model.apply(params, images, offsets)
        assert out["eee_mask"].shape[-1] == ch


def test_losses_match_torch(rng):
    b, h, w = 2, 16, 16
    logits = rng.randn(b, h, w).astype(np.float32)
    targets = (rng.rand(b, h, w) > 0.5).astype(np.float32)
    weights = rng.rand(b, h, w).astype(np.float32)

    # BCE hard-pixel-mining, top_k = 1.0 (plain weighted mean)
    got = float(mr.foreground_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)))
    want = (F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    ) * torch.from_numpy(weights)).mean().item()
    assert abs(got - want) < 1e-5

    # top_k = 0.2 keeps the hardest 20%
    got = float(mr.foreground_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   jnp.asarray(weights), top_k=0.2))
    pixel = (F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    ) * torch.from_numpy(weights)).view(-1)
    want = torch.topk(pixel, int(0.2 * pixel.numel()))[0].mean().item()
    assert abs(got - want) < 1e-5

    # weighted MSE / L1 with sum-normalization by weight mass
    pred = rng.randn(b, h, w).astype(np.float32)
    tgt = rng.randn(b, h, w).astype(np.float32)
    got = float(mr.weighted_mse_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(weights)))
    want = ((torch.from_numpy(pred) - torch.from_numpy(tgt)) ** 2 * torch.from_numpy(weights)).sum() / weights.sum()
    assert abs(got - float(want)) < 1e-4

    got = float(mr.weighted_l1_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(weights)))
    want = ((torch.from_numpy(pred) - torch.from_numpy(tgt)).abs() * torch.from_numpy(weights)).sum() / weights.sum()
    assert abs(got - float(want)) < 1e-4

    # zero weight mass -> zero loss (reference guards, model.py:782-785)
    assert float(mr.weighted_mse_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.zeros_like(jnp.asarray(weights)))) == 0.0


def test_dice_loss_properties(rng):
    b, h, w, c = 2, 8, 8, 2
    # perfect prediction -> loss ~ 0; uniform prediction on half-true -> ~0.33
    targets = np.zeros((b, h, w, c), np.float32)
    targets[..., 0] = 1
    logits = np.zeros((b, h, w, c), np.float32)
    logits[..., 0] = 20.0  # softmax ~ one-hot channel 0
    # not exactly 0: the empty channel contributes smooth/(p_sum+smooth) ~ 0.01
    assert float(mr.dice_loss(jnp.asarray(logits), jnp.asarray(targets))) < 0.01

    # compare against a hand-computed monai-style dice on random data
    logits = rng.randn(b, h, w, c).astype(np.float32)
    targets = (rng.rand(b, h, w, c) > 0.5).astype(np.float32)
    p = torch.softmax(torch.from_numpy(logits), dim=-1)
    t = torch.from_numpy(targets)
    inter = (p * t).sum(dim=(1, 2))
    denom = p.sum(dim=(1, 2)) + t.sum(dim=(1, 2))
    want = (1 - (2 * inter + 1e-5) / (denom + 1e-5)).mean().item()
    got = float(mr.dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(got - want) < 1e-5


def test_assemble_eee_targets():
    tp = jnp.asarray([[1.0, 0.0]])
    tn = jnp.asarray([[0.0, 0.0]])
    fp = jnp.asarray([[0.0, 1.0]])
    fn = jnp.asarray([[0.0, 0.0]])
    e2 = np.asarray(mr.assemble_eee_targets(tp, tn, fp, fn, "e2"))
    np.testing.assert_array_equal(e2[..., 0], [[1, 0]])
    np.testing.assert_array_equal(e2[..., 1], [[0, 1]])
    assert mr.assemble_eee_targets(tp, tn, fp, fn, "e3").shape[-1] == 4
    assert mr.assemble_eee_targets(tp, tn, fp, fn, "e33").shape[-1] == 3
    assert mr.assemble_eee_targets(tp, tn, fp, fn, "e32").shape[-1] == 2


def test_compute_losses_end_to_end(rng):
    cfg = SMALL_CFG
    model = MaskRefiner(cfg)
    images = jnp.asarray(rng.rand(1, 64, 64, 6).astype(np.float32) * 255)
    offsets = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images, offsets)
    outputs = model.apply(params, images, offsets, full_res=False)
    targets = {
        "sem_seg": jnp.asarray((rng.rand(1, 64, 64) > 0.5).astype(np.float32)),
        "sem_seg_weights": jnp.ones((1, 64, 64)),
        "center": jnp.asarray(rng.rand(1, 64, 64).astype(np.float32)),
        "center_weights": jnp.ones((1, 64, 64)),
        "offset": jnp.asarray(rng.randn(1, 64, 64, 2).astype(np.float32)),
        "offset_weights": jnp.ones((1, 64, 64)),
        "eee_mask": jnp.asarray((rng.rand(1, 64, 64, 2) > 0.5).astype(np.float32)),
        "eee_boundary": jnp.asarray((rng.rand(1, 64, 64, 2) > 0.5).astype(np.float32)),
    }
    losses = mr.compute_losses(outputs, targets, cfg)
    assert set(losses) == {"loss_sem_seg", "loss_center", "loss_offset",
                           "loss_eee_mask", "loss_eee_boundary"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_cgnet_forward(rng):
    model = CGNet()
    x = jnp.asarray(rng.rand(1, 48, 64, 4).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 48, 64, 2)
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert 0.3e6 < n < 0.8e6, f"CGNet params {n/1e6:.2f}M"


def test_lmffnet_forward(rng):
    model = LMFFNet()
    x = jnp.asarray(rng.rand(1, 64, 64, 6).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 64, 3)
