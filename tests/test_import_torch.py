"""Checkpoint-importer tests: numeric conversion parity vs torch, and a full
structural round-trip through the detectron2 key layout."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from quber_tpu.models import import_torch as IT
from quber_tpu.models.layers import ConvNorm
from flax import linen as fnn


def test_conv_kernel_conversion_matches_torch(rng):
    x = rng.rand(1, 5, 12, 16).astype(np.float32)  # NCHW
    conv = nn.Conv2d(5, 7, 3, padding=1, bias=True)
    want = conv(torch.from_numpy(x)).detach().numpy()

    model = ConvNorm(7, 3, use_bias=True, norm="")
    params = {"params": {"conv": {
        "kernel": jnp.asarray(IT.conv_kernel(conv.weight.detach().numpy())),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }}}
    got = model.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5)


def test_strided_dilated_conv_matches_torch(rng):
    x = rng.rand(1, 4, 16, 16).astype(np.float32)
    conv = nn.Conv2d(4, 6, 3, stride=2, padding=2, dilation=2, bias=False)
    want = conv(torch.from_numpy(x)).detach().numpy()
    model = ConvNorm(6, 3, strides=2, dilation=2, norm="")
    params = {"params": {"conv": {"kernel": jnp.asarray(IT.conv_kernel(conv.weight.detach().numpy()))}}}
    got = model.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5)


def test_groupnorm_matches_torch(rng):
    x = rng.rand(2, 64, 8, 8).astype(np.float32)
    gn = nn.GroupNorm(32, 64)
    with torch.no_grad():
        gn.weight.copy_(torch.rand(64))
        gn.bias.copy_(torch.rand(64))
    want = gn(torch.from_numpy(x)).detach().numpy()
    model = fnn.GroupNorm(num_groups=32, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(gn.weight.detach().numpy()),
                         "bias": jnp.asarray(gn.bias.detach().numpy())}}
    got = model.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-4)


def test_frozen_bn_matches_torch_eval_bn(rng):
    from quber_tpu.models.layers import FrozenBatchNorm

    x = rng.rand(2, 16, 6, 6).astype(np.float32)
    bn = nn.BatchNorm2d(16).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.rand(16))
        bn.bias.copy_(torch.rand(16))
        bn.running_mean.copy_(torch.randn(16))
        bn.running_var.copy_(torch.rand(16) + 0.5)
    want = bn(torch.from_numpy(x)).detach().numpy()
    model = FrozenBatchNorm()
    params = {"params": {
        "frozen_weight": jnp.asarray(bn.weight.detach().numpy()),
        "frozen_bias": jnp.asarray(bn.bias.detach().numpy()),
        "frozen_mean": jnp.asarray(bn.running_mean.numpy()),
        "frozen_var": jnp.asarray(bn.running_var.numpy()),
    }}
    got = model.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5)


def test_depthwise_conv_matches_torch(rng):
    x = rng.rand(1, 8, 10, 10).astype(np.float32)
    conv = nn.Conv2d(8, 8, 3, padding=1, groups=8, bias=False)
    want = conv(torch.from_numpy(x)).detach().numpy()
    model = ConvNorm(8, 3, groups=8, norm="")
    params = {"params": {"conv": {"kernel": jnp.asarray(IT.conv_kernel(conv.weight.detach().numpy()))}}}
    got = model.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5)


def test_mask_refiner_import_roundtrip():
    """export(flax) -> detectron2 layout -> import == original tree."""
    from quber_tpu.models import MaskRefiner, MaskRefinerConfig

    cfg = MaskRefinerConfig(height=64, width=64)
    model = MaskRefiner(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)), jnp.zeros((1, 64, 64, 3))
    )
    sd = IT.export_mask_refiner(variables, cfg)
    assert len(sd) > 700  # two R50 trunks worth of tensors
    # depth-trunk stage keys carry the reference's depth_ prefix
    assert any(k.startswith("backbone.depth_backbone.depth_res2") for k in sd)
    assert any(k.startswith("backbone.rgb_backbone.res5") for k in sd)

    imported = IT.import_mask_refiner(sd, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(imported["params"])
    )
    missing = [jax.tree_util.keystr(p) for p, _ in flat_a if jax.tree_util.keystr(p) not in flat_b]
    assert not missing, f"importer missed {len(missing)} params, e.g. {missing[:5]}"
    for p, v in flat_a:
        key = jax.tree_util.keystr(p)
        np.testing.assert_array_equal(np.asarray(v), flat_b[key], err_msg=key)

    # batch_stats (head FusionLayers BN) round-trip too
    stats_a = {jax.tree_util.keystr(p): v for p, v in
               jax.tree_util.tree_leaves_with_path(variables["batch_stats"])}
    stats_b = {jax.tree_util.keystr(p): v for p, v in
               jax.tree_util.tree_leaves_with_path(imported["batch_stats"])}
    assert set(stats_a) == set(stats_b)

    # imported tree must drive the model identically
    x = jnp.ones((1, 64, 64, 6))
    o = jnp.ones((1, 64, 64, 3))
    out_a = model.apply(variables, x, o)
    out_b = model.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]}, x, o
    )
    for k in out_a:
        np.testing.assert_array_equal(np.asarray(out_a[k]), np.asarray(out_b[k]))


def test_load_torch_checkpoint_and_orbax_glue(tmp_path):
    """tools/import_checkpoint.py glue: .pth loading + orbax params payload."""
    import torch

    from quber_tpu.train.checkpoint import restore_params, save_params

    sd = {"backbone.res2.conv1.weight": torch.randn(8, 4, 3, 3),
          "head.bias": torch.zeros(5)}
    path = tmp_path / "model_final.pth"
    torch.save({"model": sd}, str(path))
    loaded = IT.load_torch_checkpoint(str(path))
    assert set(loaded) == set(sd)
    assert loaded["backbone.res2.conv1.weight"].shape == (8, 4, 3, 3)

    variables = {"params": {"w": np.ones((2, 3), np.float32)},
                 "batch_stats": {"m": np.zeros((3,), np.float32)}}
    save_params(str(tmp_path / "ckpt"), variables)
    back = restore_params(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(back["params"]["w"], variables["params"]["w"])
    np.testing.assert_array_equal(back["batch_stats"]["m"],
                                  variables["batch_stats"]["m"])
