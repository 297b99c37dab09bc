"""Explicit-error-estimation side project: late-fusion encoder-decoder.

Rebuild of the reference's standalone EEE study
(/root/reference/explicit_error_estimation/models/late_fusion.py:20-120 with
train loop train_net.py:17-171): one small CNN encoder PER INPUT MODALITY
(rgb / depth / fg_mask / boundary / offset-encoding), per-stage 1x1-conv
fusion of the modality features, a U-Net-style decoder, and two heads
predicting the mask / boundary error maps (tp/fp/fn). Dice, focal, and
dice-CE losses mirror the vendored loss.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import ConvNorm, upsample_bilinear


class StageEncoder(nn.Module):
    """Per-modality encoder: `levels` stages of stride-2 double convs,
    returning all stage features."""

    base: int = 16
    levels: int = 4
    norm: str = "GN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        y = x.astype(self.dtype)
        for i in range(self.levels):
            ch = max(32, self.base * (2**i))
            y = ConvNorm(ch, 3, strides=2, norm=self.norm, act=nn.relu,
                         train=self.train, dtype=self.dtype, name=f"down_{i}")(y)
            y = ConvNorm(ch, 3, norm=self.norm, act=nn.relu, train=self.train,
                         dtype=self.dtype, name=f"conv_{i}")(y)
            feats.append(y)
        return feats


class LateFusionEncoderDecoder(nn.Module):
    """modalities: dict name -> channel count. Output: dict with 'mask' and
    'boundary' error logits [B, H, W, num_classes]."""

    modalities: tuple = (("rgb", 3), ("depth", 3), ("fg_mask", 1),
                         ("boundary", 1), ("offset", 3))
    num_classes: int = 3  # tp / fp / fn
    levels: int = 4
    norm: str = "GN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: dict):
        t, d = self.train, self.dtype
        per_stage = [[] for _ in range(self.levels)]
        for name, _ in self.modalities:
            feats = StageEncoder(levels=self.levels, norm=self.norm, train=t,
                                 dtype=d, name=f"enc_{name}")(inputs[name])
            for i, f in enumerate(feats):
                per_stage[i].append(f)

        fused = []
        for i, feats in enumerate(per_stage):
            y = jnp.concatenate(feats, axis=-1)
            ch = feats[0].shape[-1]
            y = ConvNorm(ch, 1, use_bias=True, norm=self.norm, act=nn.relu,
                         train=t, dtype=d, name=f"fuse_{i}")(y)
            fused.append(y)

        # U-Net style decode over the fused pyramid
        y = fused[-1]
        for i in reversed(range(self.levels - 1)):
            y = upsample_bilinear(y.astype(jnp.float32),
                                  size=(fused[i].shape[1], fused[i].shape[2])).astype(d)
            y = jnp.concatenate([y, fused[i]], axis=-1)
            y = ConvNorm(fused[i].shape[-1], 3, norm=self.norm, act=nn.relu,
                         train=t, dtype=d, name=f"dec_{i}")(y)
        h, w = inputs[self.modalities[0][0]].shape[1:3]
        y = upsample_bilinear(y.astype(jnp.float32), size=(h, w)).astype(d)

        out = {}
        for head in ("mask", "boundary"):
            f = ConvNorm(32, 3, norm=self.norm, act=nn.relu, train=t, dtype=d,
                         name=f"{head}_head")(y)
            out[head] = nn.Conv(self.num_classes, (1, 1), dtype=d,
                                name=f"{head}_pred")(f).astype(jnp.float32)
        return out


def focal_loss(logits, targets, gamma: float = 2.0, alpha: float = 0.25):
    """Multi-channel sigmoid focal loss (vendored-monai flavor)."""
    p = jax.nn.sigmoid(logits)
    t = targets.astype(jnp.float32)
    ce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pt = p * t + (1 - p) * (1 - t)
    a = alpha * t + (1 - alpha) * (1 - t)
    return jnp.mean(a * (1 - pt) ** gamma * ce)


def dice_ce_loss(logits, targets, dice_weight: float = 1.0, ce_weight: float = 1.0):
    from quber_tpu.models.mask_refiner import dice_loss

    p = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.mean(jnp.sum(p * targets, axis=-1))
    return dice_weight * dice_loss(logits, targets) + ce_weight * ce
