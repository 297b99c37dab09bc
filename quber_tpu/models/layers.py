"""Shared conv/norm building blocks (flax.linen, NHWC, TPU-friendly).

Mirrors the semantics of the reference's detectron2 layer zoo (Conv2d with
fused norm+activation, FrozenBN, GroupNorm-32, DepthwiseSeparableConv2d,
ASPP) without its torch idioms. All convs are NHWC/HWIO so XLA maps them
straight onto the MXU; compute dtype is a knob (`dtype`) so the whole model
can run in bfloat16 with fp32 params.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def upsample_bilinear(x: jnp.ndarray, scale: int | None = None, size: tuple[int, int] | None = None) -> jnp.ndarray:
    """Bilinear resize, half-pixel centers (= torch align_corners=False)."""
    b, h, w, c = x.shape
    if size is None:
        size = (h * scale, w * scale)
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently frozen statistics and affine params.

    detectron2-style FrozenBN (the reference backbone default,
    /root/reference/maskrefiner/modeling/backbone/resnet.py via
    cfg.MODEL.RESNETS.NORM="FrozenBN"): y = (x - mean) / sqrt(var + eps) *
    weight + bias with all four tensors fixed. Stored as params so a torch
    checkpoint importer can fill them; the train-step optimizer mask must
    exclude path suffixes {'frozen_*'}.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("frozen_weight", nn.initializers.ones, (c,))
        bias = self.param("frozen_bias", nn.initializers.zeros, (c,))
        mean = self.param("frozen_mean", nn.initializers.zeros, (c,))
        var = self.param("frozen_var", nn.initializers.ones, (c,))
        scale = weight * jax.lax.rsqrt(var + self.epsilon)
        return x * scale.astype(x.dtype) + (bias - mean * scale).astype(x.dtype)


def make_norm(norm: str, train: bool = False) -> Callable[..., nn.Module] | None:
    """Factory mapping the reference's norm names to flax modules."""
    if norm == "" or norm is None:
        return None
    if norm == "GN":
        return lambda: nn.GroupNorm(num_groups=32, epsilon=1e-5)
    if norm == "BN" or norm == "SyncBN":
        # SyncBN == BN with cross-replica stats; we use per-replica stats for
        # GN-configured models (the shipped configs) and note the axis_name
        # hook for SyncBN parity.
        return lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name="data" if norm == "SyncBN" and train else None,
        )
    if norm == "FrozenBN":
        return lambda: FrozenBatchNorm()
    raise ValueError(f"Unknown norm: {norm}")


class ConvNorm(nn.Module):
    """Conv2d + optional norm + optional activation (detectron2 Conv2d)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    norm: str = ""
    act: Callable | None = None
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = ((k - 1) // 2) * self.dilation
        x = nn.Conv(
            self.features,
            kernel_size=(k, k),
            strides=(self.strides, self.strides),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        norm_factory = make_norm(self.norm, self.train)
        if norm_factory is not None:
            x = norm_factory()(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DepthwiseSeparableConv(nn.Module):
    """5x5 depthwise + 1x1 pointwise, each with norm + ReLU.

    Mirrors detectron2 DepthwiseSeparableConv2d as used by the prediction
    heads when USE_DEPTHWISE_SEPARABLE_CONV (model.py:372-383).
    """

    features: int
    kernel_size: int = 5
    norm: str = "GN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = ConvNorm(
            c, kernel_size=self.kernel_size, groups=c, use_bias=False,
            norm=self.norm, act=nn.relu, train=self.train, dtype=self.dtype,
            name="depthwise",
        )(x)
        x = ConvNorm(
            self.features, kernel_size=1, use_bias=False, norm=self.norm,
            act=nn.relu, train=self.train, dtype=self.dtype, name="pointwise",
        )(x)
        return x


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling with a global-pool branch.

    detectron2 ASPP semantics (used by DeepLabV3PlusHead on the deepest
    feature): 1x1 conv, three 3x3 dilated convs, image pooling (global avg ->
    1x1 conv with bias, no norm), concat, 1x1 projection, dropout.
    """

    features: int = 256
    dilations: Sequence[int] = (6, 12, 18)
    norm: str = "GN"
    dropout: float = 0.1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_bias = self.norm == ""
        branches = [
            ConvNorm(self.features, 1, use_bias=use_bias, norm=self.norm,
                     act=nn.relu, train=self.train, dtype=self.dtype, name="conv1x1")(x)
        ]
        for i, d in enumerate(self.dilations):
            branches.append(
                ConvNorm(self.features, 3, dilation=d, use_bias=use_bias,
                         norm=self.norm, act=nn.relu, train=self.train,
                         dtype=self.dtype, name=f"conv3x3_{i}")(x)
            )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvNorm(self.features, 1, use_bias=True, norm="", act=nn.relu,
                          train=self.train, dtype=self.dtype, name="pool_conv")(pooled)
        pooled = jnp.broadcast_to(pooled, branches[0].shape)
        x = jnp.concatenate(branches + [pooled], axis=-1)
        x = ConvNorm(self.features, 1, use_bias=use_bias, norm=self.norm,
                     act=nn.relu, train=self.train, dtype=self.dtype, name="project")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not self.train)(x)
        return x


class PReLU(nn.Module):
    """Per-channel PReLU (for CGNet / LMFFNet parity)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.constant(0.25), (c,))
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


def max_pool_same(x, window: int, strides: int):
    """Max pool matching torch MaxPool2d(kernel, stride, padding=k//2)."""
    pad = (window - 1) // 2
    return nn.max_pool(
        x, (window, window), strides=(strides, strides),
        padding=[(pad, pad), (pad, pad)],
    )


def avg_pool_torch(x, window: int = 3, strides: int = 2, pad: int = 1):
    """AvgPool2d(3, 2, padding=1) with torch count_include_pad=True."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, strides, strides, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return summed / (window * window)
