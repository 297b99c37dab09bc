"""LMFFNet foreground segmenter (flax, NHWC).

Rebuild of the lightweight multiscale-feature-fusion net used as QuBER's
default eval-time foreground filter
(/root/reference/foreground_segmentation/lmffnet.py, wrapper
predictor.py:57-99): 6-channel input (ImageNet-standardized RGB + depth/255
x3) at 640x480, 3 classes (bg / table / object); class 2 is the object
foreground mask.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import PReLU, avg_pool_torch, upsample_bilinear


class BNPReLU(nn.Module):
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-3, name="bn")(x)
        return PReLU(name="act")(x)


class ConvUnit(nn.Module):
    """Conv with optional BN+PReLU (lmffnet.py Conv:24-43)."""

    features: int
    kernel: int = 3
    strides: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    bn_acti: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=[(self.padding, self.padding)] * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        if self.bn_acti:
            x = BNPReLU(self.train, name="bn_prelu")(x)
        return x


class SEMB(nn.Module):
    """Split-extract-merge bottleneck block (lmffnet.py:84-115)."""

    features: int
    dilation: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.features
        t, dt = self.train, self.dtype
        y = ConvUnit(n // 2, 3, 1, 1, bn_acti=True, train=t, dtype=dt, name="conv3x3")(x)
        left, right = y[..., : n // 4], y[..., n // 4:]
        left = ConvUnit(n // 4, 3, 1, 1, groups=n // 4, bn_acti=True, train=t,
                        dtype=dt, name="dconv_left")(left)
        right = ConvUnit(n // 4, 3, 1, self.dilation, dilation=self.dilation,
                         groups=n // 4, bn_acti=True, train=t, dtype=dt,
                         name="dconv_right")(right)
        y = jnp.concatenate([left, right], axis=-1)
        y = ConvUnit(n // 2, 3, 1, 1, bn_acti=True, train=t, dtype=dt,
                     name="resume_3x3")(y)
        y = ConvUnit(n, 1, 1, 0, train=t, dtype=dt, name="resume_1x1")(y)
        return BNPReLU(t, name="bn_out")(y + x)


class DownSamplingBlock(nn.Module):
    """Strided conv (+ maxpool concat when widening) (lmffnet.py:118-142)."""

    in_channels: int
    out_channels: int
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        widen = self.in_channels < self.out_channels
        n_conv = self.out_channels - self.in_channels if widen else self.out_channels
        y = ConvUnit(n_conv, 3, 2, 1, train=self.train, dtype=self.dtype,
                     name="conv3x3")(x)
        if widen:
            pooled = nn.max_pool(x, (2, 2), strides=(2, 2))
            y = jnp.concatenate([y, pooled], axis=-1)
        return BNPReLU(self.train, name="bn_prelu")(y)


class SENetBlock(nn.Module):
    """SE gate with a single shared PReLU slope (lmffnet.py:159-173)."""

    reduction: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, 1, 1, C]
        c = x.shape[-1]
        y = x.reshape(x.shape[0], c)
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype, name="fc1")(y)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,))
        y = jnp.where(y >= 0, y, y * alpha.astype(y.dtype))
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return nn.sigmoid(y)[:, None, None, :]


class PMCA(nn.Module):
    """Partitioned multi-scale channel attention (lmffnet.py:176-196)."""

    reduction: int = 8
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # AdaptiveAvgPool2d((2,2)): mean over the four half-plane quadrants
        q = x.reshape(b, 2, h // 2, 2, w // 2, c).mean(axis=(2, 4))  # [B,2,2,C]
        o1 = nn.Conv(c, (2, 2), padding="VALID", feature_group_count=c,
                     use_bias=False, dtype=self.dtype, name="conv2x2")(q)  # [B,1,1,C]
        o2 = jnp.mean(x, axis=(1, 2), keepdims=True)
        weight = SENetBlock(self.reduction, self.dtype, name="se")(o1 + o2)
        return x * weight


class FFMA(nn.Module):
    """Feature fusion A: BNPReLU(concat) + 1x1 conv (lmffnet.py:199-209)."""

    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        y = BNPReLU(self.train, name="bn_prelu")(jnp.concatenate([x1, x2], axis=-1))
        return ConvUnit(y.shape[-1], 1, 1, 0, train=self.train, dtype=self.dtype,
                        name="conv1x1")(y)


class FFMB(nn.Module):
    """Feature fusion B with PMCA on the skip path (lmffnet.py:212-224)."""

    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, x3):
        x2 = PMCA(8, self.train, self.dtype, name="pmca")(x2)
        y = BNPReLU(self.train, name="bn_prelu")(
            jnp.concatenate([x1, x2, x3], axis=-1)
        )
        return ConvUnit(y.shape[-1], 1, 1, 0, train=self.train, dtype=self.dtype,
                        name="conv1x1")(y)


class MAD(nn.Module):
    """Multi-attention decoder (lmffnet.py:239-280)."""

    classes: int = 3
    c1: int = 16
    c2: int = 32
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        t, dt = self.train, self.dtype
        h2, w2 = x2.shape[1], x2.shape[2]
        a = ConvUnit(self.c1, 1, 1, 0, train=t, dtype=dt, name="mid_1x1")(x1)
        b = ConvUnit(self.c2, 1, 1, 0, train=t, dtype=dt, name="deep_1x1")(x2)
        b = upsample_bilinear(b, size=(h2 * 2, w2 * 2))
        att = jnp.concatenate([a, b], axis=-1)
        att = ConvUnit(att.shape[-1], 3, 1, 1, groups=att.shape[-1], bn_acti=True,
                       train=t, dtype=dt, name="dw1")(att)
        att = ConvUnit(self.classes, 1, 1, 0, train=t, dtype=dt, name="pw1")(att)
        att = nn.sigmoid(att)

        o = ConvUnit(x2.shape[-1], 3, 1, 1, groups=x2.shape[-1], bn_acti=True,
                     train=t, dtype=dt, name="dw2")(x2)
        o = ConvUnit(self.classes, 1, 1, 0, train=t, dtype=dt, name="pw2")(o)
        o = upsample_bilinear(o, size=(h2 * 2, w2 * 2))
        o = o * att
        return upsample_bilinear(o, size=(h2 * 8, w2 * 8))


class LMFFNet(nn.Module):
    """LMFFNet(classes=3, block_1=3, block_2=8) (lmffnet.py:283-341)."""

    classes: int = 3
    block_1: int = 3
    block_2: int = 8
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        t, dt = self.train, self.dtype
        y = ConvUnit(32, 3, 2, 1, bn_acti=True, train=t, dtype=dt, name="init_0")(x)
        y = ConvUnit(32, 3, 1, 1, bn_acti=True, train=t, dtype=dt, name="init_1")(y)
        y = ConvUnit(32, 3, 1, 1, bn_acti=True, train=t, dtype=dt, name="init_2")(y)

        down1 = avg_pool_torch(x)
        down2 = avg_pool_torch(down1)
        down3 = avg_pool_torch(down2)

        ffm_a = FFMA(t, dt, name="ffm_a")(y, down1)
        ds1 = DownSamplingBlock(ffm_a.shape[-1], 64, t, dt, name="downsample_1")(ffm_a)
        s1 = ds1
        for i in range(self.block_1):
            s1 = SEMB(64, 2, t, dt, name=f"sem_b1_{i}")(s1)
        ffm_b1 = FFMB(t, dt, name="ffm_b1")(s1, ds1, down2)

        ds2 = DownSamplingBlock(ffm_b1.shape[-1], 128, t, dt, name="downsample_2")(ffm_b1)
        dilations = [4, 4, 8, 8, 16, 16, 32, 32]
        s2 = ds2
        for i in range(self.block_2):
            s2 = SEMB(128, dilations[i], t, dt, name=f"sem_b2_{i}")(s2)
        ffm_b2 = FFMB(t, dt, name="ffm_b2")(s2, ds2, down3)

        out = MAD(self.classes, train=t, dtype=dt, name="mad")(ffm_b1, ffm_b2)
        return out.astype(jnp.float32)
