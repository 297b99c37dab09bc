"""CGNet foreground segmenter (flax, NHWC).

Rebuild of the Context-Guided Network used as QuBER's RGB-D foreground
filter (/root/reference/foreground_segmentation/cgnet.py:275-368, wrapper
predictor.py:21-52): 4-channel input (ImageNet-standardized RGB + depth/255)
at 320x240, 2 classes (bg / object fg), ~0.5M params. Output logits are
bilinearly upsampled back to the input size.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import PReLU, avg_pool_torch, upsample_bilinear


class ConvBNPReLU(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-3, name="bn")(x)
        return PReLU(name="act")(x)


class BNPReLU(nn.Module):
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-3, name="bn")(x)
        return PReLU(name="act")(x)


class FGlo(nn.Module):
    """Global-context SE gate (cgnet.py:174-192)."""

    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(c // self.reduction, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class CGBlockDown(nn.Module):
    """Downsampling context-guided block (cgnet.py:194-228)."""

    features: int
    dilation: int = 2
    reduction: int = 16
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.features
        x = ConvBNPReLU(n, 3, 2, self.train, self.dtype, name="conv1x1")(x)
        loc = nn.Conv(n, (3, 3), padding=1, feature_group_count=n, use_bias=False,
                      dtype=self.dtype, name="f_loc")(x)
        sur = nn.Conv(n, (3, 3), padding=self.dilation,
                      kernel_dilation=(self.dilation, self.dilation),
                      feature_group_count=n, use_bias=False, dtype=self.dtype,
                      name="f_sur")(x)
        joi = jnp.concatenate([loc, sur], axis=-1)
        joi = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                           epsilon=1e-3, name="bn")(joi)
        joi = PReLU(name="act")(joi)
        joi = nn.Conv(n, (1, 1), use_bias=False, dtype=self.dtype, name="reduce")(joi)
        return FGlo(self.reduction, self.dtype, name="f_glo")(joi)


class CGBlock(nn.Module):
    """Residual context-guided block (cgnet.py:231-261)."""

    features: int
    dilation: int = 2
    reduction: int = 16
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.features // 2
        y = ConvBNPReLU(n, 1, 1, self.train, self.dtype, name="conv1x1")(x)
        loc = nn.Conv(n, (3, 3), padding=1, feature_group_count=n, use_bias=False,
                      dtype=self.dtype, name="f_loc")(y)
        sur = nn.Conv(n, (3, 3), padding=self.dilation,
                      kernel_dilation=(self.dilation, self.dilation),
                      feature_group_count=n, use_bias=False, dtype=self.dtype,
                      name="f_sur")(y)
        joi = jnp.concatenate([loc, sur], axis=-1)
        joi = BNPReLU(self.train, name="bn_prelu")(joi)
        out = FGlo(self.reduction, self.dtype, name="f_glo")(joi)
        return x + out


class InputInjection(nn.Module):
    ratio: int = 1

    def __call__(self, x):
        for _ in range(self.ratio):
            x = avg_pool_torch(x, 3, 2, 1)
        return x


class CGNet(nn.Module):
    """Context_Guided_Network(classes, in_channel, M, N) (cgnet.py:275-368)."""

    classes: int = 2
    in_channels: int = 4
    m: int = 3
    n: int = 21
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        t, d = self.train, self.dtype

        out0 = ConvBNPReLU(32, 3, 2, t, d, name="level1_0")(x)
        out0 = ConvBNPReLU(32, 3, 1, t, d, name="level1_1")(out0)
        out0 = ConvBNPReLU(32, 3, 1, t, d, name="level1_2")(out0)
        inp1 = InputInjection(1, name="sample1")(x)
        inp2 = InputInjection(2, name="sample2")(x)

        cat0 = BNPReLU(t, name="b1")(jnp.concatenate([out0, inp1], axis=-1))
        out1_0 = CGBlockDown(64, 2, 8, t, d, name="level2_0")(cat0)
        out1 = out1_0
        for i in range(self.m - 1):
            out1 = CGBlock(64, 2, 8, t, d, name=f"level2_{i + 1}")(out1)
        cat1 = BNPReLU(t, name="bn_prelu_2")(
            jnp.concatenate([out1, out1_0, inp2], axis=-1)
        )

        out2_0 = CGBlockDown(128, 4, 16, t, d, name="level3_0")(cat1)
        out2 = out2_0
        for i in range(self.n - 1):
            out2 = CGBlock(128, 4, 16, t, d, name=f"level3_{i + 1}")(out2)
        cat2 = BNPReLU(t, name="bn_prelu_3")(
            jnp.concatenate([out2_0, out2], axis=-1)
        )

        logits = nn.Conv(self.classes, (1, 1), use_bias=False, dtype=d,
                         name="classifier")(cat2)
        return upsample_bilinear(logits.astype(jnp.float32), size=(h, w))
