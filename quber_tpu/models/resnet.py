"""DeepLab ResNet trunks and the dual RGB-D fusion backbone (flax, NHWC).

TPU-native rebuild of the reference backbone
(/root/reference/maskrefiner/modeling/backbone/resnet.py): two ResNet-50
trunks with the 3-conv DeepLab stem, res5 dilation-2 multi-grid [1, 2, 4],
and per-stage fusion (concat-1x1-GN-ReLU followed by 3x3-GN-ReLU layers on
all but res5). The 3-channel initial-prediction offset encoding is
concatenated to BOTH trunk inputs (resnet.py:493-498), making each stem
6-channel when offsets are enabled.

Feature strides at 480x640: res2 -> 4 (120x160, 256ch), res3 -> 8 (60x80,
512ch), res5 -> 16 (30x40, 2048ch; res4 dilates instead of striding).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import ConvNorm, max_pool_same


class DeepLabStem(nn.Module):
    """3x 3x3-conv stem + maxpool, stride 4 (resnet.py:24-76)."""

    out_channels: int = 128
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.out_channels // 2
        x = ConvNorm(half, 3, strides=2, norm=self.norm, act=nn.relu,
                     train=self.train, dtype=self.dtype, name="conv1")(x)
        x = ConvNorm(half, 3, norm=self.norm, act=nn.relu,
                     train=self.train, dtype=self.dtype, name="conv2")(x)
        x = ConvNorm(self.out_channels, 3, norm=self.norm, act=nn.relu,
                     train=self.train, dtype=self.dtype, name="conv3")(x)
        return max_pool_same(x, 3, 2)


class BasicStem(nn.Module):
    """Standard 7x7 ResNet stem + maxpool (resnet.py:96-125)."""

    out_channels: int = 64
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvNorm(self.out_channels, 7, strides=2, norm=self.norm,
                     act=nn.relu, train=self.train, dtype=self.dtype, name="conv1")(x)
        return max_pool_same(x, 3, 2)


class Bottleneck(nn.Module):
    """detectron2 BottleneckBlock with stride_in_1x1 (caffe convention)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1
    stride_in_1x1: bool = True
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s2 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = ConvNorm(self.bottleneck_channels, 1, strides=s1, norm=self.norm,
                       act=nn.relu, train=self.train, dtype=self.dtype, name="conv1")(x)
        out = ConvNorm(self.bottleneck_channels, 3, strides=s2,
                       dilation=self.dilation, norm=self.norm, act=nn.relu,
                       train=self.train, dtype=self.dtype, name="conv2")(out)
        out = ConvNorm(self.out_channels, 1, norm=self.norm, act=None,
                       train=self.train, dtype=self.dtype, name="conv3")(out)
        if x.shape[-1] != self.out_channels:
            x = ConvNorm(self.out_channels, 1, strides=self.stride,
                         norm=self.norm, act=None, train=self.train,
                         dtype=self.dtype, name="shortcut")(x)
        return nn.relu(out + x)


# ResNet-depth -> blocks per stage (resnet.py:408). Depth 14 is a one-
# bottleneck-per-stage variant with the same stem/stage/fusion structure,
# used by the virtual-CPU-mesh tests: XLA:CPU aborts a collective when the
# participating device threads arrive >40 s apart, which the full-depth
# model triggers on single-core hosts.
BLOCKS_PER_STAGE = {
    14: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class ResNetTrunk(nn.Module):
    """One DeepLab-ResNet trunk returning {res2, res3, res5} features.

    Mirrors build_resnet_deeplab_fusion_backbone (resnet.py:358-449):
    res4_dilation=1, res5_dilation=2 with multi-grid, stride-1 res5.
    """

    depth: int = 50
    stem_type: str = "deeplab"
    stem_out_channels: int = 128
    res2_out_channels: int = 256
    res5_dilation: int = 2
    res5_multi_grid: Sequence[int] = (1, 2, 4)
    out_features: Sequence[str] = ("res2", "res3", "res5")
    norm: str = "FrozenBN"
    remat: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        stem_cls = DeepLabStem if self.stem_type == "deeplab" else BasicStem
        x = stem_cls(self.stem_out_channels, self.norm, self.train, self.dtype,
                     name="stem")(x)

        # remat trades FLOPs for activation memory: recompute each block's
        # activations in the backward pass instead of stashing them (the
        # dual-trunk backbone dominates the training-time activation set)
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck

        num_blocks = BLOCKS_PER_STAGE[self.depth]
        out_channels = self.res2_out_channels
        bottleneck = out_channels // 4
        outputs = {}
        max_stage = max({"res2": 2, "res3": 3, "res4": 4, "res5": 5}[f] for f in self.out_features)
        for idx, stage_idx in enumerate(range(2, max_stage + 1)):
            name = f"res{stage_idx}"
            dilation = self.res5_dilation if stage_idx == 5 else 1
            first_stride = 1 if (idx == 0 or dilation > 1) else 2
            for b in range(num_blocks[idx]):
                if stage_idx == 5:
                    block_dilation = dilation * self.res5_multi_grid[b]
                else:
                    block_dilation = dilation
                x = block_cls(
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck,
                    stride=first_stride if b == 0 else 1,
                    dilation=block_dilation,
                    norm=self.norm,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"{name}_{b}",
                )(x)
            if name in self.out_features:
                outputs[name] = x
            out_channels *= 2
            bottleneck *= 2
        return outputs


class SingleTrunkBackbone(nn.Module):
    """Single-modality backbone (the reference's rgb-only / depth-only
    ablations use build_resnet_deeplab_fusion_backbone directly,
    resnet.py:358-449 + mask-refiner-rgb-only.yaml)."""

    depth: int = 50
    out_features: Sequence[str] = ("res2", "res3", "res5")
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return ResNetTrunk(
            depth=self.depth, out_features=self.out_features, norm=self.norm,
            train=self.train, dtype=self.dtype, name="trunk",
        )(x)


class RGBDFusionBackbone(nn.Module):
    """Dual-trunk RGB-D backbone with per-stage fusion (resnet.py:453-519).

    Input: [B, H, W, 6 or 9] — rgb(3) + depth(3) [+ offset encoding(3)].
    The offset channels are appended to both trunk inputs. Fusion per stage:
      concat: 1x1 conv (2C->C) + GN32 + ReLU, then N x (3x3 conv + GN + ReLU)
      add:    elementwise sum, then the same 3x3 stack
    with the 3x3 stack skipped on res5 (mirroring resnet.py:479-484).
    """

    fusion_strategy: str = "concat"
    num_fusion_layers: int = 2
    depth: int = 50
    out_features: Sequence[str] = ("res2", "res3", "res5")
    norm: str = "FrozenBN"
    offset_input: bool = True
    remat: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        rgb = x[..., 0:3]
        depth = x[..., 3:6]
        if self.offset_input:
            offset = x[..., 6:]
            rgb = jnp.concatenate([rgb, offset], axis=-1)
            depth = jnp.concatenate([depth, offset], axis=-1)

        trunk_kwargs = dict(
            depth=self.depth, out_features=self.out_features, norm=self.norm,
            remat=self.remat, train=self.train, dtype=self.dtype,
        )
        rgb_out = ResNetTrunk(**trunk_kwargs, name="rgb_trunk")(rgb)
        depth_out = ResNetTrunk(**trunk_kwargs, name="depth_trunk")(depth)

        fused = {}
        for f in self.out_features:
            c = rgb_out[f].shape[-1]
            if self.fusion_strategy == "concat":
                y = jnp.concatenate([rgb_out[f], depth_out[f]], axis=-1)
                y = ConvNorm(c, 1, use_bias=True, norm="GN", act=nn.relu,
                             train=self.train, dtype=self.dtype,
                             name=f"fusion_{f}_reduce")(y)
            elif self.fusion_strategy == "add":
                y = rgb_out[f] + depth_out[f]
            else:
                raise ValueError(self.fusion_strategy)
            if f != "res5":
                for i in range(self.num_fusion_layers):
                    y = ConvNorm(c, 3, use_bias=True, norm="GN", act=nn.relu,
                                 train=self.train, dtype=self.dtype,
                                 name=f"fusion_{f}_conv{i}")(y)
            fused[f] = y
        return fused
