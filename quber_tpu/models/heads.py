"""DeepLabV3+ decoder and the hierarchical QuBER instance-embedding head.

TPU-native rebuild of MaskRefinerInsEmbedHead
(/root/reference/maskrefiner/modeling/mask_refiner/model.py:361-764), which
subclasses detectron2's DeepLabV3PlusHead. Semantics preserved:

  * decoder: ASPP on the deepest feature, then top-down project(1x1)+concat+
    fuse(2x 3x3) refinement to stride `common_stride`
  * five prediction heads (eee_mask, eee_boundary, foreground, center,
    offset), each = SinglePredictionHead (2x 3x3 conv + GN + ReLU, 128->32)
    followed by a 1x1 predictor
  * hierarchical fusion (model.py:740-762): each hierarchy level concatenates
    the decoder feature with the previous level's head features ("feat") and
    softmax/sigmoid predictions ("pred"), then runs FusionLayers
    (1x1 conv + BN + ReLU followed by N x 3x3 conv + BN + ReLU — note the
    reference hardcodes BatchNorm here, model.py:437,449)
  * error_type channel widths: e3 -> 4 (TP,TN,FP,FN), e33 -> 3, e2/e32 -> 2
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import (
    ASPP,
    ConvNorm,
    DepthwiseSeparableConv,
    upsample_bilinear,
)

ERROR_TYPE_CHANNELS = {"e3": 4, "e33": 3, "e2": 2, "e32": 2}

HEAD_OUT_CHANNELS = {"foreground": 1, "center": 1, "offset": 2}


def head_out_channels(name: str, error_type: str) -> int:
    if "eee" in name:
        return ERROR_TYPE_CHANNELS[error_type]
    return HEAD_OUT_CHANNELS[name]


class SinglePredictionHead(nn.Module):
    """Two 3x3 convs (norm+ReLU) or a 5x5 depthwise-separable block
    (model.py:369-411)."""

    head_channels: int = 32
    norm: str = "GN"
    use_depthwise_separable_conv: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_bias = self.norm == ""
        if self.use_depthwise_separable_conv:
            return DepthwiseSeparableConv(
                self.head_channels, 5, self.norm, self.train, self.dtype, name="dws"
            )(x)
        c = x.shape[-1]
        x = ConvNorm(c, 3, use_bias=use_bias, norm=self.norm, act=nn.relu,
                     train=self.train, dtype=self.dtype, name="conv0")(x)
        x = ConvNorm(self.head_channels, 3, use_bias=use_bias, norm=self.norm,
                     act=nn.relu, train=self.train, dtype=self.dtype, name="conv1")(x)
        return x


class FusionLayers(nn.Module):
    """1x1 channel-reduce + N x 3x3 refine, BatchNorm throughout
    (model.py:424-458)."""

    out_channels: int = 128
    num_layers: int = 3
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvNorm(self.out_channels, 1, use_bias=True, norm="BN", act=nn.relu,
                     train=self.train, dtype=self.dtype, name="reduce")(x)
        for i in range(self.num_layers):
            x = ConvNorm(self.out_channels, 3, use_bias=True, norm="BN",
                         act=nn.relu, train=self.train, dtype=self.dtype,
                         name=f"conv{i}")(x)
        return x


class DeepLabV3PlusDecoder(nn.Module):
    """Top-down decoder: ASPP on res5, project+fuse on res3/res2."""

    in_features: Sequence[str] = ("res2", "res3", "res5")
    project_channels: Sequence[int] = (32, 64)
    aspp_channels: int = 256
    aspp_dilations: Sequence[int] = (6, 12, 18)
    aspp_dropout: float = 0.1
    convs_dim: int = 128
    norm: str = "GN"
    use_depthwise_separable_conv: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: dict) -> jnp.ndarray:
        use_bias = self.norm == ""
        names = list(self.in_features)
        decoder_channels = [self.convs_dim] * (len(names) - 1) + [self.aspp_channels]

        y = None
        for idx in reversed(range(len(names))):
            f = names[idx]
            x = features[f]
            if idx == len(names) - 1:
                y = ASPP(self.aspp_channels, self.aspp_dilations, self.norm,
                         self.aspp_dropout, self.train, self.dtype,
                         name=f"aspp_{f}")(x)
            else:
                proj = ConvNorm(self.project_channels[idx], 1, use_bias=use_bias,
                                norm=self.norm, act=nn.relu, train=self.train,
                                dtype=self.dtype, name=f"project_{f}")(x)
                y = upsample_bilinear(y, size=(proj.shape[1], proj.shape[2]))
                y = jnp.concatenate([proj, y], axis=-1)
                if self.use_depthwise_separable_conv:
                    y = DepthwiseSeparableConv(decoder_channels[idx], 5, self.norm,
                                               self.train, self.dtype,
                                               name=f"fuse_{f}")(y)
                else:
                    y = ConvNorm(decoder_channels[idx], 3, use_bias=use_bias,
                                 norm=self.norm, act=nn.relu, train=self.train,
                                 dtype=self.dtype, name=f"fuse_{f}_0")(y)
                    y = ConvNorm(decoder_channels[idx], 3, use_bias=use_bias,
                                 norm=self.norm, act=nn.relu, train=self.train,
                                 dtype=self.dtype, name=f"fuse_{f}_1")(y)
        return y


class InsEmbedHead(nn.Module):
    """Hierarchical 5-head QuBER prediction head over the decoder feature.

    Returns a dict of stride-`common_stride` logits:
      foreground [B,h,w,1], center [B,h,w,1], offset [B,h,w,2],
      eee_mask / eee_boundary [B,h,w,C(error_type)] when enabled.
    """

    in_features: Sequence[str] = ("res2", "res3", "res5")
    project_channels: Sequence[int] = (32, 64)
    aspp_channels: int = 256
    aspp_dilations: Sequence[int] = (6, 12, 18)
    aspp_dropout: float = 0.1
    convs_dim: int = 128
    head_channels: int = 32
    norm: str = "GN"
    use_depthwise_separable_conv: bool = False
    eee_mask_on: bool = True
    eee_boundary_on: bool = True
    error_type: str = "e2"
    hierarchical_fusion_on: bool = True
    hierarchy: Sequence[Sequence[str]] = (
        ("eee_mask",), ("eee_boundary",), ("foreground",), ("center",), ("offset",)
    )
    num_fusion_layers: int = 3
    fusion_target: Sequence[str] = ("feat", "pred")
    head_depthwise_separable: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    def _pred_head(self, name):
        return SinglePredictionHead(
            self.head_channels, self.norm, self.head_depthwise_separable,
            self.train, self.dtype, name=f"{name}_head",
        )

    def _predictor(self, name):
        return nn.Conv(
            head_out_channels(name, self.error_type), (1, 1), use_bias=True,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name=f"{name}_predictor",
        )

    @nn.compact
    def __call__(self, features: dict) -> dict:
        y = DeepLabV3PlusDecoder(
            self.in_features, self.project_channels, self.aspp_channels,
            self.aspp_dilations, self.aspp_dropout, self.convs_dim, self.norm,
            self.use_depthwise_separable_conv, self.train, self.dtype,
            name="decoder",
        )(features)

        head_names = ["foreground", "center", "offset"]
        if self.eee_mask_on:
            head_names.insert(0, "eee_mask")
        if self.eee_boundary_on:
            head_names.insert(1 if self.eee_mask_on else 0, "eee_boundary")

        outputs = {}
        if not self.hierarchical_fusion_on:
            for name in head_names:
                feat = self._pred_head(name)(y)
                outputs[name] = self._predictor(name)(feat)
            return outputs

        feats = {}
        hierarchy = [list(level) for level in self.hierarchy]
        for i, level in enumerate(hierarchy):
            if i == 0:
                src = y
            else:
                # Fuse the decoder feature with the previous level's head
                # features and activated predictions (model.py:746-759; the
                # code concatenates "feat" first, then "pred").
                parts = [y]
                if "feat" in self.fusion_target:
                    for prev in hierarchy[i - 1]:
                        parts.append(feats[prev])
                if "pred" in self.fusion_target:
                    for prev in hierarchy[i - 1]:
                        p = outputs[prev]
                        p = nn.softmax(p, axis=-1) if "eee" in prev else nn.sigmoid(p)
                        parts.append(p)
                src = FusionLayers(self.convs_dim, self.num_fusion_layers,
                                   self.train, self.dtype, name=f"fusion_{i}")(
                    jnp.concatenate(parts, axis=-1)
                )
            for name in level:
                feats[name] = self._pred_head(name)(src)
                outputs[name] = self._predictor(name)(feats[name])
        return outputs
