"""Stock Panoptic-DeepLab meta-architecture (the reference's ablation baseline).

Rebuild of /root/reference/maskrefiner/modeling/panoptic_deeplab/
panoptic_seg.py (trained via the Panoptic-DeepLab-*.yaml configs as the
no-error-estimation baseline): TWO independent DeepLabV3+ decoders over the
shared backbone features — a semantic head (256 head channels, hard-pixel-
mining BCE with top-k 0.2) and an instance-embedding head (center + offset,
32 head channels) — with the same grouping post-process as the refiner.

In the QuBER setting "semantic" is binary foreground. Unlike the refiner,
the baseline takes no initial-prediction offset encoding (it is a plain
segmenter, not a refiner).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.heads import DeepLabV3PlusDecoder, SinglePredictionHead
from quber_tpu.models.layers import upsample_bilinear
from quber_tpu.models.mask_refiner import (
    MaskRefinerConfig,
    foreground_loss,
    weighted_l1_loss,
    weighted_mse_loss,
)
from quber_tpu.models.resnet import RGBDFusionBackbone


@dataclasses.dataclass(frozen=True)
class PanopticDeepLabConfig(MaskRefinerConfig):
    offset_input_on: bool = False
    eee_mask_on: bool = False
    eee_boundary_on: bool = False
    hierarchical_fusion_on: bool = False
    sem_seg_head_channels: int = 256    # SEM_SEG_HEAD.HEAD_CHANNELS
    foreground_loss_top_k: float = 0.2  # SEM_SEG_HEAD.LOSS_TOP_K


class PanopticDeepLab(nn.Module):
    """forward(images [B,H,W,6]) -> {foreground, center, offset} full-res."""

    config: PanopticDeepLabConfig = PanopticDeepLabConfig()
    train: bool = False

    @nn.compact
    def __call__(self, images, full_res=True):
        cfg = self.config
        dtype = cfg.compute_dtype
        mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(cfg.pixel_std, jnp.float32)
        x = ((images.astype(jnp.float32) - mean) / std).astype(dtype)

        features = RGBDFusionBackbone(
            fusion_strategy=cfg.fusion_strategy,
            num_fusion_layers=cfg.num_backbone_fusion_layers,
            depth=cfg.resnet_depth,
            out_features=tuple(cfg.in_features),
            norm=cfg.backbone_norm,
            offset_input=False,
            train=self.train,
            dtype=dtype,
            name="backbone",
        )(x)

        decoder_kwargs = dict(
            in_features=tuple(cfg.in_features),
            project_channels=tuple(cfg.project_channels),
            aspp_channels=cfg.aspp_channels,
            aspp_dilations=tuple(cfg.aspp_dilations),
            aspp_dropout=cfg.aspp_dropout,
            convs_dim=cfg.convs_dim,
            norm=cfg.norm,
            use_depthwise_separable_conv=cfg.use_depthwise_separable_conv,
            train=self.train,
            dtype=dtype,
        )
        # semantic branch (its own decoder, panoptic_seg.py SemSegHead)
        y_sem = DeepLabV3PlusDecoder(**decoder_kwargs, name="sem_decoder")(features)
        f_sem = SinglePredictionHead(cfg.sem_seg_head_channels, cfg.norm,
                                     cfg.use_depthwise_separable_conv,
                                     self.train, dtype, name="sem_head")(y_sem)
        fg = nn.Conv(1, (1, 1), dtype=dtype, name="sem_predictor")(f_sem)

        # instance branch (center + offset, panoptic_seg.py InsEmbedHead)
        y_ins = DeepLabV3PlusDecoder(**decoder_kwargs, name="ins_decoder")(features)
        f_c = SinglePredictionHead(cfg.head_channels, cfg.norm,
                                   cfg.use_depthwise_separable_conv,
                                   self.train, dtype, name="center_head")(y_ins)
        center = nn.Conv(1, (1, 1), dtype=dtype, name="center_predictor")(f_c)
        f_o = SinglePredictionHead(cfg.head_channels, cfg.norm,
                                   cfg.use_depthwise_separable_conv,
                                   self.train, dtype, name="offset_head")(y_ins)
        offset = nn.Conv(2, (1, 1), dtype=dtype, name="offset_predictor")(f_o)

        out = {
            "foreground": fg.astype(jnp.float32),
            "center": center.astype(jnp.float32),
            "offset": offset.astype(jnp.float32),
        }
        if not full_res:
            return out
        s = cfg.common_stride
        out = {k: upsample_bilinear(v, scale=s) for k, v in out.items()}
        out["offset"] = out["offset"] * s
        return out


def compute_pd_losses(outputs: dict, targets: dict, cfg: PanopticDeepLabConfig) -> dict:
    s = cfg.common_stride
    fg = upsample_bilinear(outputs["foreground"], scale=s)[..., 0]
    center = upsample_bilinear(outputs["center"], scale=s)[..., 0]
    offset = upsample_bilinear(outputs["offset"], scale=s) * s
    return {
        "loss_sem_seg": foreground_loss(
            fg, targets["sem_seg"], targets.get("sem_seg_weights"),
            cfg.foreground_loss_top_k) * cfg.foreground_loss_weight,
        "loss_center": weighted_mse_loss(
            center, targets["center"], targets["center_weights"]) * cfg.center_loss_weight,
        "loss_offset": weighted_l1_loss(
            offset, targets["offset"], targets["offset_weights"][..., None]) * cfg.offset_loss_weight,
    }
