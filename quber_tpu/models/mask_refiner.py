"""The QuBER MaskRefiner meta-architecture: config, forward, losses.

TPU-native rebuild of /root/reference/maskrefiner/modeling/mask_refiner/
model.py:74-358 (meta-arch) and :766-802 (losses). Defaults correspond to the
flagship config `mask-refiner-rgbd-concat-l2-gn-hf-m-b-f-c-o-l3-e2-b8.yaml`
over `Base-Mask-Refiner.yaml`.

Inputs are NHWC: a 6-channel image (BGR + 3x normalized depth, matching the
reference's detectron2 BGR convention and PIXEL_MEAN/STD, Base yaml:12-13)
plus the 3-channel initial-prediction offset encoding, concatenated to 9
channels before the dual-trunk backbone.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.heads import ERROR_TYPE_CHANNELS, InsEmbedHead
from quber_tpu.models.layers import upsample_bilinear
from quber_tpu.models.resnet import RGBDFusionBackbone


@dataclasses.dataclass(frozen=True)
class MaskRefinerConfig:
    # input
    height: int = 480
    width: int = 640
    rgb_on: bool = True
    depth_on: bool = True
    offset_input_on: bool = True
    pixel_mean: Sequence[float] = (103.530, 116.280, 123.675, 127.5, 127.5, 127.5)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    # backbone
    resnet_depth: int = 50
    backbone_norm: str = "FrozenBN"
    fusion_strategy: str = "concat"
    num_backbone_fusion_layers: int = 2
    # head
    in_features: Sequence[str] = ("res2", "res3", "res5")
    project_channels: Sequence[int] = (32, 64)
    aspp_channels: int = 256
    aspp_dilations: Sequence[int] = (6, 12, 18)
    aspp_dropout: float = 0.1
    convs_dim: int = 128
    head_channels: int = 32
    common_stride: int = 4
    norm: str = "GN"
    # decoder AND prediction heads both follow
    # MODEL.SEM_SEG_HEAD.USE_DEPTHWISE_SEPARABLE_CONV (default False):
    # the head's from_config wires that flag (model.py:637) into
    # self.use_depthwise_separable_conv used at :515-561. (The
    # PANOPTIC_DEEPLAB.USE_DEPTHWISE_SEPARABLE_CONV=True read at
    # model.py:98 is an unused meta-arch leftover.) The split here keeps
    # the two independently settable.
    use_depthwise_separable_conv: bool = False
    head_depthwise_separable: bool = False
    # error estimation
    eee_mask_on: bool = True
    eee_boundary_on: bool = True
    error_type: str = "e2"
    hierarchical_fusion_on: bool = True
    hierarchy: Sequence[Sequence[str]] = (
        ("eee_mask",), ("eee_boundary",), ("foreground",), ("center",), ("offset",)
    )
    num_head_fusion_layers: int = 3
    fusion_target: Sequence[str] = ("feat", "pred")
    # losses
    foreground_loss_type: str = "hard_pixel_mining"
    foreground_loss_top_k: float = 1.0
    foreground_loss_weight: float = 1.0
    center_loss_weight: float = 200.0
    offset_loss_weight: float = 0.01
    eee_mask_loss_weight: float = 1.0
    eee_boundary_loss_weight: float = 1.0
    # post-processing (Base yaml PANOPTIC_DEEPLAB block)
    center_threshold: float = 0.3
    nms_kernel: int = 7
    top_k_instances: int = 200
    stuff_area: int = 2048
    min_instance_area: int = 512
    # adaptive grouping: when every frame's NMS survivor count fits in
    # fast_top_k, grouping + merge run at K=fast_top_k under a lax.cond
    # (identical selection — survivors are row-major sorted with valids
    # first, so the slice keeps them all) and only spill to the full
    # top_k_instances pipeline on crowded frames. The O(K*H*W) distance
    # argmin, the [*, K] one-hot stats matmul, and the K-entry relabel
    # chain all scale with the executed K. 0 disables.
    fast_top_k: int = 32
    # compute
    dtype: str = "float32"
    # rematerialize backbone blocks in the backward pass (training memory)
    remat_backbone: bool = False
    # None = auto (Pallas grouping kernel on TPU, XLA path elsewhere)
    use_pallas_grouping: bool | None = None

    @property
    def eee_channels(self) -> int:
        return ERROR_TYPE_CHANNELS[self.error_type]

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def num_input_channels(self) -> int:
        c = 0
        if self.rgb_on:
            c += 3
        if self.depth_on:
            c += 3
        if self.offset_input_on:
            c += 3
        return c


class MaskRefiner(nn.Module):
    """Backbone + hierarchical head. Returns full-resolution outputs.

    __call__(images [B,H,W,6], offset_enc [B,H,W,3] | None) -> dict:
      foreground [B,H,W,1] logits, center [B,H,W,1], offset [B,H,W,2]
      (scaled to pixel units, model.py:695-700), eee_mask / eee_boundary
      [B,H,W,C] logits. With `full_res=False` the raw stride-4 head outputs
      are returned instead (the training path: losses upsample internally,
      model.py:677-686).
    """

    config: MaskRefinerConfig = MaskRefinerConfig()
    train: bool = False

    @nn.compact
    def __call__(self, images, offset_enc=None, full_res=True):
        cfg = self.config
        dtype = cfg.compute_dtype
        # modality selection lives HERE, not in callers: data pipelines and
        # predictors always hand the packed 6-ch RGBD frame, and a
        # single-modality ablation (rgb-only / depth-only) takes its slice —
        # the reference equivalently narrows the stem via INPUT.DEPTH_ON
        # (mask-refiner-rgb-only.yaml + model.py:90-91 pixel stats). A
        # caller that already sliced (3-ch input) passes through.
        lo, hi = 0, 6
        if not cfg.rgb_on:
            lo = 3
        if not cfg.depth_on:
            hi = 3
        if images.shape[-1] == 6 and (lo, hi) != (0, 6):
            images = images[..., lo:hi]
        mean = jnp.asarray(cfg.pixel_mean[lo:hi][: images.shape[-1]], jnp.float32)
        std = jnp.asarray(cfg.pixel_std[lo:hi][: images.shape[-1]], jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        if cfg.offset_input_on:
            assert offset_enc is not None
            x = jnp.concatenate([x, offset_enc.astype(jnp.float32)], axis=-1)
        x = x.astype(dtype)

        if cfg.rgb_on and cfg.depth_on:
            features = RGBDFusionBackbone(
                fusion_strategy=cfg.fusion_strategy,
                num_fusion_layers=cfg.num_backbone_fusion_layers,
                depth=cfg.resnet_depth,
                out_features=tuple(cfg.in_features),
                norm=cfg.backbone_norm,
                offset_input=cfg.offset_input_on,
                remat=cfg.remat_backbone,
                train=self.train,
                dtype=dtype,
                name="backbone",
            )(x)
        else:
            # single-modality ablations (rgb-only / depth-only)
            from quber_tpu.models.resnet import SingleTrunkBackbone

            features = SingleTrunkBackbone(
                depth=cfg.resnet_depth,
                out_features=tuple(cfg.in_features),
                norm=cfg.backbone_norm,
                train=self.train,
                dtype=dtype,
                name="backbone",
            )(x)

        outputs = InsEmbedHead(
            in_features=tuple(cfg.in_features),
            project_channels=tuple(cfg.project_channels),
            aspp_channels=cfg.aspp_channels,
            aspp_dilations=tuple(cfg.aspp_dilations),
            aspp_dropout=cfg.aspp_dropout,
            convs_dim=cfg.convs_dim,
            head_channels=cfg.head_channels,
            norm=cfg.norm,
            use_depthwise_separable_conv=cfg.use_depthwise_separable_conv,
            head_depthwise_separable=cfg.head_depthwise_separable,
            eee_mask_on=cfg.eee_mask_on,
            eee_boundary_on=cfg.eee_boundary_on,
            error_type=cfg.error_type,
            hierarchical_fusion_on=cfg.hierarchical_fusion_on,
            hierarchy=tuple(tuple(h) for h in cfg.hierarchy),
            num_fusion_layers=cfg.num_head_fusion_layers,
            fusion_target=tuple(cfg.fusion_target),
            train=self.train,
            dtype=dtype,
            name="ins_embed_head",
        )(features)

        outputs = {k: v.astype(jnp.float32) for k, v in outputs.items()}
        if not full_res:
            return outputs
        return upsample_outputs(outputs, cfg.common_stride)


def upsample_outputs(outputs: dict, common_stride: int) -> dict:
    """x4 bilinear upsample of all heads; offsets scaled to pixel units."""
    up = {k: upsample_bilinear(v, scale=common_stride) for k, v in outputs.items()}
    if "offset" in up:
        up["offset"] = up["offset"] * common_stride
    return up


# ---------------------------------------------------------------------------
# Losses (model.py:36-72, 529-572, 677-686, 766-802)
# ---------------------------------------------------------------------------

def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def foreground_loss(logits, targets, weights=None, top_k: float = 1.0):
    """Hard-pixel-mining BCE (DeepLabBCE, model.py:36-72).

    logits [B,H,W] raw; targets {0,1}; weights multiply per-pixel losses.
    top_k < 1 keeps only the largest top_k fraction of pixel losses.
    """
    pixel = _bce_with_logits(logits, targets.astype(jnp.float32))
    if weights is not None:
        pixel = pixel * weights
    flat = pixel.reshape(-1)
    if top_k >= 1.0:
        return jnp.mean(flat)
    k = max(1, int(top_k * flat.shape[0]))
    vals, _ = jax.lax.top_k(flat, k)
    return jnp.mean(vals)


def weighted_mse_loss(pred, target, weights):
    """Center loss: sum(mse * w) / sum(w) (model.py:777-787)."""
    loss = (pred - target) ** 2 * weights
    wsum = jnp.sum(weights)
    return jnp.where(wsum > 0, jnp.sum(loss) / jnp.maximum(wsum, 1.0), 0.0)


def weighted_l1_loss(pred, target, weights):
    """Offset loss: sum(|d| * w) / sum(w); w broadcasts over the 2 offset
    channels but its normalizing sum is counted once (model.py:789-802)."""
    loss = jnp.abs(pred - target) * weights
    wsum = jnp.sum(weights)
    return jnp.where(wsum > 0, jnp.sum(loss) / jnp.maximum(wsum, 1.0), 0.0)


def dice_loss(logits, targets, smooth: float = 1e-5):
    """Softmax Dice over the channel axis, mean over (batch, channel).

    Matches monai.losses.DiceLoss(softmax=True) defaults as used for the EEE
    heads (model.py:558,572): include_background, smooth_nr = smooth_dr = 1e-5.
    logits/targets: [B, H, W, C].
    """
    p = jax.nn.softmax(logits, axis=-1)
    t = targets.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=(1, 2))
    denom = jnp.sum(p, axis=(1, 2)) + jnp.sum(t, axis=(1, 2))
    dice = 1.0 - (2.0 * inter + smooth) / (denom + smooth)
    return jnp.mean(dice)


def assemble_eee_targets(tp, tn, fp, fn, error_type: str):
    """Stack the 4 error maps into the error_type channel layout
    (model.py:185-229). Inputs [..., H, W]; output [..., H, W, C]."""
    if error_type == "e3":
        chans = [tp, tn, fp, fn]
    elif error_type == "e2":
        chans = [tp + tn, fp + fn]
    elif error_type == "e33":
        chans = [tp + tn, fp, fn]
    elif error_type == "e32":
        chans = [fp, fn]
    else:
        raise ValueError(error_type)
    return jnp.stack(chans, axis=-1)


def compute_losses(outputs: dict, targets: dict, cfg: MaskRefinerConfig) -> dict:
    """All training losses from stride-4 head outputs + full-res targets.

    outputs: raw head dict (full_res=False). targets:
      sem_seg [B,H,W], sem_seg_weights [B,H,W] (optional), center [B,H,W],
      center_weights [B,H,W], offset [B,H,W,2], offset_weights [B,H,W],
      eee_mask / eee_boundary [B,H,W,C].
    """
    s = cfg.common_stride
    losses = {}

    fg = upsample_bilinear(outputs["foreground"], scale=s)[..., 0]
    losses["loss_sem_seg"] = (
        foreground_loss(fg, targets["sem_seg"], targets.get("sem_seg_weights"),
                        cfg.foreground_loss_top_k)
        * cfg.foreground_loss_weight
    )

    center = upsample_bilinear(outputs["center"], scale=s)[..., 0]
    losses["loss_center"] = (
        weighted_mse_loss(center, targets["center"], targets["center_weights"])
        * cfg.center_loss_weight
    )

    offset = upsample_bilinear(outputs["offset"], scale=s) * s
    losses["loss_offset"] = (
        weighted_l1_loss(offset, targets["offset"], targets["offset_weights"][..., None])
        * cfg.offset_loss_weight
    )

    if cfg.eee_mask_on:
        pred = upsample_bilinear(outputs["eee_mask"], scale=s)
        losses["loss_eee_mask"] = (
            dice_loss(pred, targets["eee_mask"]) * cfg.eee_mask_loss_weight
        )
    if cfg.eee_boundary_on:
        pred = upsample_bilinear(outputs["eee_boundary"], scale=s)
        losses["loss_eee_boundary"] = (
            dice_loss(pred, targets["eee_boundary"]) * cfg.eee_boundary_loss_weight
        )
    return losses
