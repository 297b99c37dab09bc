"""UOAIS-Net-class base segmenter: RGB-D FPN Mask-RCNN with amodal heads.

TPU-native rebuild of the reference's UOAIS-Net
(/root/reference/ext_modules/uoais: adet/modeling/rcnn/rcnn_heads.py
ORCNNROIHeads, backbones rgbdfpn/resnet_depth/cbam, config
R50_rgbdconcat_mlc_occatmask_hom_concat.yaml; wrapped at
eval/base_model.py:174-222): a two-stage detector with

  * dual R50 trunks fused per level by CBAM (channel + spatial attention)
  * FPN (lateral 1x1 + top-down + 3x3 output convs)
  * RPN with fixed-shape proposal selection (top-k + NMS scan —
    the ml_nms.cu replacement lives in quber_tpu.ops.boxes)
  * ROI heads: box head (2 FC) and THREE mask heads on ROI-aligned
    features — visible mask, amodal mask, and occlusion prediction
    (the reference's ORCNN hierarchy: occlusion = amodal minus visible)

Everything is fixed-shape: proposals padded to MAX_PROPOSALS, detections to
MAX_DETECTIONS, with validity masks.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import ConvNorm, upsample_bilinear
from quber_tpu.models.resnet import ResNetTrunk
from quber_tpu.ops import boxes as box_ops


class CBAM(nn.Module):
    """Convolutional block attention: channel gate + spatial gate
    (adet/modeling/backbone/cbam.py semantics)."""

    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        mlp1 = nn.Dense(c // self.reduction, dtype=self.dtype, name="fc1")
        mlp2 = nn.Dense(c, dtype=self.dtype, name="fc2")
        gate_c = nn.sigmoid(mlp2(nn.relu(mlp1(avg))) + mlp2(nn.relu(mlp1(mx))))
        x = x * gate_c[:, None, None, :]
        avg_s = jnp.mean(x, axis=-1, keepdims=True)
        max_s = jnp.max(x, axis=-1, keepdims=True)
        gate_s = nn.Conv(1, (7, 7), padding=3, dtype=self.dtype, name="spatial")(
            jnp.concatenate([avg_s, max_s], axis=-1)
        )
        return x * nn.sigmoid(gate_s)


class RGBDFPN(nn.Module):
    """Dual-trunk backbone with per-level CBAM concat fusion + FPN."""

    dim: int = 256
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth):
        t, d = self.train, self.dtype
        levels = ("res2", "res3", "res4", "res5")
        kwargs = dict(depth=50, out_features=levels, norm=self.norm, train=t, dtype=d)
        f_rgb = ResNetTrunk(**kwargs, name="rgb_trunk")(rgb.astype(d))
        f_dep = ResNetTrunk(**kwargs, name="depth_trunk")(depth.astype(d))

        fused = {}
        for f in levels:
            y = jnp.concatenate([f_rgb[f], f_dep[f]], axis=-1)
            y = CBAM(dtype=d, name=f"cbam_{f}")(y)
            fused[f] = ConvNorm(f_rgb[f].shape[-1], 1, use_bias=True, norm="",
                                act=None, train=t, dtype=d, name=f"fuse_{f}")(y)

        laterals = {
            f: nn.Conv(self.dim, (1, 1), dtype=d, name=f"lateral_{f}")(fused[f])
            for f in levels
        }
        outs = {}
        y = laterals["res5"]
        outs["p5"] = y
        for f, p in (("res4", "p4"), ("res3", "p3"), ("res2", "p2")):
            y = upsample_bilinear(y.astype(jnp.float32),
                                  size=(laterals[f].shape[1], laterals[f].shape[2])).astype(d)
            y = y + laterals[f]
            outs[p] = y
        for p in outs:
            outs[p] = nn.Conv(self.dim, (3, 3), padding=1, dtype=d,
                              name=f"output_{p}")(outs[p])
        return outs  # strides: p2=4, p3=8, p4=16, p5=16 (res5 dilated)


class RPNHead(nn.Module):
    num_anchors: int = 9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        y = nn.relu(y)
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="objectness")(y)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="deltas")(y)
        return obj, deltas


class MaskHead(nn.Module):
    """4 convs + 2x deconv + predictor (standard Mask-RCNN head)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=d, name=f"conv{i}")(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=d, name="deconv")(x))
        return nn.Conv(1, (1, 1), dtype=d, name="predictor")(x)[..., 0]


class UOAISNet(nn.Module):
    """forward(rgb, depth) -> dict of fixed-shape detections.

    rgb/depth: [1, H, W, 3] (single image; H, W multiples of 32).
    Returns boxes [P, 4], scores [P], valid [P], visible/amodal mask logits
    [P, 28, 28], occlusion logits [P].
    """

    max_proposals: int = 128
    max_detections: int = 32
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth):
        t, d = self.train, self.dtype
        h, w = rgb.shape[1], rgb.shape[2]
        fpn = RGBDFPN(norm=self.norm, train=t, dtype=d, name="backbone")(rgb, depth)

        # RPN over p3 (stride 8) — single-level proposals keep shapes static
        level, stride = "p3", 8
        obj, deltas = RPNHead(dtype=d, name="rpn")(fpn[level])
        fh, fw = obj.shape[1], obj.shape[2]
        anchors = box_ops.generate_anchors(fh, fw, stride)
        obj = obj[0].reshape(-1).astype(jnp.float32)
        deltas = deltas[0].reshape(-1, 4).astype(jnp.float32)
        proposals = box_ops.apply_deltas(anchors, deltas, clip_hw=(h, w))

        k = self.max_proposals
        top_scores, top_idx = jax.lax.top_k(obj, k)
        top_boxes = proposals[top_idx]
        keep = box_ops.nms_fixed(top_boxes, top_scores, 0.7)
        # fixed shape: sort survivors first, keep top max_detections
        order = jnp.argsort(~keep)  # kept first (False < True)
        det = self.max_detections
        det_boxes = top_boxes[order][:det]
        det_scores = jnp.where(keep[order][:det], jax.nn.sigmoid(top_scores[order][:det]), 0.0)
        det_valid = keep[order][:det]

        # ROI heads on p2 (stride 4)
        feats = fpn["p2"][0].astype(jnp.float32)
        roi = box_ops.roi_align(feats, det_boxes, out_size=7, stride=4)
        flat = roi.reshape(det, -1)
        fc = nn.relu(nn.Dense(1024, dtype=d, name="box_fc1")(flat.astype(d)))
        fc = nn.relu(nn.Dense(1024, dtype=d, name="box_fc2")(fc))
        cls_logit = nn.Dense(1, dtype=d, name="cls")(fc)[..., 0].astype(jnp.float32)
        box_deltas = nn.Dense(4, dtype=d, name="box_deltas")(fc).astype(jnp.float32)
        final_boxes = box_ops.apply_deltas(det_boxes, box_deltas, clip_hw=(h, w))
        final_scores = det_scores * jax.nn.sigmoid(cls_logit)

        mask_roi = box_ops.roi_align(feats, final_boxes, out_size=14, stride=4).astype(d)
        visible = MaskHead(dtype=d, name="visible_head")(mask_roi).astype(jnp.float32)
        amodal = MaskHead(dtype=d, name="amodal_head")(mask_roi).astype(jnp.float32)
        # occlusion head: classifier over mask-head features (occ = amodal - visible)
        occ_feat = jnp.mean(mask_roi, axis=(1, 2))
        occlusion = nn.Dense(1, dtype=d, name="occlusion")(occ_feat)[..., 0].astype(jnp.float32)

        return {
            "boxes": final_boxes,
            "scores": final_scores,
            "valid": det_valid,
            "visible_masks": visible,
            "amodal_masks": amodal,
            "occlusion": occlusion,
            # training intermediates (losses assign targets to these)
            "anchors": anchors,
            "rpn_objectness": obj,
            "rpn_deltas": deltas,
            "proposal_boxes": det_boxes,
            "cls_logit": cls_logit,
            "box_deltas": box_deltas,
        }


def paste_masks(mask_logits, boxes, valid, h: int, w: int, threshold=0.5):
    """Paste [P, 28, 28] ROI mask logits into full-res [P, h, w] bools.

    XLA formulation of the reference's paste loop: resize each ROI mask into
    its box extent with bilinear sampling of the inverse mapping.
    """
    p, mh, mw = mask_logits.shape

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def one(logit, box, ok):
        x0, y0, x1, y1 = box
        bw = jnp.maximum(x1 - x0, 1e-3)
        bh = jnp.maximum(y1 - y0, 1e-3)
        gy = (ys + 0.5 - y0) / bh * mh - 0.5
        gx = (xs + 0.5 - x0) / bw * mw - 0.5
        y0i = jnp.clip(jnp.floor(gy), 0, mh - 1)
        x0i = jnp.clip(jnp.floor(gx), 0, mw - 1)
        y1i = jnp.clip(y0i + 1, 0, mh - 1)
        x1i = jnp.clip(x0i + 1, 0, mw - 1)
        dy = jnp.clip(gy - y0i, 0, 1)
        dx = jnp.clip(gx - x0i, 0, 1)

        def at(cy, cx):
            return logit[cy.astype(jnp.int32), cx.astype(jnp.int32)]

        val = (at(y0i, x0i) * (1 - dy) * (1 - dx) + at(y0i, x1i) * (1 - dy) * dx
               + at(y1i, x0i) * dy * (1 - dx) + at(y1i, x1i) * dy * dx)
        inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
        return (jax.nn.sigmoid(val) > threshold) & inside & ok

    return jax.vmap(one)(mask_logits, boxes, valid)


def _smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def uoais_losses(
    outputs: dict,
    gt_boxes: jnp.ndarray,
    gt_visible: jnp.ndarray,
    gt_amodal: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rpn_pos_iou: float = 0.7,
    rpn_neg_iou: float = 0.3,
    roi_pos_iou: float = 0.5,
):
    """Two-stage detector losses with IoU-based target assignment.

    Mirrors the UOAIS-Net (ORCNN) training recipe (rcnn_heads.py): RPN
    objectness BCE + smooth-L1 box deltas on positive anchors; ROI
    classification BCE + box regression on matched proposals; visible AND
    amodal mask BCE on positives (occlusion head supervised by whether the
    amodal target exceeds the visible one). All fixed-shape: anchors/
    proposals carry per-element weights instead of sampling.

    gt_boxes [N, 4] XYXY; gt_visible/gt_amodal [N, H, W]; gt_valid [N].
    """
    anchors = outputs["anchors"]
    iou = box_ops.box_iou(anchors, gt_boxes)  # [A, N]
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    # anchors with the max IoU for some gt are positive too
    per_gt_best = jnp.argmax(iou, axis=0)
    forced_pos = jnp.zeros(anchors.shape[0], bool).at[per_gt_best].set(
        jnp.asarray(gt_valid)
    )
    pos = (best_iou > rpn_pos_iou) | forced_pos
    neg = best_iou < rpn_neg_iou

    obj = outputs["rpn_objectness"]
    t = pos.astype(jnp.float32)
    w = (pos | neg).astype(jnp.float32)
    obj_bce = jnp.maximum(obj, 0) - obj * t + jnp.log1p(jnp.exp(-jnp.abs(obj)))
    loss_rpn_obj = jnp.sum(obj_bce * w) / jnp.maximum(w.sum(), 1.0)

    target_deltas = box_ops.boxes_to_deltas(anchors, gt_boxes[best_gt])
    pw = pos.astype(jnp.float32)[:, None]
    loss_rpn_box = jnp.sum(
        _smooth_l1(outputs["rpn_deltas"] - target_deltas) * pw
    ) / jnp.maximum(pw.sum() * 4, 1.0)

    # ROI stage: match proposals to gt
    props = outputs["proposal_boxes"]
    piou = jnp.where(gt_valid[None, :], box_ops.box_iou(props, gt_boxes), 0.0)
    p_best = jnp.max(piou, axis=1)
    p_gt = jnp.argmax(piou, axis=1)
    p_pos = p_best > roi_pos_iou

    cls = outputs["cls_logit"]
    tc = p_pos.astype(jnp.float32)
    cls_bce = jnp.maximum(cls, 0) - cls * tc + jnp.log1p(jnp.exp(-jnp.abs(cls)))
    loss_cls = jnp.mean(cls_bce)

    roi_deltas_t = box_ops.boxes_to_deltas(props, gt_boxes[p_gt])
    rw = p_pos.astype(jnp.float32)[:, None]
    loss_box = jnp.sum(
        _smooth_l1(outputs["box_deltas"] - roi_deltas_t) * rw
    ) / jnp.maximum(rw.sum() * 4, 1.0)

    # mask heads: BCE against ROI-aligned GT masks of the matched instance
    def mask_loss(logits, gt_masks):
        m = logits.shape[-1]

        def one(logit, box, gi, ok):
            target = box_ops.roi_align(
                gt_masks[gi][..., None].astype(jnp.float32), box[None], out_size=m
            )[0, ..., 0]
            target = (target > 0.5).astype(jnp.float32)
            bce = jnp.maximum(logit, 0) - logit * target + jnp.log1p(jnp.exp(-jnp.abs(logit)))
            return jnp.mean(bce) * ok

        per = jax.vmap(one)(logits, props, p_gt, p_pos.astype(jnp.float32))
        return jnp.sum(per) / jnp.maximum(p_pos.sum(), 1.0)

    loss_visible = mask_loss(outputs["visible_masks"], gt_visible)
    loss_amodal = mask_loss(outputs["amodal_masks"], gt_amodal)

    # occlusion: instance is occluded iff amodal has pixels visible lacks
    occluded = (
        jnp.sum(gt_amodal.astype(jnp.float32), axis=(1, 2))
        > jnp.sum(gt_visible.astype(jnp.float32), axis=(1, 2)) + 16
    ).astype(jnp.float32)
    t_occ = occluded[p_gt]
    occ = outputs["occlusion"]
    occ_bce = jnp.maximum(occ, 0) - occ * t_occ + jnp.log1p(jnp.exp(-jnp.abs(occ)))
    loss_occ = jnp.sum(occ_bce * p_pos) / jnp.maximum(p_pos.sum(), 1.0)

    return {
        "loss_rpn_objectness": loss_rpn_obj,
        "loss_rpn_box": loss_rpn_box,
        "loss_cls": loss_cls,
        "loss_box": loss_box,
        "loss_visible_mask": loss_visible,
        "loss_amodal_mask": loss_amodal,
        "loss_occlusion": loss_occ,
    }


class UOAISNetBaseModel:
    """Eval-harness wrapper: predict(rgb_path, depth_path) -> (masks, fg, s)."""

    def __init__(self, params=None, dataset="OSD", seed=0, score_threshold=0.5,
                 amodal=False):
        self.model = UOAISNet(dtype=jnp.bfloat16)
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 480, 640, 3)),
                jnp.zeros((1, 480, 640, 3)),
            )
        self.params = params
        self.dataset = dataset
        self.score_threshold = score_threshold
        self.amodal = amodal

        def pipeline(params, rgb, depth):
            out = self.model.apply(params, rgb[None], depth[None])
            ok = out["valid"] & (out["scores"] > score_threshold)
            logits = out["amodal_masks"] if self.amodal else out["visible_masks"]
            masks = paste_masks(logits, out["boxes"], ok, 480, 640)
            return masks, ok, out["scores"]

        self._pipeline = jax.jit(pipeline)

    def predict(self, rgb_path, depth_path):
        import time

        import cv2
        import imageio.v2 as imageio

        from quber_tpu.ops.preprocess import inpaint_depth, normalize_depth

        rgb = cv2.resize(cv2.imread(rgb_path), (640, 480)).astype(np.float32)
        if depth_path:
            if depth_path.endswith(".npy"):
                depth = normalize_depth(np.load(depth_path), 0.25, 1.5)
            else:
                depth = normalize_depth(np.asarray(imageio.imread(depth_path)))
            depth = cv2.resize(depth, (640, 480), interpolation=cv2.INTER_NEAREST)
            depth = inpaint_depth(depth).astype(np.float32)
        else:
            depth = np.zeros((480, 640, 3), np.float32)
        t0 = time.time()
        masks, ok, scores = self._pipeline(
            self.params, jnp.asarray(rgb), jnp.asarray(depth)
        )
        masks, ok = np.asarray(masks), np.asarray(ok)
        elapsed = time.time() - t0
        return masks[ok], None, elapsed
