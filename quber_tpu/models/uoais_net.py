"""UOAIS-Net-class base segmenter: RGB-D FPN Mask-RCNN with amodal heads.

TPU-native rebuild of the reference's UOAIS-Net
(/root/reference/ext_modules/uoais: adet/modeling/rcnn/rcnn_heads.py
ORCNNROIHeads, mask_heads.py Visible/Amodal/OCCCLS heads, box_head.py
MLCFastRCNNConvFCHead, backbones rgbdfpn/resnet_depth/cbam, config
R50_rgbdconcat_mlc_occatmask_hom_concat.yaml; wrapped at
eval/base_model.py:174-222): a two-stage detector with

  * dual R50 trunks fused per level by CBAM (channel + spatial attention)
  * FPN p2..p6 (lateral 1x1 + top-down + 3x3 output convs, p6 = maxpool)
  * multi-level RPN over p2..p6 with one anchor size per level
    ([16,32,64,128,256] x 3 aspect ratios, ANCHOR_GENERATOR block of the
    reference config) and fixed-shape proposal selection (per-level top-k +
    NMS scan — the ml_nms.cu replacement lives in quber_tpu.ops.boxes)
  * area-based FPN level assignment for ROI pooling (p2..p5)
  * MLC (multi-level coding): the box head's first conv features are
    upsampled and injected into every mask head (box_head.py:112-190,
    rcnn_heads.py _init_mlc_layer)
  * HOM (hierarchical occlusion modeling): visible -> amodal -> occlusion
    heads run in the config's PREDICTION_ORDER ["V","A","O"], each
    receiving the concat of the pooled features and all previous heads'
    feature maps through 3 guidance convs (mask_heads.py:575-612,
    rcnn_heads.py _forward_single_mask)

Everything is fixed-shape: proposals padded to MAX_PROPOSALS, detections to
MAX_DETECTIONS, with validity masks.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import ConvNorm
from quber_tpu.models.resnet import ResNetTrunk
from quber_tpu.ops import boxes as box_ops

# one anchor size per FPN level (reference config ANCHOR_GENERATOR.SIZES)
FPN_STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
ANCHOR_SIZES = {"p2": 16, "p3": 32, "p4": 64, "p5": 128, "p6": 256}
ASPECT_RATIOS = (0.5, 1.0, 2.0)
ROI_STRIDES = {k: FPN_STRIDES[k] for k in ("p2", "p3", "p4", "p5")}


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
    """Dual standard-R50 trunks with per-level CBAM concat fusion + FPN.

    Unlike the QuBER refiner backbone (DeepLab stem, dilated res5), UOAIS-Net
    uses the stock detectron2 R50: 7x7 stem, strided res5 (stride 32), FPN
    p2..p5 + p6 via stride-2 maxpool (build_resnet_rgbd_latefusion_fpn_backbone
    in adet/modeling/backbone/rgbdfpn.py).
    """

    dim: int = 256
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth):
        t, d = self.train, self.dtype
        levels = ("res2", "res3", "res4", "res5")
        kwargs = dict(
            depth=50, stem_type="basic", stem_out_channels=64,
            res5_dilation=1, res5_multi_grid=(1, 1, 1),
            out_features=levels, norm=self.norm, train=t, dtype=d,
        )
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
            y = jax.image.resize(
                y.astype(jnp.float32),
                (y.shape[0], laterals[f].shape[1], laterals[f].shape[2], y.shape[3]),
                "nearest",
            ).astype(d)
            y = y + laterals[f]
            outs[p] = y
        for p in outs:
            outs[p] = nn.Conv(self.dim, (3, 3), padding=1, dtype=d,
                              name=f"output_{p}")(outs[p])
        # LastLevelMaxPool: p6 = maxpool(p5, kernel 1, stride 2)
        outs["p6"] = outs["p5"][:, ::2, ::2, :]
        return outs  # strides: p2=4 .. p6=64


class RPNHead(nn.Module):
    """Shared-across-levels RPN head (detectron2 StandardRPNHead)."""

    num_anchors: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        y = nn.relu(y)
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="objectness")(y)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="deltas")(y)
        return obj, deltas


class MLCBoxHead(nn.Module):
    """4-conv box head returning (pooled features, first-conv features).

    MLCFastRCNNConvFCHead with NUM_CONV=4, NUM_FC=0 (box_head.py:112-190):
    the first conv's output is the multi-level-coding feature handed to the
    mask heads.
    """

    dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        first = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, dtype=d, name="conv1")(x))
        y = first
        for i in range(2, 5):
            y = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, dtype=d, name=f"conv{i}")(y))
        return y, first


class MLCExtraction(nn.Module):
    """ROIHeads._init_mlc_layer: deconv 7->14 + two 3x3 convs over the box
    head's first-conv features, producing the guidance injected into every
    mask head."""

    dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = nn.ConvTranspose(self.dim, (2, 2), strides=(2, 2), dtype=d, name="deconv")(x)
        x = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, dtype=d, name="conv1")(x))
        x = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, dtype=d, name="conv2")(x))
        return x


class HOMMaskHead(nn.Module):
    """One hierarchical mask head (Visible/AmodalMaskRCNNConvUpsampleHead).

    Input 14x14 pooled features concatenated with all previous heads' output
    features -> 3 guidance convs -> conv1 -> concat MLC features -> 3 MLC
    convs -> conv2..4 -> (deconv + 1x1 predictor, 28x28 logits).
    Returns (logits, pre-deconv features) — the features feed the next head
    in PREDICTION_ORDER (mask_heads.py:595-612 forward).
    """

    dim: int = 256
    n_guidance: int = 0  # number of previous heads' feature maps
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guidance, mlc):
        d = self.dtype
        if self.n_guidance:
            x = jnp.concatenate([x] + list(guidance), axis=-1)
            gdim = (1 + self.n_guidance) * self.dim
            for i, od in enumerate((gdim, gdim, self.dim)):
                x = nn.relu(nn.Conv(od, (3, 3), padding=1, dtype=d,
                                    name=f"guide{i}")(x))
        x = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, dtype=d, name="conv1")(x))
        x = jnp.concatenate([x, mlc], axis=-1)
        for i, od in enumerate((2 * self.dim, 2 * self.dim, self.dim)):
            x = nn.relu(nn.Conv(od, (3, 3), padding=1, dtype=d, name=f"mlc{i}")(x))
        for i in range(2, 5):
            x = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, dtype=d, name=f"conv{i}")(x))
        feat = x
        y = nn.relu(nn.ConvTranspose(self.dim, (2, 2), strides=(2, 2), dtype=d,
                                     name="deconv")(x))
        logits = nn.Conv(1, (1, 1), dtype=d, name="predictor")(y)[..., 0]
        return logits.astype(jnp.float32), feat


class OccClsMaskHead(nn.Module):
    """Occlusion classifier at mask level (OCCCLSMaskHead, 2-class)."""

    dim: int = 256
    n_guidance: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guidance, mlc):
        d = self.dtype
        x = jnp.concatenate([x] + list(guidance), axis=-1)
        gdim = (1 + self.n_guidance) * self.dim
        for i, od in enumerate((gdim, gdim, self.dim)):
            x = nn.relu(nn.Conv(od, (3, 3), padding=1, dtype=d, name=f"guide{i}")(x))
        x = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, dtype=d, name="conv1")(x))
        x = jnp.concatenate([x, mlc], axis=-1)
        for i, od in enumerate((2 * self.dim, 2 * self.dim, self.dim)):
            x = nn.relu(nn.Conv(od, (3, 3), padding=1, dtype=d, name=f"mlc{i}")(x))
        feat = x
        pooled = jnp.mean(x, axis=(1, 2))
        y = nn.relu(nn.Dense(self.dim, dtype=d, name="fc")(pooled))
        logits = nn.Dense(2, dtype=d, name="predictor")(y)
        return logits.astype(jnp.float32), feat


def _multilevel_anchors(h: int, w: int):
    """Anchors for every FPN level at image size (h, w), concatenated."""
    per_level = {}
    for name, stride in FPN_STRIDES.items():
        fh = -(-h // stride)
        fw = -(-w // stride)
        per_level[name] = box_ops.generate_anchors(
            fh, fw, stride, sizes=(ANCHOR_SIZES[name],), aspect_ratios=ASPECT_RATIOS
        )
    return per_level


class UOAISNet(nn.Module):
    """forward(rgb, depth) -> dict of fixed-shape detections.

    rgb/depth: [1, H, W, 3] (single image; H, W multiples of 64).
    Returns boxes [D, 4], scores [D], valid [D], visible/amodal mask logits
    [D, 28, 28], occlusion logits [D, 2].
    """

    max_proposals: int = 128
    max_detections: int = 32
    pre_nms_topk_per_level: int = 128
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth, gt_proposals=None):
        """gt_proposals [G, 4] XYXY (training only): GT boxes spliced into
        the proposal set and force-ranked into the detections —
        detectron2's add_ground_truth_to_proposals semantics, which the
        reference's ROIHeads inherit. Without it the ROI/mask heads only
        start training once RPN proposals cross the positive-IoU
        threshold (a from-scratch bootstrap deadlock)."""
        t, d = self.train, self.dtype
        h, w = rgb.shape[1], rgb.shape[2]
        fpn = RGBDFPN(norm=self.norm, train=t, dtype=d, name="backbone")(rgb, depth)

        # ---- multi-level RPN: shared head over p2..p6 ----
        rpn = RPNHead(num_anchors=len(ASPECT_RATIOS), dtype=d, name="rpn")
        anchors = _multilevel_anchors(h, w)
        pre_k = self.pre_nms_topk_per_level
        lvl_scores, lvl_boxes, all_obj, all_deltas, all_anchors = [], [], [], [], []
        for name in FPN_STRIDES:
            obj, deltas = rpn(fpn[name])
            obj = obj[0].reshape(-1).astype(jnp.float32)
            deltas = deltas[0].reshape(-1, 4).astype(jnp.float32)
            props = box_ops.apply_deltas(anchors[name], deltas, clip_hw=(h, w))
            # per-level pre-NMS top-k (RPN.PRE_NMS_TOPK is per level in the
            # reference config); keeps the NMS input fixed and small
            k = min(pre_k, obj.shape[0])
            s, idx = jax.lax.top_k(obj, k)
            lvl_scores.append(s)
            lvl_boxes.append(props[idx])
            all_obj.append(obj)
            all_deltas.append(deltas)
            all_anchors.append(anchors[name])

        cand_scores = jnp.concatenate(lvl_scores)
        cand_boxes = jnp.concatenate(lvl_boxes, axis=0)
        keep = box_ops.nms_fixed(cand_boxes, cand_scores, 0.7)
        # fixed shape: kept boxes first (by score), top max_proposals
        order = jnp.argsort(-jnp.where(keep, cand_scores, -jnp.inf))
        p = self.max_proposals
        prop_boxes = cand_boxes[order][:p]
        prop_scores = jnp.where(keep[order][:p], cand_scores[order][:p], -jnp.inf)
        prop_valid = keep[order][:p]
        det_boost = jnp.zeros((p,), jnp.float32)
        if gt_proposals is not None:
            g = gt_proposals.shape[0]
            gt_ok = (gt_proposals[:, 2] > gt_proposals[:, 0]) & (
                gt_proposals[:, 3] > gt_proposals[:, 1]
            )
            prop_boxes = jnp.concatenate(
                [prop_boxes[: p - g], jnp.asarray(gt_proposals, jnp.float32)]
            )
            prop_valid = jnp.concatenate([prop_valid[: p - g], gt_ok])
            prop_scores = jnp.concatenate(
                [prop_scores[: p - g], jnp.where(gt_ok, jnp.inf, -jnp.inf)]
            )
            # rank GT slots into the detection set regardless of the (still
            # untrained) classifier so the mask heads see positives from
            # step one
            det_boost = det_boost.at[p - g:].set(jnp.where(gt_ok, 2.0, 0.0))

        # ---- box stage: level-assigned ROI align on p2..p5 ----
        feats = {k: fpn[k][0].astype(jnp.float32) for k in ROI_STRIDES}
        roi7 = box_ops.roi_align_multilevel(feats, prop_boxes, 7, ROI_STRIDES)
        box_feat, first_feat = MLCBoxHead(dtype=d, name="box_head")(roi7.astype(d))
        pooled = jnp.mean(box_feat, axis=(1, 2))
        cls_logit = nn.Dense(1, dtype=d, name="cls")(pooled)[..., 0].astype(jnp.float32)
        box_deltas = nn.Dense(4, dtype=d, name="box_deltas")(pooled).astype(jnp.float32)
        final_boxes = box_ops.apply_deltas(prop_boxes, box_deltas, clip_hw=(h, w))
        cls_scores = jnp.where(prop_valid, jax.nn.sigmoid(cls_logit), 0.0)

        # final detection selection: NMS on regressed boxes, top max_detections
        rank_scores = cls_scores + det_boost
        det_keep = box_ops.nms_fixed(final_boxes, jnp.where(prop_valid, rank_scores, -1.0), 0.5)
        det_keep = det_keep & prop_valid
        det_order = jnp.argsort(-jnp.where(det_keep, rank_scores, -jnp.inf))
        det = self.max_detections
        det_idx = det_order[:det]
        det_boxes = final_boxes[det_idx]
        det_scores = jnp.where(det_keep[det_idx], cls_scores[det_idx], 0.0)
        det_valid = det_keep[det_idx]

        # ---- mask stage: HOM V -> A -> O with MLC guidance ----
        mlc = MLCExtraction(dtype=d, name="mlc")(first_feat)[det_idx]
        roi14 = box_ops.roi_align_multilevel(feats, det_boxes, 14, ROI_STRIDES).astype(d)
        visible, v_feat = HOMMaskHead(n_guidance=0, dtype=d, name="visible_head")(
            roi14, [], mlc)
        amodal, a_feat = HOMMaskHead(n_guidance=1, dtype=d, name="amodal_head")(
            roi14, [v_feat], mlc)
        occlusion, _ = OccClsMaskHead(n_guidance=2, dtype=d, name="occ_head")(
            roi14, [v_feat, a_feat], mlc)

        return {
            "boxes": det_boxes,
            "scores": det_scores,
            "valid": det_valid,
            "visible_masks": visible,
            "amodal_masks": amodal,
            "occlusion": occlusion,
            # training intermediates (losses assign targets to these)
            "anchors": jnp.concatenate(all_anchors, axis=0),
            "rpn_objectness": jnp.concatenate(all_obj),
            "rpn_deltas": jnp.concatenate(all_deltas, axis=0),
            "proposal_boxes": prop_boxes,
            "proposal_valid": prop_valid,
            "cls_logit": cls_logit,
            "box_deltas": box_deltas,
            "det_index": det_idx,
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
    occluded_rate_threshold: float = 0.05,
):
    """Two-stage detector losses with IoU-based target assignment.

    Mirrors the UOAIS-Net (ORCNN) training recipe (rcnn_heads.py): RPN
    objectness BCE + smooth-L1 box deltas on positive anchors (all levels
    concatenated); ROI classification BCE + box regression on matched
    proposals; visible AND amodal mask BCE on positives; occlusion
    classifier = class-balanced 2-way CE on gt_occluded_rate >= 0.05
    (rcnn_heads.py:504-514). All fixed-shape: anchors/proposals carry
    per-element weights instead of sampling.

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
    # balanced pos/neg weighting in expectation — the fixed-shape stand-in
    # for detectron2's RPN minibatch sampling (256 anchors at positive
    # fraction 0.5); uniform weighting drowns the handful of positives in
    # tens of thousands of negatives and the objectness never rises
    fp, fn_ = t, neg.astype(jnp.float32)
    w = (0.5 * fp / jnp.maximum(fp.sum(), 1.0)
         + 0.5 * fn_ / jnp.maximum(fn_.sum(), 1.0))
    obj_bce = jnp.maximum(obj, 0) - obj * t + jnp.log1p(jnp.exp(-jnp.abs(obj)))
    loss_rpn_obj = jnp.sum(obj_bce * w)

    target_deltas = box_ops.boxes_to_deltas(anchors, gt_boxes[best_gt])
    pw = pos.astype(jnp.float32)[:, None]
    loss_rpn_box = jnp.sum(
        _smooth_l1(outputs["rpn_deltas"] - target_deltas) * pw
    ) / jnp.maximum(pw.sum() * 4, 1.0)

    # ROI stage: match proposals to gt
    props = outputs["proposal_boxes"]
    prop_valid = outputs.get("proposal_valid")
    piou = jnp.where(gt_valid[None, :], box_ops.box_iou(props, gt_boxes), 0.0)
    p_best = jnp.max(piou, axis=1)
    p_gt = jnp.argmax(piou, axis=1)
    p_pos = p_best > roi_pos_iou
    if prop_valid is not None:
        p_pos = p_pos & prop_valid

    cls = outputs["cls_logit"]
    tc = p_pos.astype(jnp.float32)
    cv = (prop_valid if prop_valid is not None
          else jnp.ones_like(p_pos)).astype(jnp.float32)
    # detectron2 ROIHeads sample proposals at positive fraction 0.25;
    # weight pos/neg 1:3 in expectation so the classifier isn't biased
    # all-negative by the 6-positives-vs-122-negatives imbalance
    cp, cn = tc * cv, (1.0 - tc) * cv
    cw = (0.25 * cp / jnp.maximum(cp.sum(), 1.0)
          + 0.75 * cn / jnp.maximum(cn.sum(), 1.0))
    cls_bce = jnp.maximum(cls, 0) - cls * tc + jnp.log1p(jnp.exp(-jnp.abs(cls)))
    loss_cls = jnp.sum(cls_bce * cw)

    roi_deltas_t = box_ops.boxes_to_deltas(props, gt_boxes[p_gt])
    rw = p_pos.astype(jnp.float32)[:, None]
    loss_box = jnp.sum(
        _smooth_l1(outputs["box_deltas"] - roi_deltas_t) * rw
    ) / jnp.maximum(rw.sum() * 4, 1.0)

    # mask heads run on the selected detections: map detection slots back to
    # their proposal's matched gt
    det_idx = outputs["det_index"]
    d_gt = p_gt[det_idx]
    d_pos = p_pos[det_idx] & outputs["valid"]
    det_boxes = outputs["boxes"]

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

        per = jax.vmap(one)(logits, det_boxes, d_gt, d_pos.astype(jnp.float32))
        return jnp.sum(per) / jnp.maximum(d_pos.sum(), 1.0)

    loss_visible = mask_loss(outputs["visible_masks"], gt_visible)
    loss_amodal = mask_loss(outputs["amodal_masks"], gt_amodal)

    # occlusion classifier: occluded iff 1 - |visible|/|amodal| >= threshold,
    # class-balanced CE (rcnn_heads.py:508-513 weight [1, n_noocc/n_occ])
    vis_area = jnp.sum(gt_visible.astype(jnp.float32), axis=(1, 2))
    amo_area = jnp.maximum(jnp.sum(gt_amodal.astype(jnp.float32), axis=(1, 2)), 1.0)
    occluded = (1.0 - vis_area / amo_area) >= occluded_rate_threshold
    t_occ = occluded[d_gt].astype(jnp.int32)
    logp = jax.nn.log_softmax(outputs["occlusion"], axis=-1)
    picked = jnp.take_along_axis(logp, t_occ[:, None], axis=-1)[:, 0]
    n_occ = jnp.sum((t_occ == 1) & d_pos)
    n_noocc = jnp.sum((t_occ == 0) & d_pos)
    w_occ = jnp.where(t_occ == 1, n_noocc / jnp.maximum(n_occ, 1), 1.0)
    w_occ = w_occ * d_pos.astype(jnp.float32)
    loss_occ = -jnp.sum(picked * w_occ) / jnp.maximum(jnp.sum(w_occ), 1.0)

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
