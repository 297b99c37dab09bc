"""Weight-compatible UOAIS-Net ("pretrained" deployed variant).

The reference's deployed UOAIS-Net checkpoint (`model_final.pth`, loaded by
eval/base_model.py:174-186 with config
ext_modules/uoais/configs/R50_rgbdconcat_mlc_occatmask_hom_concat.yaml) is a
detectron2 GeneralizedRCNN with:

  * late-fusion RGB-D backbone: two standard R50 trunks (BasicStem 7x7,
    FrozenBN, stride-2 res5) whose per-stage features are fused by 1x1 convs
    (concat -> C), feeding a standard FPN p2-p5 + LastLevelMaxPool p6
    (adet/modeling/backbone/rgbdfpn.py:172-318,409-433; the depth trunk
    names its stages `res_2..res_5`, resnet_depth.py:98);
  * detectron2 StandardRPNHead over p2-p6 (anchor sizes 16/32/64/128/256,
    ratios 0.5/1/2, offset 0, weights (1,1,1,1); pre/post-NMS topk 1000,
    NMS 0.7);
  * ORCNNROIHeads (adet/modeling/rcnn/rcnn_heads.py:242-606): box branch =
    MLCFastRCNNConvFCHead (4 convs, no FC; box_head.py:112-187) +
    FastRCNNOutputLayers (cls 2-way + class-agnostic 4-delta,
    faster_rcnn.py:410-447), decoded with weights (10,10,5,5), score
    threshold 0.5 / NMS 0.5 / top 100 (thresholds set by the eval wrapper,
    base_model.py:182-183);
  * multi-level coding (MLC): the box head's first-conv features are
    upsampled by ConvTranspose + 2 convs (`extraction_mlc_layer0..2`,
    rcnn_heads.py:366-378) and injected into every mask head after its
    first conv (mask_heads.py:612-619);
  * hierarchical occlusion modeling (HOM, "concat"): mask heads run in
    PREDICTION_ORDER V -> A -> O; each head's input is the 14x14 ROI
    features concatenated with all previous heads' pre-deconv features,
    compressed by 3 guidance convs (mask_heads.py:574-581,683-690,779-786);
  * heads: VisibleMaskRCNNConvUpsampleHead / AmodalMaskRCNNConvUpsampleHead
    (4 convs + deconv + 1x1 predictor, mask_heads.py:515-728) and
    OCCCLSMaskHead (4 convs, stride 2 at the 2nd, flatten -> Linear(2)
    occlusion classifier, mask_heads.py:731-831).

This module preserves those semantics with the reference's parameter names
so `model_final.pth` maps 1:1 (import_zoo.import_uoais_net). It is the
inference path; training recipes live on the TPU-first redesign in
quber_tpu/models/uoais_net.py.

Known numerical deviation: ROI-align uses 1 bilinear sample per output cell
(ops/boxes.roi_align, aligned=True convention) while detectron2's
ROIAlignV2 with sampling_ratio=0 averages ceil(roi/out)^2 samples per cell;
and FPN/mask interpolations are exact. The deviation is sub-pixel at the
14x14/7x7 pool sizes used here.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quber_tpu.models.layers import ConvNorm
from quber_tpu.models.resnet import ResNetTrunk
from quber_tpu.models.sam_hq import ConvTranspose2x2
from quber_tpu.ops import boxes as box_ops

# anchor size per FPN level, R50_rgbdconcat config ANCHOR_GENERATOR.SIZES
RPN_SIZES = {"p2": 16, "p3": 32, "p4": 64, "p5": 128, "p6": 256}
STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
ASPECT_RATIOS = (0.5, 1.0, 2.0)
SCALE_CLAMP = 4.135166556742356  # log(1000/16), detectron2 Box2BoxTransform


def _upsample2x(x):
    """F.interpolate(scale_factor=2, mode='nearest') on NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    return jax.image.resize(x, (*x.shape[:-3], h * 2, w * 2, x.shape[-1]),
                            method="nearest")


class MaskHeadHOM(nn.Module):
    """V/A mask head: guidance convs -> fcn1 -> MLC fusion -> fcn2-4 ->
    deconv -> 1x1 predictor (mask_heads.py:515-728)."""

    prefix: str  # "visible" | "amodal"
    n_guidance: int  # prediction_order.index + 1
    conv_dim: int = 256

    @nn.compact
    def __call__(self, x, mlc):
        c = self.conv_dim
        g = self.n_guidance * c
        for i, feat in enumerate((g, g, c)):
            x = ConvNorm(feat, 3, use_bias=True, act=nn.relu,
                         name=f"{self.prefix}_guidance_layer{i}")(x)
        x = ConvNorm(c, 3, use_bias=True, act=nn.relu,
                     name=f"{self.prefix}_mask_fcn1")(x)
        x = jnp.concatenate([x, mlc], axis=-1)
        for i, feat in enumerate((2 * c, 2 * c, c)):
            x = ConvNorm(feat, 3, use_bias=True, act=nn.relu,
                         name=f"{self.prefix}_mlc_layer{i}")(x)
        for k in range(2, 5):
            x = ConvNorm(c, 3, use_bias=True, act=nn.relu,
                         name=f"{self.prefix}_mask_fcn{k}")(x)
        up = nn.relu(ConvTranspose2x2(c, name="deconv")(x))
        logits = ConvNorm(1, 1, use_bias=True, name="predictor")(up)
        return logits[..., 0], x  # pre-deconv features feed later heads


class OccClsHead(nn.Module):
    """Occlusion classifier head (mask_heads.py:731-831): fcn1 -> MLC ->
    fcn2 (stride 2) -> fcn3-4 -> flatten -> Linear(2).

    The flatten is NCHW-ordered in torch; import_uoais_net permutes the
    Linear weight so the NHWC flatten here matches.
    """

    conv_dim: int = 256

    @nn.compact
    def __call__(self, x, mlc):
        c = self.conv_dim
        g = 3 * c  # prediction_order.index("O") + 1 = 3
        for i, feat in enumerate((g, g, c)):
            x = ConvNorm(feat, 3, use_bias=True, act=nn.relu,
                         name=f"occlusion_guidance_layer{i}")(x)
        x = ConvNorm(c, 3, use_bias=True, act=nn.relu, name="_occ_cls_fcn1")(x)
        x = jnp.concatenate([x, mlc], axis=-1)
        for i, feat in enumerate((2 * c, 2 * c, c)):
            x = ConvNorm(feat, 3, use_bias=True, act=nn.relu,
                         name=f"occ_cls__mlc_layer{i}")(x)
        x = ConvNorm(c, 3, strides=2, use_bias=True, act=nn.relu,
                     name="_occ_cls_fcn2")(x)
        x = ConvNorm(c, 3, use_bias=True, act=nn.relu, name="_occ_cls_fcn3")(x)
        x = ConvNorm(c, 3, use_bias=True, act=nn.relu, name="_occ_cls_fcn4")(x)
        flat = x.reshape(x.shape[0], -1)
        return nn.Dense(2, name="predictor")(flat)


class UOAISNetPretrained(nn.Module):
    """Single-image inference graph, fixed shapes throughout.

    Input x [H, W, 6]: BGR + 3x depth, pixel-mean subtracted (means
    103.53/116.28/123.675/127.5x3, std 1 — config PIXEL_MEAN). H, W must be
    multiples of 64 (p6 stride).

    Returns dict with DETECTIONS slots: boxes [D, 4] (input coords), scores
    [D], valid [D] bool, visible/amodal mask logits [D, 28, 28], occlusion
    logits [D, 2].
    """

    fpn_dim: int = 256
    conv_dim: int = 256
    rpn_pre_nms_topk: int = 1000
    rpn_post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    score_thresh: float = 0.5
    nms_thresh: float = 0.5
    detections: int = 100
    prediction_order: Sequence[str] = ("V", "A", "O")

    @nn.compact
    def __call__(self, x, debug_boxes=None):
        """debug_boxes [N, 4]: bypass RPN proposal selection and box/mask NMS,
        using the given boxes as both proposals and detections, and return
        intermediate maps — the seam for the torch-oracle importer test
        (tests/test_uoais_pretrained.py)."""
        img_h, img_w, _ = x.shape
        trunk = dict(depth=50, stem_type="basic", stem_out_channels=64,
                     res5_dilation=1, res5_multi_grid=(1, 1, 1),
                     out_features=("res2", "res3", "res4", "res5"),
                     norm="FrozenBN")
        rgb_feats = ResNetTrunk(**trunk, name="bottom_up_rgb")(x[None, ..., :3])
        dep_feats = ResNetTrunk(**trunk, name="bottom_up_depth")(x[None, ..., 3:6])

        # per-stage late fusion: concat -> 1x1 conv back to C (rgbdfpn.py:276-279)
        fused = {}
        for s in (2, 3, 4, 5):
            cat = jnp.concatenate([rgb_feats[f"res{s}"], dep_feats[f"res{s}"]], -1)
            fused[s] = ConvNorm(cat.shape[-1] // 2, 1, use_bias=True,
                                name=f"fusion_layer_{s}")(cat)

        # FPN top-down (rgbdfpn.py:283-308)
        laterals = {
            s: ConvNorm(self.fpn_dim, 1, use_bias=True,
                        name=f"fpn_lateral{s}")(fused[s])
            for s in (2, 3, 4, 5)
        }
        pyramid = {}
        prev = laterals[5]
        pyramid["p5"] = ConvNorm(self.fpn_dim, 3, use_bias=True,
                                 name="fpn_output5")(prev)
        for s in (4, 3, 2):
            prev = laterals[s] + _upsample2x(prev)
            pyramid[f"p{s}"] = ConvNorm(self.fpn_dim, 3, use_bias=True,
                                        name=f"fpn_output{s}")(prev)
        # LastLevelMaxPool = stride-2 subsample of p5 (rgbdfpn.py:332-344)
        pyramid["p6"] = pyramid["p5"][:, ::2, ::2, :]

        # --- RPN (detectron2 StandardRPNHead + find_top_rpn_proposals) ---
        rpn_conv = ConvNorm(self.fpn_dim, 3, use_bias=True, act=nn.relu,
                            name="rpn_conv")
        rpn_obj = ConvNorm(len(ASPECT_RATIOS), 1, use_bias=True,
                           name="rpn_objectness")
        rpn_delta = ConvNorm(len(ASPECT_RATIOS) * 4, 1, use_bias=True,
                             name="rpn_anchor_deltas")
        rpn_maps = {}
        level_boxes, level_scores = [], []
        for name in ("p2", "p3", "p4", "p5", "p6"):
            t = rpn_conv(pyramid[name])
            obj_map = rpn_obj(t)
            delta_map = rpn_delta(t)
            rpn_maps[name] = (obj_map, delta_map)
            obj = obj_map[0].reshape(-1)  # [H*W*A], (h, w, a) order
            deltas = delta_map[0].reshape(-1, 4)
            anchors = box_ops.generate_anchors(
                t.shape[1], t.shape[2], STRIDES[name],
                sizes=(RPN_SIZES[name],), aspect_ratios=ASPECT_RATIOS,
                offset=0.0)
            k = min(self.rpn_pre_nms_topk, obj.shape[0])
            top_scores, top_idx = jax.lax.top_k(obj, k)
            props = box_ops.apply_deltas(
                anchors[top_idx], deltas[top_idx], clip_hw=(img_h, img_w),
                scale_clamp=SCALE_CLAMP)
            keep = box_ops.nms_fixed(props, top_scores, self.rpn_nms_thresh)
            level_boxes.append(props)
            level_scores.append(jnp.where(keep, top_scores, -jnp.inf))
        all_boxes = jnp.concatenate(level_boxes)
        all_scores = jnp.concatenate(level_scores)
        k = min(self.rpn_post_nms_topk, all_scores.shape[0])
        prop_scores, prop_idx = jax.lax.top_k(all_scores, k)
        proposals = all_boxes[prop_idx]
        prop_valid = jnp.isfinite(prop_scores)
        if debug_boxes is not None:
            proposals = debug_boxes
            prop_valid = jnp.ones((debug_boxes.shape[0],), bool)

        # --- box branch (MLCFastRCNNConvFCHead + FastRCNNOutputLayers) ---
        pooled = box_ops.roi_align_multilevel(
            {n: pyramid[n][0] for n in ("p2", "p3", "p4", "p5")},
            proposals, 7, {n: STRIDES[n] for n in ("p2", "p3", "p4", "p5")})
        bx = pooled
        first_feats = None
        for i in range(1, 5):
            bx = ConvNorm(self.conv_dim, 3, use_bias=True, act=nn.relu,
                          name=f"box_head_conv{i}")(bx)
            if i == 1:
                first_feats = bx
        flat = bx.reshape(bx.shape[0], -1)  # NHWC flatten; importer permutes
        cls_logits = nn.Dense(2, name="cls_score")(flat)
        box_deltas = nn.Dense(4, name="bbox_pred")(flat)

        det_boxes_all = box_ops.apply_deltas(
            proposals, box_deltas, clip_hw=(img_h, img_w),
            weights=(10.0, 10.0, 5.0, 5.0), scale_clamp=SCALE_CLAMP)
        probs = jax.nn.softmax(cls_logits, axis=-1)[:, 0]  # single fg class
        if debug_boxes is not None:
            det_idx = jnp.arange(debug_boxes.shape[0])
            det_boxes = debug_boxes
            det_scores = probs
            det_valid = jnp.ones_like(det_idx, bool)
        else:
            cand = prop_valid & (probs > self.score_thresh)
            nms_scores = jnp.where(cand, probs, -1.0)
            keep = box_ops.nms_fixed(det_boxes_all, nms_scores,
                                     self.nms_thresh)
            final = jnp.where(keep & cand, probs, -1.0)
            det_scores, det_idx = jax.lax.top_k(final, self.detections)
            det_valid = det_scores > 0
            det_boxes = det_boxes_all[det_idx]

        # --- MLC extraction on the kept detections (rcnn_heads.py:447-453) ---
        mlc = first_feats[det_idx]
        mlc = ConvTranspose2x2(self.conv_dim, name="extraction_mlc_layer0")(mlc)
        mlc = ConvNorm(self.conv_dim, 3, use_bias=True, act=nn.relu,
                       name="extraction_mlc_layer1")(mlc)
        mlc = ConvNorm(self.conv_dim, 3, use_bias=True, act=nn.relu,
                       name="extraction_mlc_layer2")(mlc)

        # --- HOM mask branch V -> A -> O (rcnn_heads.py:559-606) ---
        pooled14 = box_ops.roi_align_multilevel(
            {n: pyramid[n][0] for n in ("p2", "p3", "p4", "p5")},
            det_boxes, 14, {n: STRIDES[n] for n in ("p2", "p3", "p4", "p5")})
        feats_sofar = []
        visible_logits = amodal_logits = occ_logits = None
        for target in self.prediction_order:
            inp = jnp.concatenate([pooled14] + feats_sofar, axis=-1)
            if target == "V":
                visible_logits, f = MaskHeadHOM(
                    prefix="visible", n_guidance=1,
                    name="visible_mask_head")(inp, mlc)
                feats_sofar.append(f)
            elif target == "A":
                amodal_logits, f = MaskHeadHOM(
                    prefix="amodal", n_guidance=2,
                    name="amodal_mask_head")(inp, mlc)
                feats_sofar.append(f)
            else:
                occ_logits = OccClsHead(name="occ_cls_mask_head")(inp, mlc)

        out = {
            "boxes": det_boxes,
            "scores": det_scores,
            "valid": det_valid,
            "visible_logits": visible_logits,
            "amodal_logits": amodal_logits,
            "occ_logits": occ_logits,
        }
        if debug_boxes is not None:
            out.update(pyramid=pyramid, rpn_maps=rpn_maps,
                       cls_logits=cls_logits, box_deltas=box_deltas,
                       det_boxes_decoded=det_boxes_all)
        return out


class UOAISNetPretrainedBaseModel:
    """Eval-harness wrapper over imported reference UOAIS-Net weights,
    following eval/base_model.py:174-222: resize to 640x480, normalize +
    inpaint depth, detectron2 test-time resize (shortest edge 800), forward,
    paste visible (or amodal) masks back at 480x640, CGNet fg-overlap
    filter > 0.5 when fg params are given.
    """

    PIXEL_MEAN = (103.53, 116.28, 123.675, 127.5, 127.5, 127.5)

    def __init__(self, params=None, dataset="OSD", amodal=False, fg_params=None,
                 height=480, width=640, test_size=(800, 1088),
                 score_thresh=0.5, nms_thresh=0.5, seed=0):
        self.params = params
        self.dataset = dataset
        self.amodal = amodal
        self.height, self.width = height, width
        self.test_h, self.test_w = test_size
        self.model = UOAISNetPretrained(score_thresh=score_thresh,
                                        nms_thresh=nms_thresh)
        if self.params is None:  # random init: perf benchmarking only
            self.params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((self.test_h, self.test_w, 6), jnp.float32),
            )["params"]
        self.fg = None
        if fg_params is not None:
            from quber_tpu.models.fg_predictor import CGNetPredictor

            self.fg = CGNetPredictor(fg_params)
        self._pipeline = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    def predict(self, rgb_path, depth_path):
        import time

        import cv2
        import imageio.v2 as imageio
        import numpy as np

        from quber_tpu.ops.preprocess import inpaint_depth, normalize_depth

        h, w = self.height, self.width
        rgb = cv2.imread(rgb_path)  # BGR, matching detectron2 input format
        rgb = cv2.resize(rgb, (w, h))
        if depth_path and depth_path.endswith(".npy"):
            depth = normalize_depth(np.load(depth_path), 0.25, 1.5)
        elif depth_path:
            depth = normalize_depth(np.asarray(imageio.imread(depth_path)))
        else:
            depth = np.zeros((h, w, 3), np.uint8)
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
        depth = inpaint_depth(depth)

        # detectron2 ResizeShortestEdge(800) + pad to size_divisibility
        th, tw = self.test_h, self.test_w
        scale = th / h
        rw = int(round(w * scale))
        x = np.zeros((th, tw, 6), np.float32)
        x[:, :rw, :3] = cv2.resize(rgb, (rw, th)).astype(np.float32)
        x[:, :rw, 3:] = cv2.resize(depth, (rw, th),
                                   interpolation=cv2.INTER_NEAREST)
        x -= np.asarray(self.PIXEL_MEAN, np.float32)

        t0 = time.time()
        out = self._pipeline(self.params, jnp.asarray(x))
        boxes = np.asarray(out["boxes"]) / scale
        valid = np.asarray(out["valid"])
        logits = np.asarray(
            out["amodal_logits"] if self.amodal else out["visible_logits"])
        elapsed = time.time() - t0

        masks = []
        for box, logit, ok in zip(boxes, logits, valid):
            if not ok:
                continue
            x0, y0, x1, y1 = box
            bw, bh = int(round(x1 - x0)), int(round(y1 - y0))
            if bw < 1 or bh < 1:
                continue
            m = cv2.resize(1.0 / (1.0 + np.exp(-logit)), (bw, bh)) > 0.5
            full = np.zeros((h, w), bool)
            ix0, iy0 = max(int(x0), 0), max(int(y0), 0)
            ix1, iy1 = min(int(x0) + bw, w), min(int(y0) + bh, h)
            full[iy0:iy1, ix0:ix1] = m[iy0 - int(y0):iy1 - int(y0),
                                       ix0 - int(x0):ix1 - int(x0)]
            if full.any():
                masks.append(full)
        masks = (np.asarray(masks) if masks
                 else np.zeros((0, h, w), bool))

        fg_mask = None
        if self.fg is not None and len(masks):
            fg_mask = self.fg.predict(rgb_path, depth_path)
            keep = [m.sum() > 0 and
                    (m & fg_mask).sum() / m.sum() > 0.5 for m in masks]
            masks = masks[np.asarray(keep, bool)]
        if fg_mask is None:
            fg_mask = masks.any(0) if len(masks) else np.zeros((h, w), bool)
        return masks.astype(bool), fg_mask, elapsed
