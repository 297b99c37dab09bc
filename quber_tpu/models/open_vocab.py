"""Open-vocabulary base segmenters: Detic-class and GroundedSAM-class.

TPU-native functional equivalents of the reference's open-vocabulary
wrappers (/root/reference/eval/base_model.py: Detic :108-172, GroundedSAM
:301-440). The reference loads pretrained CLIP/GroundingDINO/SAM
checkpoints from the network; this environment has zero egress, so these
models are architecture-complete with randomly initialized weights and a
documented import seam (quber_tpu.models.import_torch) for real
checkpoints:

  * TextEncoder — CLIP-text-role tower: hash-bucket tokenization (no
    downloadable vocab files), learned embeddings + transformer blocks +
    masked mean pool, L2-normalized output. Class names / grounding
    phrases become embedding rows.
  * DeticDetector — RGB-only FPN detector whose classifier is a dot
    product between ROI embeddings and the text-embedding matrix
    (Detic's open-vocabulary head over CenterNet2; the reference wrapper
    drives it with per-dataset custom vocabularies and a 0.5 confidence
    threshold, base_model.py:146-155).
  * GroundedSAMBaseModel — text-prompted grounding ("A rigid object.",
    base_model.py:338) producing boxes above box_thr, NMS 0.5, then SAM
    box-prompted mask decoding per kept box (the reference's
    GroundingDINO + SamPredictor pipeline, base_model.py:336-440).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.uoais_net import (
    ANCHOR_SIZES,
    ASPECT_RATIOS,
    FPN_STRIDES,
    ROI_STRIDES,
    RPNHead,
    _multilevel_anchors,
    paste_masks,
)
from quber_tpu.models.resnet import ResNetTrunk
from quber_tpu.ops import boxes as box_ops

# per-dataset custom vocabularies (reference base_model.py:146-151)
VOCABULARIES = {
    "OCID": (
        "food_box shampoo lemon peach food_can potato flashlight orange pear "
        "sponge ball bowl hand_towel toothpaste apple banana soda_can "
        "cereal_box coffee_mug food_bag keyboard stapler tomato bell_pepper "
        "binder glue_stick instant_noodles kleenex lime marker pitcher_base "
        "master_chef_can tuna_fish_can mini_soccer_ball softball baseball "
        "tennis_ball racquetball golf_ball mug bleach_cleanser drill clamp "
        "chips_can cracker_box pudding_box gelatin_box wood_block sugar_box "
        "foam_brick rubiks_cube lego_duplo nine_hole_peg_test timer"
    ).split(),
    "OSD": (
        "box cereal_box food_box block chips_can mug bowl cookie_can "
        "cylindric_object book cd drinks bottle"
    ).split(),
}


def hash_tokenize(texts, vocab_size: int = 16384, max_len: int = 16):
    """Whitespace/underscore tokens hashed into fixed vocab buckets.

    No downloadable vocabulary exists in this environment; hashing gives a
    deterministic, collision-tolerant token id space (ids 1..vocab_size-1;
    0 is padding). Returns (ids [B, max_len] i32, mask [B, max_len] bool).
    """
    ids = np.zeros((len(texts), max_len), np.int32)
    mask = np.zeros((len(texts), max_len), bool)
    for b, text in enumerate(texts):
        words = text.lower().replace("_", " ").replace(".", " ").split()
        for i, wrd in enumerate(words[:max_len]):
            # FNV-1a, stable across processes (unlike Python's hash())
            h = 14695981039346656037
            for ch in wrd.encode():
                h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            ids[b, i] = h % (vocab_size - 1) + 1
            mask[b, i] = True
    return ids, mask


class TextEncoder(nn.Module):
    """Hash-token transformer text tower -> L2-normalized embeddings."""

    vocab_size: int = 16384
    dim: int = 256
    out_dim: int = 256
    depth: int = 2
    num_heads: int = 8
    max_len: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids, mask):
        d = self.dtype
        x = nn.Embed(self.vocab_size, self.dim, dtype=d, name="token_embed")(ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.dim))
        x = x + pos[None, : ids.shape[1]].astype(d)
        attn_mask = mask[:, None, None, :] & mask[:, None, :, None]
        for i in range(self.depth):
            y = nn.LayerNorm(dtype=d, name=f"ln_a{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                self.num_heads, dtype=d, name=f"attn{i}"
            )(y, y, mask=attn_mask)
            x = x + y
            y = nn.LayerNorm(dtype=d, name=f"ln_m{i}")(x)
            y = nn.Dense(self.dim * 4, dtype=d, name=f"mlp_up{i}")(y)
            y = nn.Dense(self.dim, dtype=d, name=f"mlp_down{i}")(nn.gelu(y))
            x = x + y
        w = mask.astype(jnp.float32)[..., None]
        pooled = jnp.sum(x.astype(jnp.float32) * w, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1.0
        )
        out = nn.Dense(self.out_dim, dtype=d, name="proj")(pooled.astype(d))
        out = out.astype(jnp.float32)
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6)


class SingleFPN(nn.Module):
    """RGB-only R50 + FPN p2..p6 (CenterNet2/GroundingDINO backbone role)."""

    dim: int = 256
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb):
        t, d = self.train, self.dtype
        levels = ("res2", "res3", "res4", "res5")
        feats = ResNetTrunk(
            depth=50, stem_type="basic", stem_out_channels=64,
            res5_dilation=1, res5_multi_grid=(1, 1, 1), out_features=levels,
            norm=self.norm, train=t, dtype=d, name="trunk",
        )(rgb.astype(d))
        laterals = {
            f: nn.Conv(self.dim, (1, 1), dtype=d, name=f"lateral_{f}")(feats[f])
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
        outs["p6"] = outs["p5"][:, ::2, ::2, :]
        return outs


class DeticDetector(nn.Module):
    """Open-vocabulary detector: class scores are ROI-embedding x
    text-embedding dot products (Detic's CLIP classifier head).

    forward(rgb [1, H, W, 3], text_embeds [C, D]) -> fixed-shape dict:
    boxes [K, 4], scores [K], classes [K], valid [K], masks [K, 28, 28].
    """

    max_proposals: int = 128
    max_detections: int = 32
    pre_nms_topk_per_level: int = 128
    embed_dim: int = 256
    norm: str = "FrozenBN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, text_embeds, gt_proposals=None):
        t, d = self.train, self.dtype
        h, w = rgb.shape[1], rgb.shape[2]
        fpn = SingleFPN(norm=self.norm, train=t, dtype=d, name="backbone")(rgb)

        rpn = RPNHead(num_anchors=len(ASPECT_RATIOS), dtype=d, name="rpn")
        anchors = _multilevel_anchors(h, w)
        lvl_scores, lvl_boxes = [], []
        all_obj, all_deltas, all_anchors = [], [], []
        for name in FPN_STRIDES:
            obj, deltas = rpn(fpn[name])
            obj = obj[0].reshape(-1).astype(jnp.float32)
            deltas = deltas[0].reshape(-1, 4).astype(jnp.float32)
            props = box_ops.apply_deltas(anchors[name], deltas, clip_hw=(h, w))
            k = min(self.pre_nms_topk_per_level, obj.shape[0])
            s, idx = jax.lax.top_k(obj, k)
            lvl_scores.append(s)
            lvl_boxes.append(props[idx])
            all_obj.append(obj)
            all_deltas.append(deltas)
            all_anchors.append(anchors[name])
        cand_scores = jnp.concatenate(lvl_scores)
        cand_boxes = jnp.concatenate(lvl_boxes, axis=0)
        keep = box_ops.nms_fixed(cand_boxes, cand_scores, 0.7)
        order = jnp.argsort(-jnp.where(keep, cand_scores, -jnp.inf))
        p = self.max_proposals
        prop_boxes = cand_boxes[order][:p]
        prop_valid = keep[order][:p]
        det_boost = jnp.zeros((p,), jnp.float32)
        if gt_proposals is not None:
            # training: GT boxes spliced into the proposal set so the ROI
            # embedding / box / mask heads see positives from step one
            # (uoais_net.py gt_proposals semantics)
            g = gt_proposals.shape[0]
            gt_ok = (gt_proposals[:, 2] > gt_proposals[:, 0]) & (
                gt_proposals[:, 3] > gt_proposals[:, 1]
            )
            prop_boxes = jnp.concatenate(
                [prop_boxes[: p - g], jnp.asarray(gt_proposals, jnp.float32)]
            )
            prop_valid = jnp.concatenate([prop_valid[: p - g], gt_ok])
            det_boost = det_boost.at[p - g:].set(jnp.where(gt_ok, 2.0, 0.0))

        feats = {k: fpn[k][0].astype(jnp.float32) for k in ROI_STRIDES}
        roi7 = box_ops.roi_align_multilevel(feats, prop_boxes, 7, ROI_STRIDES)
        x = roi7.astype(d)
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=d, name=f"conv{i}")(x))
        pooled = jnp.mean(x, axis=(1, 2))
        emb = nn.Dense(self.embed_dim, dtype=d, name="embed")(pooled).astype(jnp.float32)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)
        temp = self.param("logit_scale", nn.initializers.constant(4.6), ())
        cls_logits = jnp.exp(temp) * emb @ text_embeds.T  # [P, C]
        box_deltas = nn.Dense(4, dtype=d, name="box_deltas")(pooled).astype(jnp.float32)
        final_boxes = box_ops.apply_deltas(prop_boxes, box_deltas, clip_hw=(h, w))

        cls_prob = jax.nn.sigmoid(cls_logits)
        best_cls = jnp.argmax(cls_prob, axis=-1)
        best_score = jnp.where(prop_valid, jnp.max(cls_prob, axis=-1), 0.0)
        det_keep = box_ops.nms_fixed(
            final_boxes, jnp.where(prop_valid, best_score + det_boost, -1.0), 0.5
        ) & prop_valid
        det_order = jnp.argsort(
            -jnp.where(det_keep, best_score + det_boost, -jnp.inf))
        kk = self.max_detections
        det_idx = det_order[:kk]

        det_boxes = final_boxes[det_idx]
        mask_roi = box_ops.roi_align_multilevel(
            feats, det_boxes, 14, ROI_STRIDES
        ).astype(d)
        y = mask_roi
        for i in range(4):
            y = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=d, name=f"mask{i}")(y))
        y = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=d,
                                     name="mask_deconv")(y))
        mask_logits = nn.Conv(1, (1, 1), dtype=d, name="mask_pred")(y)[..., 0]

        return {
            "boxes": det_boxes,
            "scores": best_score[det_idx],
            "classes": best_cls[det_idx],
            "valid": det_keep[det_idx],
            "masks": mask_logits.astype(jnp.float32),
            # training intermediates (detic_losses assigns targets to these)
            "anchors": jnp.concatenate(all_anchors, axis=0),
            "rpn_objectness": jnp.concatenate(all_obj),
            "rpn_deltas": jnp.concatenate(all_deltas, axis=0),
            "proposal_boxes": prop_boxes,
            "proposal_valid": prop_valid,
            "cls_logits": cls_logits,
            "box_deltas": box_deltas,
            "det_index": det_idx,
        }


def make_text_tower(texts, bpe_path=None, clip_config=None):
    """Text tower factory: the exact CLIP stack when a BPE merges file is
    supplied (quber_tpu.models.clip_text — real CLIP weights load via
    import_zoo.import_clip_text), else the hash-bucket fallback tower.

    Returns (encoder_module, init_fn(key)->params, apply_fn(params)->[K,D]).
    """
    if bpe_path is not None:
        from quber_tpu.models.clip_text import CLIPTextEncoder, CLIPTokenizer

        encoder = CLIPTextEncoder(**(clip_config or {}))
        tokenizer = CLIPTokenizer(bpe_path, context_length=encoder.context_length)
        ids = jnp.asarray(tokenizer([t.replace("_", " ") for t in texts]))
        return (
            encoder,
            lambda key: jax.jit(encoder.init)(key, ids),
            lambda tp: encoder.apply(tp, ids),
        )
    encoder = TextEncoder()
    ids, mask = hash_tokenize(texts)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    return (
        encoder,
        lambda key: jax.jit(encoder.init)(key, ids, mask),
        lambda tp: encoder.apply(tp, ids, mask),
    )


class DeticBaseModel:
    """Eval-harness wrapper (reference base_model.py:108-172 semantics):
    per-dataset custom vocabulary, confidence threshold 0.5. Pass
    `bpe_path` (+ CLIP text params imported via import_clip_text in
    `params["text"]`) for the real CLIP vocabulary embedding."""

    def __init__(self, params=None, dataset="OSD", seed=0,
                 confidence_threshold=0.5, vocabulary=None,
                 bpe_path=None, clip_config=None):
        self.dataset = dataset
        self.vocabulary = vocabulary or VOCABULARIES.get(dataset, ["object"])
        self.text_encoder, init_text, self._apply_text = make_text_tower(
            self.vocabulary, bpe_path, clip_config)
        self.detector = DeticDetector(dtype=jnp.bfloat16)
        if params is None:
            key = jax.random.PRNGKey(seed)
            tp = init_text(key)
            embeds = self._apply_text(tp)
            dp = jax.jit(self.detector.init)(
                key, jnp.zeros((1, 480, 640, 3)), embeds
            )
            params = {"text": tp, "detector": dp}
        self.params = params
        self.confidence_threshold = confidence_threshold

        def pipeline(params, rgb):
            embeds = self._apply_text(params["text"])
            out = self.detector.apply(params["detector"], rgb[None], embeds)
            ok = out["valid"] & (out["scores"] > confidence_threshold)
            masks = paste_masks(out["masks"], out["boxes"], ok, 480, 640)
            return masks, ok, out["scores"], out["classes"]

        self._pipeline = jax.jit(pipeline)

    def predict(self, rgb_path, depth_path=None):
        import time

        import cv2

        rgb = cv2.resize(cv2.imread(rgb_path), (640, 480)).astype(np.float32)
        t0 = time.time()
        masks, ok, scores, classes = self._pipeline(self.params, jnp.asarray(rgb))
        masks, ok = np.asarray(masks), np.asarray(ok)
        return masks[ok], None, time.time() - t0


def detic_losses(
    outputs: dict,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_masks: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rpn_pos_iou: float = 0.7,
    rpn_neg_iou: float = 0.3,
    roi_pos_iou: float = 0.5,
):
    """Open-vocabulary detector losses (the Detic/CenterNet2 recipe shape):
    RPN objectness BCE + smooth-L1 deltas; per-class sigmoid BCE on the
    ROI-embedding x text-embedding logits (positives target their matched
    GT class one-hot, negatives all-zero — the text tower trains jointly
    through this term, which is what makes the head open-vocabulary);
    box regression and 28^2 mask BCE on positives. Fixed-shape with
    per-element weights, mirroring uoais_net.uoais_losses.

    gt_boxes [N, 4] XYXY, gt_classes [N] int32, gt_masks [N, H, W],
    gt_valid [N].
    """
    from quber_tpu.models.uoais_net import _smooth_l1

    anchors = outputs["anchors"]
    iou = jnp.where(gt_valid[None, :],
                    box_ops.box_iou(anchors, gt_boxes), 0.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    per_gt_best = jnp.argmax(iou, axis=0)
    forced_pos = jnp.zeros(anchors.shape[0], bool).at[per_gt_best].set(
        jnp.asarray(gt_valid))
    pos = (best_iou > rpn_pos_iou) | forced_pos
    neg = best_iou < rpn_neg_iou

    obj = outputs["rpn_objectness"]
    t = pos.astype(jnp.float32)
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

    props = outputs["proposal_boxes"]
    prop_valid = outputs["proposal_valid"]
    piou = jnp.where(gt_valid[None, :], box_ops.box_iou(props, gt_boxes), 0.0)
    p_best = jnp.max(piou, axis=1)
    p_gt = jnp.argmax(piou, axis=1)
    p_pos = (p_best > roi_pos_iou) & prop_valid

    # per-class sigmoid BCE over the text-similarity logits [P, C]
    logits = outputs["cls_logits"]
    n_cls = logits.shape[-1]
    onehot = jax.nn.one_hot(gt_classes[p_gt], n_cls)
    tcls = jnp.where(p_pos[:, None], onehot, 0.0)
    cv = prop_valid.astype(jnp.float32)[:, None]
    cp = tcls * cv
    cn = (1.0 - tcls) * cv
    cw = (0.25 * cp / jnp.maximum(cp.sum(), 1.0)
          + 0.75 * cn / jnp.maximum(cn.sum(), 1.0))
    cls_bce = (jnp.maximum(logits, 0) - logits * tcls
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    loss_cls = jnp.sum(cls_bce * cw)

    roi_deltas_t = box_ops.boxes_to_deltas(props, gt_boxes[p_gt])
    rw = p_pos.astype(jnp.float32)[:, None]
    loss_box = jnp.sum(
        _smooth_l1(outputs["box_deltas"] - roi_deltas_t) * rw
    ) / jnp.maximum(rw.sum() * 4, 1.0)

    det_idx = outputs["det_index"]
    d_gt = p_gt[det_idx]
    d_pos = p_pos[det_idx] & outputs["valid"]
    det_boxes = outputs["boxes"]
    m = outputs["masks"].shape[-1]

    def one(logit, box, gi, ok):
        target = box_ops.roi_align(
            gt_masks[gi][..., None].astype(jnp.float32), box[None], out_size=m
        )[0, ..., 0]
        target = (target > 0.5).astype(jnp.float32)
        bce = (jnp.maximum(logit, 0) - logit * target
               + jnp.log1p(jnp.exp(-jnp.abs(logit))))
        return jnp.mean(bce) * ok

    per = jax.vmap(one)(outputs["masks"], det_boxes, d_gt,
                        d_pos.astype(jnp.float32))
    loss_mask = jnp.sum(per) / jnp.maximum(d_pos.sum(), 1.0)

    return {
        "loss_rpn_objectness": loss_rpn_obj,
        "loss_rpn_box": loss_rpn_box,
        "loss_cls": loss_cls,
        "loss_box": loss_box,
        "loss_mask": loss_mask,
    }


class GroundedSAMBaseModel:
    """Text-grounded boxes -> SAM box-prompted masks (reference
    base_model.py:301-440: GroundingDINO boxes for "A rigid object." +
    SamPredictor box decoding + 0.5-IoU NMS)."""

    def __init__(self, params=None, dataset="OSD", seed=0,
                 text_prompt="A rigid object.", box_threshold=0.10,
                 sam_img_size=512, max_boxes=16, bpe_path=None,
                 clip_config=None, sam_arch=None):
        from quber_tpu.models.sam_hq import SAMHQ, init_sam_variables

        self.text_prompt = text_prompt
        self.max_boxes = max_boxes
        self.text_encoder, init_text, self._apply_text = make_text_tower(
            [text_prompt], bpe_path, clip_config)
        self.grounder = DeticDetector(max_detections=max_boxes, dtype=jnp.bfloat16)
        if sam_arch is not None:
            # a trained SAM at its own architecture (tools/train_zoo.py
            # --model gsam writes arch.json beside the checkpoint)
            sam_arch = dict(sam_arch)
            sam_arch["global_blocks"] = tuple(sam_arch["global_blocks"])
            sam_img_size = sam_arch["img_size"]
            self.sam = SAMHQ(**sam_arch, dtype=jnp.bfloat16)
        else:
            self.sam = SAMHQ(img_size=sam_img_size, dtype=jnp.bfloat16)
        if params is None:
            key = jax.random.PRNGKey(seed)
            tp = init_text(key)
            embeds = self._apply_text(tp)
            gp = jax.jit(self.grounder.init)(key, jnp.zeros((1, 480, 640, 3)), embeds)
            sp = init_sam_variables(self.sam, key)
            params = {"text": tp, "grounder": gp, "sam": sp}
        self.params = params
        self.box_threshold = box_threshold
        s = sam_img_size

        from quber_tpu.models.sam_hq import SAMHQ as _S

        def pipeline(params, rgb, sam_rgb):
            embeds = self._apply_text(params["text"])
            out = self.grounder.apply(params["grounder"], rgb[None], embeds)
            ok = out["valid"] & (out["scores"] > box_threshold)
            # SAM box prompts are pixel coords in the (square) SAM frame
            boxes = out["boxes"] / jnp.asarray([640.0, 480.0, 640.0, 480.0]) * s
            embed, interm = self.sam.apply(params["sam"], sam_rgb[None],
                                           method=_S.encode)

            def one(box):
                masks_out, _, _ = self.sam.apply(
                    params["sam"], embed, interm, box[None], False, True,
                    method=_S.decode_box
                )
                return masks_out[0, 0]

            masks_lr = jax.vmap(one)(boxes)  # [K, s/4, s/4]
            masks = jax.image.resize(
                masks_lr.astype(jnp.float32), (masks_lr.shape[0], 480, 640),
                "bilinear",
            )
            return masks > 0, ok, out["scores"]

        self._pipeline = jax.jit(pipeline)
        self._sam_size = s

    def predict(self, rgb_path, depth_path=None):
        import time

        import cv2

        from quber_tpu.models.sam_refiner import SAM_PIXEL_MEAN, SAM_PIXEL_STD

        rgb = cv2.resize(cv2.imread(rgb_path), (640, 480)).astype(np.float32)
        sam_rgb = (
            cv2.resize(rgb[..., ::-1], (self._sam_size, self._sam_size))
            - SAM_PIXEL_MEAN
        ) / SAM_PIXEL_STD
        t0 = time.time()
        masks, ok, scores = self._pipeline(
            self.params, jnp.asarray(rgb), jnp.asarray(sam_rgb)
        )
        masks, ok = np.asarray(masks), np.asarray(ok)
        return masks[ok], None, time.time() - t0
