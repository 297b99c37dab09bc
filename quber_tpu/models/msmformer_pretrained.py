"""Weight-compatible MSMFormer ("Pretrained" deployed variant).

The reference's deployed MSMFormer checkpoints (norm_model_0069999.pth and
crop_dec9_model_final.pth, eval/base_model.py:963-1012) are NOT the
deformable-attention Mask2Former in quber_tpu/models/msmformer.py — they are
the `PretrainedMeanShiftMaskFormer` meta-arch
(ext_modules/UnseenObjectsWithMeanShift/MSMFormer/meanshiftformer/
pretrained_meanshiftformer_model.py:51): a frozen-architecture stack of

  * UCN Resnet34_8s dual-branch RGB+XYZ "add" backbone (reused verbatim
    from quber_tpu.models.ucn.UCNEmbeddingNet — same trunks the UCN
    importer fills), output L2-normalized per pixel;
  * SimpleBasePixelDecoder (modeling/pixel_decoder/fpn.py:162-289): a
    single 3x3 conv 64->256 producing mask features, the 64-ch feature
    itself as the (single) transformer memory level;
  * PretrainedMeanShiftTransformerDecoder
    (modeling/transformer_decoder/meanshiftformer_transformer_decoder.py:
    698-1010): DEC_LAYERS-1 = 6 blocks of [mean-shift cross-attention ->
    mean-shift self-attention -> FFN -> L2 row normalize], post-norm,
    sine position encodings, learned query_feat/query_embed/level_embed,
    class + 3-layer mask-embed heads applied before layer 0 and after
    every layer (deep supervision).

Mean-shift ("hypersphere"/von-Mises-Fisher) attention
(modeling/transformer_decoder/attention_util.py:26-86): standard packed
qkv + out projections, but per head q and k are L2-normalized, logits are
kappa * cosine (kappa=30), and the per-head attention OUTPUT is
L2-normalized before the head merge — each head's new cluster center is a
softmax-weighted spherical mean of the value vectors.

This module preserves those semantics exactly so reference checkpoints map
1:1 (see import_zoo.import_msmformer); the TPU-first redesign for training
and fixed-shape serving stays in quber_tpu/models/msmformer.py.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from quber_tpu.models.ucn import UCNEmbeddingNet


def position_embedding_sine(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """DETR PositionEmbeddingSine(normalize=True) over an unpadded map.

    Returns [H*W, 2*num_pos_feats] (y-channels first, then x-channels),
    matching modeling/transformer_decoder/position_encoding.py:29-52 with
    mask=None (no padding), flattened in row-major (HW) order.
    """
    scale = 2 * math.pi
    eps = 1e-6
    y = jnp.arange(1, h + 1, dtype=jnp.float32)
    x = jnp.arange(1, w + 1, dtype=jnp.float32)
    y = y / (y[-1] + eps) * scale
    x = x / (x[-1] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def interleave(v):  # [L, F] -> sin on even idx, cos on odd idx
        ang = v[:, None] / dim_t
        return jnp.stack([jnp.sin(ang[:, 0::2]), jnp.cos(ang[:, 1::2])],
                         axis=2).reshape(v.shape[0], num_pos_feats)

    pos_y = interleave(y)  # [H, F]
    pos_x = interleave(x)  # [W, F]
    grid = jnp.concatenate(
        [jnp.broadcast_to(pos_y[:, None, :], (h, w, num_pos_feats)),
         jnp.broadcast_to(pos_x[None, :, :], (h, w, num_pos_feats))], axis=-1)
    return grid.reshape(h * w, 2 * num_pos_feats)


def _l2n(v, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


class MeanShiftAttention(nn.Module):
    """nn.MultiheadAttention layout with hypersphere attention math."""

    dim: int
    heads: int
    kappa: float = 30.0

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask: Optional[jnp.ndarray] = None):
        """q_in [B,L,E], k_in/v_in [B,S,E]; mask [B,H,L,S] additive float.
        Returns [B,L,E]."""
        d, h = self.dim, self.heads
        hd = d // h
        q = nn.Dense(d, name="q_proj")(q_in)
        k = nn.Dense(d, name="k_proj")(k_in)
        v = nn.Dense(d, name="v_proj")(v_in)

        def split(t):  # [B,L,E] -> [B,H,L,hd]
            b, l, _ = t.shape
            return t.reshape(b, l, h, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        q = _l2n(q)
        k = _l2n(k)
        logits = self.kappa * jnp.einsum("bhld,bhsd->bhls", q, k)
        if mask is not None:
            logits = logits + mask
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhls,bhsd->bhld", attn, v)
        out = _l2n(out)  # spherical mean: renormalized per head
        b, _, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, name="out_proj")(out)


class _FFN(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, name="linear1")(x)
        y = nn.Dense(self.dim, name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + y)


class _MaskEmbedMLP(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, name="layers_0")(x))
        x = nn.relu(nn.Dense(self.hidden, name="layers_1")(x))
        return nn.Dense(self.out, name="layers_2")(x)


class PretrainedMSMDecoder(nn.Module):
    """PretrainedMeanShiftTransformerDecoder, single feature level."""

    in_channels: int = 64
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 6  # DEC_LAYERS(7) - 1, meanshiftformer_transformer_decoder.py:878-886
    num_classes: int = 2
    mask_dim: int = 256
    kappa: float = 30.0

    @nn.compact
    def __call__(self, feat, mask_features):
        """feat [B,H,W,Cin] (the normalized UCN embedding map);
        mask_features [B,H,W,mask_dim]. Returns (pred_logits [B,Q,C+1],
        pred_masks [B,Q,H,W], aux list of per-layer (logits, masks))."""
        b, h, w, _ = feat.shape
        dim, nq = self.hidden_dim, self.num_queries

        pos = position_embedding_sine(h, w, dim // 2)[None]  # [1,HW,dim]
        src = nn.Conv(dim, (1, 1), name="input_proj_0")(feat)
        src = src.reshape(b, h * w, dim)
        src = src + self.param(
            "level_embed", nn.initializers.normal(1.0), (1, dim))[0]

        query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                (nq, dim))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (nq, dim))
        output = jnp.broadcast_to(query_feat[None], (b, nq, dim))
        qpos = query_embed[None]

        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_embed = _MaskEmbedMLP(dim, self.mask_dim, name="mask_embed")

        def prediction_heads(out):
            dec = decoder_norm(out)
            logits = class_embed(dec)
            emb = mask_embed(dec)  # [B,Q,mask_dim]
            masks = jnp.einsum("bqc,bhwc->bqhw", emb, mask_features)
            # attention mask: block keys where sigmoid(mask) < 0.5; rows
            # with every key blocked are fully unblocked
            # (meanshiftformer_transformer_decoder.py:970,1027-1033; the
            # bilinear resize to the key grid is the identity here — the
            # single level IS the mask-feature resolution)
            blocked = jax.nn.sigmoid(masks.reshape(b, nq, h * w)) < 0.5
            blocked = jnp.where(jnp.all(blocked, -1, keepdims=True), False,
                                blocked)
            attn_mask = jnp.where(blocked, -jnp.inf, 0.0)[:, None]  # [B,1,Q,HW]
            return logits, masks, jax.lax.stop_gradient(attn_mask)

        aux = []
        logits, masks, attn_mask = prediction_heads(output)
        aux.append((logits, masks))
        for i in range(self.dec_layers):
            # cross-attention (post-norm): q = tgt+qpos, k = mem+pos, v = mem
            t2 = MeanShiftAttention(dim, self.nheads, self.kappa,
                                    name=f"cross_attn_{i}")(
                output + qpos, src + pos, src, mask=attn_mask)
            output = nn.LayerNorm(epsilon=1e-5, name=f"cross_norm_{i}")(
                output + t2)
            # self-attention: q = k = tgt+qpos, v = tgt
            t2 = MeanShiftAttention(dim, self.nheads, self.kappa,
                                    name=f"self_attn_{i}")(
                output + qpos, output + qpos, output)
            output = nn.LayerNorm(epsilon=1e-5, name=f"self_norm_{i}")(
                output + t2)
            output = _FFN(dim, self.dim_feedforward, name=f"ffn_{i}")(output)
            output = _l2n(output)  # DECODER_BLOCK_NORM
            logits, masks, attn_mask = prediction_heads(output)
            aux.append((logits, masks))
        return logits, masks, aux[:-1]


class PretrainedMSMFormer(nn.Module):
    """Full deployed MSMFormer: UCN backbone + pixel decoder + decoder.

    `embed_dim`/decoder dims are configurable only so oracle tests can run
    scaled down; reference checkpoints use the defaults.
    """

    embed_dim: int = 64
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 6
    num_classes: int = 2
    mask_dim: int = 256
    train: bool = False

    @nn.compact
    def __call__(self, rgb, xyz):
        """rgb [B,H,W,3] (mean-subtracted, /255 scale), xyz [B,H,W,3]
        backprojected point cloud. Returns dict(pred_logits [B,Q,C+1],
        pred_masks [B,Q,H,W], aux)."""
        emb = UCNEmbeddingNet(self.embed_dim, train=self.train,
                              name="backbone")(rgb, xyz)
        # meta-arch re-normalizes (idempotent after UCNEmbeddingNet) then
        # feeds the same map both as memory and through mask_features
        # (pretrained_meanshiftformer_model.py:297-302)
        emb = _l2n(emb)
        mask_features = nn.Conv(self.mask_dim, (3, 3), padding=[(1, 1)] * 2,
                                name="mask_features")(emb)
        logits, masks, aux = PretrainedMSMDecoder(
            in_channels=self.embed_dim, hidden_dim=self.hidden_dim,
            num_queries=self.num_queries, nheads=self.nheads,
            dim_feedforward=self.dim_feedforward, dec_layers=self.dec_layers,
            num_classes=self.num_classes, mask_dim=self.mask_dim,
            name="predictor")(emb, mask_features)
        return {"pred_logits": logits, "pred_masks": masks, "aux": aux}


class PretrainedMSMFormerBaseModel:
    """Eval-harness wrapper over imported reference MSMFormer weights:
    predict(rgb_path, depth_path) -> (masks [N,H,W], fg [H,W], seconds).

    Follows the reference wrapper flow (eval/base_model.py:963-1078,
    1142-1156): standardize RGB, depth -> XYZ cloud, forward, keep
    instances with pred_class==1 and score>0.7, sigmoid masks, mask-IoU
    NMS at 0.7, area-sorted.
    """

    def __init__(self, params, dataset="OSD", score_thresh=0.7,
                 nms_thresh=0.7, height=480, width=640):
        self.model = PretrainedMSMFormer()
        self.params = params
        self.dataset = dataset
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.height, self.width = height, width

        def pipeline(params, rgb, xyz):
            out = self.model.apply(params, rgb[None], xyz[None])
            probs = jax.nn.softmax(out["pred_logits"][0], axis=-1)
            return {"scores": probs[:, 1], "cls": jnp.argmax(probs, -1),
                    "masks": jax.nn.sigmoid(out["pred_masks"][0]) > 0.5}

        self._pipeline = jax.jit(pipeline)

    def predict(self, rgb_path, depth_path):
        import time

        import cv2
        import imageio.v2 as imageio
        import numpy as np

        from quber_tpu.ops.preprocess import compute_xyz, standardize_image

        h, w = self.height, self.width
        rgb = cv2.imread(rgb_path)
        rgb = cv2.resize(rgb, (w, h))
        rgb_in = standardize_image(rgb[..., ::-1])
        if depth_path and depth_path.endswith(".npy"):
            depth_m = np.load(depth_path)
        elif depth_path:
            depth_m = np.asarray(imageio.imread(depth_path)).astype(np.float32) / 1000.0
        else:
            depth_m = np.zeros((h, w), np.float32)
        depth_m = cv2.resize(depth_m, (w, h), interpolation=cv2.INTER_NEAREST)
        xyz = compute_xyz(depth_m, {"fx": 550.0, "fy": 550.0,
                                    "x_offset": w / 2.0, "y_offset": h / 2.0,
                                    "img_width": w, "img_height": h})
        t0 = time.time()
        out = self._pipeline(self.params, jnp.asarray(rgb_in), jnp.asarray(xyz))
        scores = np.asarray(out["scores"])
        cls = np.asarray(out["cls"])
        masks = np.asarray(out["masks"])
        elapsed = time.time() - t0

        keep = (cls == 1) & (scores > self.score_thresh) & masks.any((1, 2))
        masks, scores = masks[keep], scores[keep]
        if not len(masks):
            return (np.zeros((0, h, w), bool), np.zeros((h, w), bool),
                    elapsed)
        # mask-IoU NMS, score-descending (base_model.py:1066-1086)
        flat = masks.reshape(len(masks), -1).astype(np.float32)
        inter = flat @ flat.T
        areas = np.diag(inter)
        order = np.argsort(-scores)
        kept = []
        while order.size:
            i = order[0]
            kept.append(i)
            iou = inter[i, order[1:]] / (
                areas[i] + areas[order[1:]] - inter[i, order[1:]] + 1e-9)
            order = order[1:][iou <= self.nms_thresh]
        kept = np.asarray(kept, int)[np.argsort(areas[np.asarray(kept, int)])] \
            if kept else np.zeros(0, int)
        masks = masks[kept]
        fg = masks.any(0) if len(masks) else np.zeros((h, w), bool)
        return masks.astype(bool), fg, elapsed
