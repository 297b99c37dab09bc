"""SAM-HQ-class promptable mask refiner (ViT encoder + HQ mask decoder).

TPU-native rebuild of the reference's HQ-SAM baseline
(/root/reference/sam-hq/segment_anything/modeling/{image_encoder,
mask_decoder_hq,prompt_encoder,transformer}.py and the fine-tuned wrapper at
eval/refiner_model.py:554-664, prompt_type='mask'): a windowed-attention ViT
image encoder, a mask prompt encoder (strided conv stack), and a two-way
transformer mask decoder extended with the HQ output token fused with
global (early ViT) and local (final ViT) features.

Sizes follow the SAM family; the default here is ViT-B-scale (the reference
fine-tunes ViT-H — set embed_dim/depth/num_heads accordingly). Attention is
plain dot-product attention, which XLA fuses well on the MXU at these sizes;
images are 1024x1024 with 16x16 patches -> 64x64 tokens.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import upsample_bilinear


class MLPBlock(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_unpartition(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 0  # 0 = global attention
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            x = window_partition(x, ws)
            hh = ww = ws
        else:
            hh, ww = h, w
        tokens = x.reshape(x.shape[0], hh * ww, c)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(tokens, tokens)
        x = attn.reshape(x.shape[0], hh, ww, c)
        if ws > 0:
            x = window_unpartition(x, ws, h, w)
        x = shortcut + x
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        return x + MLPBlock(c, int(c * self.mlp_ratio), self.dtype, name="mlp")(y)


class SAMImageEncoder(nn.Module):
    """ViT with windowed attention + periodic global blocks -> 256-ch neck."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    window_size: int = 14
    global_blocks: Sequence[int] = (2, 5, 8, 11)
    out_chans: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), dtype=d,
                    name="patch_embed")(x.astype(d))
        hp = wp = self.img_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, hp, wp, self.embed_dim))
        # window attention needs the grid padded to a window multiple
        pad = (-hp) % self.window_size
        x = x + pos.astype(d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        early = None
        for i in range(self.depth):
            ws = 0 if i in self.global_blocks else self.window_size
            x = ViTBlock(self.embed_dim, self.num_heads, ws, dtype=d,
                         name=f"block_{i}")(x)
            if i == 0:
                early = x
        if pad:
            x = x[:, :hp, :wp]
            early = early[:, :hp, :wp]
        neck = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=d, name="neck1")(x)
        neck = nn.LayerNorm(dtype=d, name="neck_ln1")(neck)
        neck = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=d,
                       name="neck2")(neck)
        neck = nn.LayerNorm(dtype=d, name="neck_ln2")(neck)
        return neck.astype(jnp.float32), early.astype(jnp.float32)


class MaskPromptEncoder(nn.Module):
    """Mask prompt -> dense embedding (prompt_encoder.py mask path):
    2x stride-2 convs + 1x1 to the embed dim, at the image-embedding grid."""

    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mask):
        d = self.dtype
        x = nn.Conv(self.embed_dim // 8, (2, 2), strides=(2, 2), dtype=d, name="down1")(mask.astype(d))
        x = nn.LayerNorm(dtype=d, name="ln1")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.embed_dim // 2, (2, 2), strides=(2, 2), dtype=d, name="down2")(x)
        x = nn.LayerNorm(dtype=d, name="ln2")(x)
        x = nn.gelu(x)
        return nn.Conv(self.embed_dim, (1, 1), dtype=d, name="proj")(x).astype(jnp.float32)


class PointPromptEncoder(nn.Module):
    """Sparse point prompts -> tokens (prompt_encoder.py point path):
    random-Fourier positional encoding of normalized coords + a learned
    label embedding (0 = background point, 1 = foreground point,
    2 = box top-left corner, 3 = box bottom-right corner — the reference
    prompt_encoder.py box path encodes a box as these two labeled points)."""

    embed_dim: int = 256
    num_labels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, labels):
        """points [P, 2] normalized (x, y) in [0,1]; labels [P] int."""
        gauss = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2)
        )
        proj = (2.0 * points - 1.0) @ gauss * (2 * np.pi)
        pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        label_embed = self.param(
            "label_embed", nn.initializers.normal(0.02),
            (self.num_labels, self.embed_dim),
        )
        return (pe + label_embed[labels]).astype(self.dtype)


class TwoWayBlock(nn.Module):
    dim: int = 256
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys):
        d = self.dtype
        q = nn.MultiHeadDotProductAttention(self.num_heads, dtype=d, name="self_attn")(queries, queries)
        queries = nn.LayerNorm(dtype=d, name="ln1")(queries + q)
        q = nn.MultiHeadDotProductAttention(self.num_heads, dtype=d, name="cross_q2k")(queries, keys)
        queries = nn.LayerNorm(dtype=d, name="ln2")(queries + q)
        m = MLPBlock(self.dim, self.dim * 8, d, name="mlp")(queries)
        queries = nn.LayerNorm(dtype=d, name="ln3")(queries + m)
        k = nn.MultiHeadDotProductAttention(self.num_heads, dtype=d, name="cross_k2q")(keys, queries)
        keys = nn.LayerNorm(dtype=d, name="ln4")(keys + k)
        return queries, keys


class HQMaskDecoder(nn.Module):
    """Two-way transformer decoder with SAM + HQ output tokens.

    The HQ path (mask_decoder_hq.py / train.py:67-319): the HQ token's
    hypernetwork output convolves an HQ feature map built by fusing the
    upscaled decoder embedding with global (early ViT) and local (final ViT)
    features.
    """

    dim: int = 256
    depth: int = 2
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embed, prompt_embed, early_feat, point_tokens=None):
        d = self.dtype
        b, h, w, c = image_embed.shape
        src = (image_embed + prompt_embed).reshape(b, h * w, c).astype(d)

        mask_token = self.param("mask_token", nn.initializers.normal(0.02), (1, 1, c))
        hq_token = self.param("hq_token", nn.initializers.normal(0.02), (1, 1, c))
        iou_token = self.param("iou_token", nn.initializers.normal(0.02), (1, 1, c))
        tokens = jnp.concatenate([
            jnp.tile(iou_token, (b, 1, 1)),
            jnp.tile(mask_token, (b, 1, 1)),
            jnp.tile(hq_token, (b, 1, 1)),
        ], axis=1).astype(d)
        if point_tokens is not None:
            tokens = jnp.concatenate([tokens, point_tokens.astype(d)], axis=1)

        q, k = tokens, src
        for i in range(self.depth):
            q, k = TwoWayBlock(self.dim, self.num_heads, d, name=f"twoway_{i}")(q, k)
        q = nn.MultiHeadDotProductAttention(self.num_heads, dtype=d, name="final_attn")(q, k)

        feat = k.reshape(b, h, w, c)
        # upscale x4 with two transposed convs
        up = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), dtype=d, name="up1")(feat)
        up = nn.LayerNorm(dtype=d, name="up_ln")(up)
        up = nn.gelu(up)
        up = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2), dtype=d, name="up2")(up)
        up = nn.gelu(up)  # [B, 4h, 4w, c/8]

        # HQ feature: fuse upscaled embedding with early (global) + final
        # (local) ViT features
        early_p = nn.Conv(c // 8, (1, 1), dtype=d, name="early_proj")(early_feat.astype(d))
        late_p = nn.Conv(c // 8, (1, 1), dtype=d, name="late_proj")(image_embed.astype(d))
        fused = upsample_bilinear((early_p + late_p).astype(jnp.float32), size=(4 * h, 4 * w)).astype(d)
        hq_feat = up + nn.Conv(c // 8, (3, 3), padding=1, dtype=d, name="hq_fuse")(fused)

        def hyper(name, token_vec, feat_map):
            w_vec = MLPBlock(c // 8, c, d, name=name)(token_vec)
            return jnp.einsum("bhwc,bc->bhw", feat_map, w_vec)

        mask_logit = hyper("hyper_sam", q[:, 1], up)
        hq_logit = hyper("hyper_hq", q[:, 2], hq_feat)
        iou_pred = nn.Dense(2, dtype=d, name="iou_head")(q[:, 0])
        return (
            mask_logit.astype(jnp.float32),
            hq_logit.astype(jnp.float32),
            iou_pred.astype(jnp.float32),
        )


class SAMHQ(nn.Module):
    """Full model: encode once, decode per mask prompt (vmapped outside)."""

    img_size: int = 1024
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = SAMImageEncoder(
            img_size=self.img_size, embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, dtype=self.dtype,
        )
        self.prompt = MaskPromptEncoder(dtype=self.dtype)
        self.point_prompt = PointPromptEncoder(dtype=self.dtype)
        self.decoder = HQMaskDecoder(dtype=self.dtype)

    def encode(self, image):
        return self.encoder(image)

    def decode(self, image_embed, early_feat, mask_prompt):
        prompt = self.prompt(mask_prompt)
        return self.decoder(image_embed, prompt, early_feat)

    def decode_points(self, image_embed, early_feat, points, labels):
        """Point-prompted decode: points [B, P, 2] normalized, labels [B, P]."""
        tokens = jax.vmap(self.point_prompt)(points, labels)
        dense = jnp.zeros_like(image_embed)
        return self.decoder(image_embed, dense, early_feat, point_tokens=tokens)

    def decode_box(self, image_embed, early_feat, boxes):
        """Box-prompted decode: boxes [B, 4] XYXY normalized to [0,1].
        A box is its two corners as labeled points (prompt_encoder.py
        _embed_boxes semantics: labels 2 and 3)."""
        corners = jnp.stack(
            [boxes[:, :2], boxes[:, 2:]], axis=1
        )  # [B, 2, 2] (x0,y0), (x1,y1)
        labels = jnp.broadcast_to(
            jnp.asarray([2, 3], jnp.int32), corners.shape[:2]
        )
        return self.decode_points(image_embed, early_feat, corners, labels)

    def __call__(self, image, mask_prompt):
        image_embed, early = self.encode(image)
        return self.decode(image_embed, early, mask_prompt)


def init_sam_variables(model: SAMHQ, rng) -> dict:
    """Initialize ALL params (mask-prompt AND point-prompt decode paths) —
    plain model.init(__call__) only creates the mask path's params."""
    import flax.linen as fnn

    s = model.img_size
    img = jnp.zeros((1, s, s, 3))
    mask_prompt = jnp.zeros((1, s // 4, s // 4, 1))
    pts = jnp.zeros((1, 1, 2))
    labels = jnp.zeros((1, 1), jnp.int32)

    def both(mdl):
        embed, early = mdl.encode(img)
        mdl.decode(embed, early, mask_prompt)
        mdl.decode_box(embed, early, jnp.zeros((1, 4)))
        return mdl.decode_points(embed, early, pts, labels)

    return fnn.init(both, model)(rng)


def sam_hq_mask_loss(hq_logit, target, focal_weight=20.0, dice_weight=1.0):
    """Focal + dice mask loss (sam-hq/train utils/loss_mask.py recipe)."""
    p = jax.nn.sigmoid(hq_logit)
    t = target.astype(jnp.float32)
    ce = jnp.maximum(hq_logit, 0) - hq_logit * t + jnp.log1p(jnp.exp(-jnp.abs(hq_logit)))
    pt = p * t + (1 - p) * (1 - t)
    focal = jnp.mean(ce * (1 - pt) ** 2)
    inter = jnp.sum(p * t, axis=(-2, -1))
    denom = jnp.sum(p, axis=(-2, -1)) + jnp.sum(t, axis=(-2, -1))
    dice = jnp.mean(1 - (2 * inter + 1) / (denom + 1))
    return focal_weight * focal + dice_weight * dice
