"""SAM-HQ promptable mask refiner — weight-compatible flax port.

Faithful rebuild of the reference's HQ-SAM baseline
(/root/reference/sam-hq/segment_anything/modeling/{image_encoder,
prompt_encoder,mask_decoder_hq,transformer,common}.py; fine-tuned wrapper
at eval/refiner_model.py:554-664): a ViT image encoder with decomposed
relative-position attention and windowed blocks, the SAM prompt encoder
(random-Fourier point PE + learned point/box embeddings + strided-conv
mask downscaler), and the two-way transformer mask decoder extended with
the HQ output token whose hypernetwork convolves an HQ feature fused from
global (early ViT) and local (final ViT) features.

The module tree mirrors the reference layer-for-layer so
import_zoo.import_sam_hq can load real SAM / HQ-SAM checkpoints (ViT-B/L/H
presets below). Attention is plain dot-product attention — XLA fuses it
onto the MXU; images are 1024x1024 with 16x16 patches -> 64x64 tokens.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


# ViT presets: (embed_dim, depth, num_heads, global_attn_indexes)
VIT_PRESETS = {
    "vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "vit_l": (1024, 24, 16, (5, 11, 17, 23)),
    "vit_h": (1280, 32, 16, (7, 15, 23, 31)),
}


def layer_norm_2d(x, scale, bias, eps=1e-6):
    """common.py LayerNorm2d: normalize over the channel axis per pixel."""
    u = x.mean(axis=-1, keepdims=True)
    s = ((x - u) ** 2).mean(axis=-1, keepdims=True)
    return (x - u) / jnp.sqrt(s + eps) * scale + bias


class LayerNorm2d(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm_2d(x, scale, bias, self.eps)


class MLPBlock(nn.Module):
    """common.py MLPBlock: lin1 -> act -> lin2."""

    hidden: int
    out: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="lin1")(x)
        x = nn.gelu(x, approximate=False) if self.act == "gelu" else nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="lin2")(x)


class MLP(nn.Module):
    """mask_decoder_hq.py MLP: num_layers Linears with ReLU between."""

    hidden: int
    out: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            feats = self.out if i == self.num_layers - 1 else self.hidden
            x = nn.Dense(feats, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def window_partition(x, ws):
    """image_encoder.py:248-267 incl. padding to a window multiple."""
    b, h, w, c = x.shape
    pad_h = (-h) % ws
    pad_w = (-w) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition(windows, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // ((hp // ws) * (wp // ws))
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_pos_table(size, rel_pos):
    """get_rel_pos for equal q/k sizes: index [2s-1, hd] at (i - j + s - 1)."""
    idx = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + size - 1
    return rel_pos[idx]  # [s, s, head_dim]


class ViTAttention(nn.Module):
    """image_encoder.py Attention: fused qkv + decomposed rel pos."""

    dim: int
    num_heads: int
    input_size: int  # grid side (window or full grid)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(c * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, b * nh, h * w, hd)
        attn = (q * (hd ** -0.5)) @ jnp.swapaxes(k, -2, -1)

        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size - 1, hd))
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size - 1, hd))
        rh = _rel_pos_table(h, rel_pos_h.astype(self.dtype))
        rw = _rel_pos_table(w, rel_pos_w.astype(self.dtype))
        r_q = q.reshape(b * nh, h, w, hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
        attn = (attn.reshape(b * nh, h, w, h, w)
                + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
                ).reshape(b * nh, h * w, h * w)

        attn = jax.nn.softmax(attn, axis=-1)
        x = (attn @ v).reshape(b, nh, h, w, hd).transpose(0, 2, 3, 1, 4)
        x = x.reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(x)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 0  # 0 = global attention
    grid_size: int = 64
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            x, pad_hw = window_partition(x, ws)
        attn_size = ws if ws > 0 else self.grid_size
        x = ViTAttention(self.dim, self.num_heads, attn_size, self.dtype,
                         name="attn")(x)
        if ws > 0:
            x = window_unpartition(x, ws, pad_hw, (h, w))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        return x + MLPBlock(int(c * self.mlp_ratio), c, "gelu", self.dtype,
                            name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """image_encoder.py ImageEncoderViT. Returns (neck [B,h,w,256],
    interm: the output of the FIRST global-attention block)."""

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
        grid = self.img_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, grid, grid, self.embed_dim))
        x = x + pos.astype(d)
        interm = None
        for i in range(self.depth):
            ws = 0 if i in self.global_blocks else self.window_size
            x = ViTBlock(self.embed_dim, self.num_heads, ws, grid,
                         dtype=d, name=f"block_{i}")(x)
            if ws == 0 and interm is None:
                interm = x
        if interm is None:  # no global block in range (tiny test configs)
            interm = x
        neck = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=d,
                       name="neck_0")(x)
        neck = LayerNorm2d(name="neck_1")(neck.astype(jnp.float32))
        neck = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                       dtype=d, name="neck_2")(neck.astype(d))
        neck = LayerNorm2d(name="neck_3")(neck.astype(jnp.float32))
        return neck, interm.astype(jnp.float32)


class PromptEncoder(nn.Module):
    """prompt_encoder.py PromptEncoder (embed_dim=256, mask_in_chans=16)."""

    embed_dim: int = 256
    mask_in_chans: int = 16
    input_image_size: int = 1024
    image_embedding_size: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        e = self.embed_dim
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, e // 2))
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, e))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (e,))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (e,))
        c = self.mask_in_chans
        self.mask_down_0 = nn.Conv(c // 4, (2, 2), strides=(2, 2),
                                   dtype=self.dtype, name="mask_down_0")
        self.mask_ln_1 = LayerNorm2d(name="mask_ln_1")
        self.mask_down_2 = nn.Conv(c, (2, 2), strides=(2, 2),
                                   dtype=self.dtype, name="mask_down_2")
        self.mask_ln_3 = LayerNorm2d(name="mask_ln_3")
        self.mask_proj = nn.Conv(e, (1, 1), dtype=self.dtype, name="mask_proj")

    def _pe_encoding(self, coords):
        """coords in [0,1]^2, any leading shape."""
        coords = 2.0 * coords - 1.0
        proj = coords @ self.pe_gaussian
        proj = 2.0 * np.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def dense_pe(self):
        """get_dense_pe: [h, w, C] grid positional encoding."""
        s = self.image_embedding_size
        coords = (jnp.stack(jnp.meshgrid(jnp.arange(s), jnp.arange(s),
                                         indexing="xy"), axis=-1) + 0.5) / s
        return self._pe_encoding(coords.astype(jnp.float32))

    def embed_points(self, points, labels, pad=True):
        """points [B,P,2] pixel coords, labels [B,P] in {-1,0,1,2,3}.
        Label semantics (prompt_encoder.py:74-103): -1 pad, 0 negative
        point, 1 positive point, 2/3 box corners."""
        if pad:
            b = points.shape[0]
            points = jnp.concatenate(
                [points, jnp.zeros((b, 1, 2), points.dtype)], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
        coords = (points + 0.5) / self.input_image_size
        pe = self._pe_encoding(coords)
        pe = jnp.where(labels[..., None] == -1,
                       self.not_a_point_embed[None, None], pe)
        table = jnp.concatenate(
            [jnp.zeros_like(self.point_embeddings[:1]), self.point_embeddings],
            axis=0)  # index 0 = padding (no add)
        add = table[jnp.clip(labels + 1, 0, 4)]
        return pe + jnp.where(labels[..., None] == -1, 0.0, add)

    def embed_boxes(self, boxes):
        """boxes [B,4] XYXY pixels -> [B,2,C] corner tokens."""
        coords = (boxes.reshape(-1, 2, 2) + 0.5) / self.input_image_size
        pe = self._pe_encoding(coords)
        return pe + self.point_embeddings[2:4][None]

    def embed_masks(self, masks):
        """masks [B,4h,4w,1] -> dense embedding [B,h,w,C]."""
        x = self.mask_down_0(masks.astype(self.dtype))
        x = nn.gelu(self.mask_ln_1(x.astype(jnp.float32)), approximate=False)
        x = self.mask_down_2(x.astype(self.dtype))
        x = nn.gelu(self.mask_ln_3(x.astype(jnp.float32)), approximate=False)
        return self.mask_proj(x.astype(self.dtype)).astype(jnp.float32)

    def no_mask_dense(self, b):
        s = self.image_embedding_size
        return jnp.broadcast_to(self.no_mask_embed[None, None, None],
                                (b, s, s, self.embed_dim))

    def __call__(self, masks):
        return self.embed_masks(masks)


class DownsampledAttention(nn.Module):
    """transformer.py Attention: q/k/v projected to dim/downsample_rate."""

    dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dtype
        c_in = self.dim // self.downsample_rate
        nh = self.num_heads
        hd = c_in // nh
        q = nn.Dense(c_in, dtype=d, name="q_proj")(q)
        k = nn.Dense(c_in, dtype=d, name="k_proj")(k)
        v = nn.Dense(c_in, dtype=d, name="v_proj")(v)

        def split(x):
            b, n, c = x.shape
            return x.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jax.nn.softmax(
            (q / np.sqrt(hd)) @ jnp.swapaxes(k, -2, -1), axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3)
        out = out.reshape(out.shape[0], out.shape[1], c_in)
        return nn.Dense(self.dim, dtype=d, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        d = self.dtype
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(self.dim, self.num_heads, 1, d,
                                           name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampledAttention(
                self.dim, self.num_heads, 1, d, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.dim, self.num_heads, 2, d,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, self.dim, "relu", d,
                                     name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampledAttention(
            self.dim, self.num_heads, 2, d,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe [B,h,w,C]; point_embedding [B,N,C]."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c) if image_pe.ndim == 4 \
            else image_pe
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.dim, self.num_heads, 2, self.dtype,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries)
        return queries, keys


def conv_transpose_2x2(x, kernel, bias):
    """Exact torch ConvTranspose2d(k=2, s=2): each input pixel expands to a
    2x2 block. kernel [2, 2, in, out] (torch [in, out, 2, 2] transposed by
    the importer)."""
    b, h, w, c = x.shape
    y = jnp.einsum("bhwc,klco->bhkwlo", x, kernel)
    y = y.reshape(b, h * 2, w * 2, kernel.shape[-1])
    return y + bias


class ConvTranspose2x2(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv_transpose_2x2(x.astype(self.dtype),
                                  kernel.astype(self.dtype),
                                  bias.astype(self.dtype))


class MaskDecoderHQ(nn.Module):
    """mask_decoder_hq.py MaskDecoderHQ (num_multimask_outputs=3)."""

    dim: int = 256
    num_multimask: int = 3
    vit_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, d = self.dim, self.dtype
        nm = self.num_multimask + 1  # SAM mask tokens
        self.iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, c))
        self.mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (nm, c))
        self.hf_token = self.param("hf_token", nn.initializers.normal(1.0), (1, c))
        self.transformer = TwoWayTransformer(2, c, 8, 2048, d, name="transformer")
        self.up_0 = ConvTranspose2x2(c // 4, d, name="up_0")
        self.up_ln_1 = LayerNorm2d(name="up_ln_1")
        self.up_3 = ConvTranspose2x2(c // 8, d, name="up_3")
        self.hyper_mlps = [
            MLP(c, c // 8, 3, d, name=f"hyper_{i}") for i in range(nm)
        ]
        # iou head predicts over the 4 SAM tokens only: the reference builds
        # it BEFORE appending the HQ token (mask_decoder_hq.py:69-77)
        self.iou_head = MLP(c, nm, 3, d, name="iou_head")
        self.hf_mlp = MLP(c, c // 8, 3, d, name="hf_mlp")
        self.compress_vit_0 = ConvTranspose2x2(c, d, name="compress_vit_0")
        self.compress_vit_ln_1 = LayerNorm2d(name="compress_vit_ln_1")
        self.compress_vit_3 = ConvTranspose2x2(c // 8, d, name="compress_vit_3")
        self.enc_0 = ConvTranspose2x2(c // 4, d, name="enc_0")
        self.enc_ln_1 = LayerNorm2d(name="enc_ln_1")
        self.enc_3 = ConvTranspose2x2(c // 8, d, name="enc_3")
        self.maskfeat_0 = nn.Conv(c // 4, (3, 3), padding=1, dtype=d, name="maskfeat_0")
        self.maskfeat_ln_1 = LayerNorm2d(name="maskfeat_ln_1")
        self.maskfeat_3 = nn.Conv(c // 8, (3, 3), padding=1, dtype=d, name="maskfeat_3")

    def hq_features(self, image_embed, interm):
        """embedding_encoder(image_embed) + compress_vit_feat(interm)."""
        e = self.enc_0(image_embed)
        e = nn.gelu(self.enc_ln_1(e.astype(jnp.float32)), approximate=False)
        e = self.enc_3(e)
        v = self.compress_vit_0(interm)
        v = nn.gelu(self.compress_vit_ln_1(v.astype(jnp.float32)), approximate=False)
        v = self.compress_vit_3(v)
        return e + v

    def __call__(self, image_embed, image_pe, sparse_prompt, dense_prompt,
                 interm, multimask_output=False, hq_token_only=False):
        """image_embed [B,h,w,C]; sparse_prompt [B,N,C]; dense_prompt
        [B,h,w,C]; interm [B,h,w,vit_dim]. Returns (masks [B,1,4h,4w],
        iou [B,1], all_masks [B,nm+1,4h,4w])."""
        b, h, w, c = image_embed.shape
        nm = self.num_multimask + 1
        hq_feat = self.hq_features(image_embed, interm)

        tokens = jnp.concatenate([
            jnp.broadcast_to(self.iou_token[None], (b, 1, c)),
            jnp.broadcast_to(self.mask_tokens[None], (b, nm, c)),
            jnp.broadcast_to(self.hf_token[None], (b, 1, c)),
            sparse_prompt,
        ], axis=1).astype(self.dtype)

        src = image_embed + dense_prompt
        pe = jnp.broadcast_to(image_pe[None], (b, h, w, c)) \
            if image_pe.ndim == 3 else image_pe
        hs, keys = self.transformer(src.astype(self.dtype),
                                    pe.astype(self.dtype), tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + nm + 1]

        src = keys.reshape(b, h, w, c)
        up = self.up_0(src)
        up = nn.gelu(self.up_ln_1(up.astype(jnp.float32)), approximate=False)
        up_sam = nn.gelu(self.up_3(up).astype(jnp.float32), approximate=False)
        up_hq = self.maskfeat_3(nn.gelu(
            self.maskfeat_ln_1(self.maskfeat_0(up_sam.astype(self.dtype))
                               .astype(jnp.float32)), approximate=False)
            .astype(self.dtype)).astype(jnp.float32) + hq_feat

        hypers = [self.hyper_mlps[i](mask_tokens_out[:, i]) for i in range(nm)]
        hypers.append(self.hf_mlp(mask_tokens_out[:, nm]))
        hyper_in = jnp.stack(hypers, axis=1).astype(jnp.float32)  # [B,nm+1,c/8]
        masks_sam = jnp.einsum("bkc,bhwc->bkhw", hyper_in[:, :nm], up_sam)
        masks_hq = jnp.einsum("bkc,bhwc->bkhw", hyper_in[:, nm:], up_hq)
        all_masks = jnp.concatenate([masks_sam, masks_hq], axis=1)
        iou_pred = self.iou_head(iou_token_out).astype(jnp.float32)

        if multimask_output:
            sel = jnp.argmax(iou_pred[:, 1:nm], axis=1) + 1
            masks_out = jnp.take_along_axis(
                all_masks, sel[:, None, None, None], axis=1)
            iou_out = jnp.take_along_axis(iou_pred[:, :nm], sel[:, None], axis=1)
        else:
            masks_out = all_masks[:, :1]
            iou_out = iou_pred[:, :1]
        if hq_token_only:
            masks_out = all_masks[:, nm:nm + 1]
        else:
            masks_out = masks_out + all_masks[:, nm:nm + 1]
        return masks_out, iou_out, all_masks


class SAMHQ(nn.Module):
    """Full model: encode once, decode per prompt.

    Weight-layout mirrors sam.py Sam(image_encoder, prompt_encoder,
    mask_decoder=MaskDecoderHQ). Use VIT_PRESETS for real checkpoints;
    the tiny defaults keep unit tests fast.
    """

    img_size: int = 1024
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_blocks: Sequence[int] = (2, 5, 8, 11)
    window_size: int = 14
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def preset(cls, name: str, img_size: int = 1024, dtype=jnp.float32):
        e, d, h, g = VIT_PRESETS[name]
        return cls(img_size=img_size, embed_dim=e, depth=d, num_heads=h,
                   global_blocks=g, dtype=dtype)

    def setup(self):
        self.image_encoder = ImageEncoderViT(
            img_size=self.img_size, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            global_blocks=self.global_blocks, window_size=self.window_size,
            dtype=self.dtype, name="image_encoder")
        self.prompt_encoder = PromptEncoder(
            input_image_size=self.img_size,
            image_embedding_size=self.img_size // 16,
            dtype=self.dtype, name="prompt_encoder")
        self.mask_decoder = MaskDecoderHQ(
            vit_dim=self.embed_dim, dtype=self.dtype, name="mask_decoder")

    def encode(self, image):
        """image [B,S,S,3] already pixel-normalized."""
        return self.image_encoder(image)

    def decode(self, image_embed, interm, mask_prompt,
               multimask_output=False, hq_token_only=False):
        """Mask-prompted decode (the fine-tuned wrapper's prompt_type='mask',
        refiner_model.py:593-640): mask at 4x the embedding grid."""
        b = image_embed.shape[0]
        dense = self.prompt_encoder.embed_masks(mask_prompt)
        sparse = jnp.zeros((b, 0, 256), jnp.float32)
        # torch pads empty point sets implicitly via _embed_points(pad=True)
        # only when points are given; with mask-only prompts sparse is empty
        pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(image_embed, pe, sparse, dense, interm,
                                 multimask_output, hq_token_only)

    def decode_points(self, image_embed, interm, points, labels,
                      multimask_output=False, hq_token_only=False, pad=True):
        """points [B,P,2] PIXEL coords in the img_size frame, labels [B,P].
        `pad` appends the not-a-point token (reference pads point-only
        prompts but NOT box prompts, prompt_encoder.py:155)."""
        b = image_embed.shape[0]
        sparse = self.prompt_encoder.embed_points(points, labels, pad=pad)
        dense = self.prompt_encoder.no_mask_dense(b)
        pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(image_embed, pe, sparse, dense, interm,
                                 multimask_output, hq_token_only)

    def decode_box(self, image_embed, interm, boxes,
                   multimask_output=False, hq_token_only=False):
        """boxes [B,4] XYXY pixel coords."""
        b = image_embed.shape[0]
        sparse = self.prompt_encoder.embed_boxes(boxes)
        dense = self.prompt_encoder.no_mask_dense(b)
        pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(image_embed, pe, sparse, dense, interm,
                                 multimask_output, hq_token_only)

    def __call__(self, image, mask_prompt):
        image_embed, interm = self.encode(image)
        return self.decode(image_embed, interm, mask_prompt)


def init_sam_variables(model: SAMHQ, rng) -> dict:
    """Initialize ALL params (mask AND point/box decode paths)."""
    import flax.linen as fnn

    s = model.img_size
    img = jnp.zeros((1, s, s, 3))
    mask_prompt = jnp.zeros((1, s // 4, s // 4, 1))
    pts = jnp.zeros((1, 1, 2))
    labels = jnp.zeros((1, 1), jnp.int32)

    def both(mdl):
        embed, interm = mdl.encode(img)
        mdl.decode(embed, interm, mask_prompt)
        mdl.decode_box(embed, interm, jnp.zeros((1, 4)))
        return mdl.decode_points(embed, interm, pts, labels)

    return fnn.init(both, model)(rng)


# SAM input normalization constants (sam.py pixel_mean/pixel_std buffers)
SAM_PIXEL_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.asarray([58.395, 57.12, 57.375], np.float32)


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
