"""Multi-scale deformable attention, XLA-native.

TPU rebuild of the reference's largest CUDA kernel
(/root/reference/ext_modules/UnseenObjectsWithMeanShift/.../ops/src/cuda/
ms_deform_im2col_cuda.cuh:1-1331 + ms_deform_attn_cuda.cu, same op again in
sam-hq/seginw GroundingDINO): for each query, head, level and point, sample
the value map bilinearly at a learned location and accumulate with learned
attention weights.

The CUDA kernel is an im2col gather; here each bilinear sample is four
`jnp.take` gathers over the flattened spatial axis with computed corner
indices — XLA fuses the interpolation arithmetic, and the backward pass
(scatter-adds) comes from autodiff. Out-of-range samples contribute zero,
matching the CUDA kernel's boundary handling.

Shapes (multi-level maps flattened and concatenated, detectron2/Deformable-
DETR convention):
  value:            [B, S, H, D]   S = sum_l H_l * W_l, H heads, D head dim
  spatial_shapes:   static list of (H_l, W_l)
  sampling_locs:    [B, Q, H, L, P, 2]  normalized (x, y) in [0, 1]
  attention_weights:[B, Q, H, L, P]     softmaxed over L*P
returns           [B, Q, H * D]
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _level_offsets(spatial_shapes):
    offs, acc = [], 0
    for h, w in spatial_shapes:
        offs.append(acc)
        acc += h * w
    return offs, acc


@partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: tuple,
    sampling_locs: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    b, s, nh, d = value.shape
    _, q, _, nl, np_, _ = sampling_locs.shape
    offs, total = _level_offsets(spatial_shapes)
    assert total == s, (total, s)

    out = jnp.zeros((b, q, nh, d), value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offs[lvl] : offs[lvl] + h * w]  # [B, HW, nh, D]
        loc = sampling_locs[:, :, :, lvl]  # [B, Q, nh, P, 2] normalized (x, y)
        att = attention_weights[:, :, :, lvl]  # [B, Q, nh, P]

        # align_corners=False grid-sample convention: pixel centers at
        # (i + 0.5) / W — matches the CUDA kernel (loc * W - 0.5)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx = x - x0
        dy = y - y0

        def corner(cx, cy, weight):
            inb = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
            idx = jnp.clip(cy, 0, h - 1).astype(jnp.int32) * w + jnp.clip(
                cx, 0, w - 1
            ).astype(jnp.int32)  # [B, Q, nh, P]
            # gather per batch & head. v: [B, HW, nh, D]; idx: [B, Q, nh, P]
            # -> [B, Q*P, nh] keeping the head axis aligned with v's
            idx_qp = idx.transpose(0, 1, 3, 2).reshape(b, q * np_, nh)
            g = jnp.take_along_axis(
                v[:, :, :, None, :],  # [B, HW, nh, 1, D]
                idx_qp[:, :, :, None, None].astype(jnp.int32),
                axis=1,
            )  # [B, Q*P, nh, 1, D]
            g = g.reshape(b, q, np_, nh, d).transpose(0, 1, 3, 2, 4)  # [B,Q,nh,P,D]
            wgt = (weight * inb.astype(value.dtype))[..., None]
            return g * wgt

        acc = (
            corner(x0, y0, (1 - dx) * (1 - dy))
            + corner(x0 + 1, y0, dx * (1 - dy))
            + corner(x0, y0 + 1, (1 - dx) * dy)
            + corner(x0 + 1, y0 + 1, dx * dy)
        )  # [B, Q, nh, P, D]
        out = out + jnp.sum(acc * att[..., None], axis=3)
    return out.reshape(b, q, nh * d)
