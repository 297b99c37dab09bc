"""Pallas TPU kernels for the grouping hot path.

The Panoptic-DeepLab pixel-grouping step computes, for every pixel, the
argmin over K candidate centers of the squared distance between
(coord + offset) and the center (reference materializes the full [K, H*W]
distance matrix, post_processing.py:71). The XLA fallback
(quber_tpu.ops.grouping.group_pixels) tiles it with lax.map; this kernel
fuses the distance computation and argmin per VMEM tile so the [T, K]
scores never round-trip to HBM:

  grid over pixel tiles; each program loads a [T] tile of shifted
  coordinates plus the full [K]-center table (VMEM-resident, K <= 256) and
  writes the [T] argmin ids.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile = (sublanes, lanes) of pixels processed per program
TILE = 8 * 512


def _group_kernel(cy_ref, cx_ref, pen_ref, ly_ref, lx_ref, out_ref):
    ly = ly_ref[:]  # [TILE]
    lx = lx_ref[:]
    cy = cy_ref[:]  # [K]
    cx = cx_ref[:]
    pen = pen_ref[:]
    # [TILE, K] distances in VMEM; K <= 256 so this is ~1 MB at TILE=4096
    d2 = (ly[:, None] - cy[None, :]) ** 2 + (lx[:, None] - cx[None, :]) ** 2 + pen[None, :]
    # explicit first-index tie-break: Mosaic's argmin does not guarantee the
    # lowest index on exact distance ties (equidistant boundary pixels)
    k = d2.shape[1]
    m = jnp.min(d2, axis=1, keepdims=True)
    ks = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    out_ref[:] = jnp.min(jnp.where(d2 == m, ks, k), axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def group_pixels_pallas(
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    offsets: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in twin of ops.grouping.group_pixels (1-based ids, [H, W])."""
    k = centers.shape[0]
    h, w = offsets.shape[1], offsets.shape[2]
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ly = (ys + offsets[0]).reshape(-1)
    lx = (xs + offsets[1]).reshape(-1)
    n = ly.shape[0]
    pad = (-n) % TILE
    ly = jnp.pad(ly, (0, pad))
    lx = jnp.pad(lx, (0, pad))
    grid = (ly.shape[0] // TILE,)

    # penalty keeps invalid centers out of the argmin; argmin-first tie-break
    # preserves the reference's row-major preference for sorted centers.
    # K is padded to a lane multiple (128) explicitly — Mosaic pads the
    # trailing dimension with UNINITIALIZED lanes otherwise, which corrupts
    # the argmin on hardware (caught on-chip; interpret mode can't see it).
    k_pad = (-k) % 128
    pen = jnp.where(valid, 0.0, jnp.inf).astype(jnp.float32)
    pen = jnp.pad(pen, (0, k_pad), constant_values=jnp.inf)
    cy = jnp.pad(centers[:, 0].astype(jnp.float32), (0, k_pad))
    cx = jnp.pad(centers[:, 1].astype(jnp.float32), (0, k_pad))
    k = k + k_pad

    ids = pl.pallas_call(
        _group_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ly.shape[0],), jnp.int32),
        interpret=interpret,
    )(cy, cx, pen, ly, lx)
    return ids[:n].reshape(h, w) + 1


@partial(jax.jit, static_argnames=("interpret",))
def group_pixels_pallas_batched(
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    offsets: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched variant: centers [B, K, 2], valid [B, K], offsets [B, 2, H, W]
    -> ids [B, H, W]. Everything is flattened to 1-D blocks (Pallas vmap of
    the single-image kernel produces unsupported squeezed block shapes);
    each tile program selects its batch's center table via the index map.
    """
    b, k, _ = centers.shape
    h, w = offsets.shape[2], offsets.shape[3]
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ly = (ys[None] + offsets[:, 0]).reshape(b, -1)
    lx = (xs[None] + offsets[:, 1]).reshape(b, -1)
    n = h * w
    pad = (-n) % TILE
    ly = jnp.pad(ly, ((0, 0), (0, pad))).reshape(-1)
    lx = jnp.pad(lx, ((0, 0), (0, pad))).reshape(-1)
    tiles_per_batch = (n + pad) // TILE

    # center tables as [B, 8, K] so blocks are (1, 8, K) — flat [B*K] blocks
    # hit an XLA/Mosaic layout-tiling conflict (T(1024) vs T(256))
    k_pad = (-k) % 128
    pen = jnp.where(valid, 0.0, jnp.inf).astype(jnp.float32)
    pen = jnp.pad(pen, ((0, 0), (0, k_pad)), constant_values=jnp.inf)
    cy = jnp.pad(centers[..., 0].astype(jnp.float32), ((0, 0), (0, k_pad)))
    cx = jnp.pad(centers[..., 1].astype(jnp.float32), ((0, 0), (0, k_pad)))
    kk = k + k_pad
    to3d = lambda x: jnp.broadcast_to(x[:, None, :], (b, 8, kk))
    cy3, cx3, pen3 = to3d(cy), to3d(cx), to3d(pen)

    def kernel(cy_ref, cx_ref, pen_ref, ly_ref, lx_ref, out_ref):
        ly = ly_ref[:]
        lx = lx_ref[:]
        cyk = cy_ref[0, 0, :]
        cxk = cx_ref[0, 0, :]
        penk = pen_ref[0, 0, :]
        d2 = (ly[:, None] - cyk[None, :]) ** 2 + (lx[:, None] - cxk[None, :]) ** 2 + penk[None, :]
        kdim = d2.shape[1]
        m = jnp.min(d2, axis=1, keepdims=True)
        ks = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        out_ref[:] = jnp.min(jnp.where(d2 == m, ks, kdim), axis=1).astype(jnp.int32)

    tpb = tiles_per_batch
    ids = pl.pallas_call(
        kernel,
        grid=(b * tpb,),
        in_specs=[
            pl.BlockSpec((1, 8, kk), lambda i: (i // tpb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kk), lambda i: (i // tpb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kk), lambda i: (i // tpb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ly.shape[0],), jnp.int32),
        interpret=interpret,
    )(cy3, cx3, pen3, ly, lx)
    return ids.reshape(b, n + pad)[:, :n].reshape(b, h, w) + 1


@partial(jax.jit, static_argnames=("sigma", "normalize", "interpret"))
def encode_initial_masks_pallas(
    masks: jnp.ndarray,
    valid: jnp.ndarray,
    centers: jnp.ndarray,
    sigma: int = 10,
    normalize: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused center-Gaussian + offset encoding: [N, H, W] masks -> [3, H, W].

    Drop-in twin of ops.encoding.encode_initial_masks given precomputed
    float centroids (ops.encoding.instance_stats): one VMEM pass over the
    mask stack per pixel tile computes, per pixel,
      * the windowed min over instances of d^2 to the ROUNDED centroid
        (heatmap = exp(-d2min / 2 sigma^2); the min of d^2 equals the max of
        the per-instance Gaussians since exp is monotone),
      * the last-wins owning instance (ascending select chain, matching the
        reference's sequential paint order, target_generator.py:144-146) and
        its offsets to the FLOAT centroid.
    The XLA path materializes [N, H, W] float intermediates for each of
    these; here the stack is read once as int8 tiles.
    """
    n, h, w = masks.shape
    hw = h * w
    lim = float(3 * sigma + 1)
    inv2s2 = 1.0 / (2.0 * float(sigma) ** 2)
    sy = float(h) if normalize else 1.0
    sx = float(w) if normalize else 1.0

    m8 = masks.reshape(n, hw).astype(jnp.int8)
    pad = (-hw) % TILE
    m8 = jnp.pad(m8, ((0, 0), (0, pad)))
    grid = ((hw + pad) // TILE,)

    # caller passes valid already gated on area > 0 (instance_stats)
    ok = valid
    cy = jnp.where(ok, centers[:, 0], 0.0).astype(jnp.float32)
    cx = jnp.where(ok, centers[:, 1], 0.0).astype(jnp.float32)
    ry = jnp.round(cy)
    rx = jnp.round(cx)
    pen = jnp.where(ok, 0.0, jnp.inf).astype(jnp.float32)
    okf = ok.astype(jnp.float32)
    # scalar tables ride in SMEM as [N]
    tables = (cy, cx, ry, rx, pen, okf)

    def kernel(cy_ref, cx_ref, ry_ref, rx_ref, pen_ref, ok_ref, m_ref, out_ref):
        t = pl.program_id(0)
        idx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0] + t * TILE
        y = (idx // w).astype(jnp.float32)
        x = (idx % w).astype(jnp.float32)
        d2min = jnp.full((TILE,), jnp.inf, jnp.float32)
        cy_sel = jnp.zeros((TILE,), jnp.float32)
        cx_sel = jnp.zeros((TILE,), jnp.float32)
        owned = jnp.zeros((TILE,), jnp.bool_)
        for k in range(n):
            # scalar-bool & vector-bool trips a Mosaic relayout; gate the
            # int8 row by the validity scalar in float instead
            mk = m_ref[k, :].astype(jnp.float32) * ok_ref[k] > 0
            cy_sel = jnp.where(mk, cy_ref[k], cy_sel)
            cx_sel = jnp.where(mk, cx_ref[k], cx_sel)
            owned = owned | mk
            dy = y - ry_ref[k]
            dx = x - rx_ref[k]
            d2 = dy * dy + dx * dx + pen_ref[k]
            outside = (jnp.abs(dy) > lim) | (jnp.abs(dx) > lim)
            d2min = jnp.minimum(d2min, jnp.where(outside, jnp.inf, d2))
        out_ref[0, :] = jnp.where(
            jnp.isfinite(d2min), jnp.exp(-d2min * inv2s2), 0.0
        )
        out_ref[1, :] = jnp.where(owned, (cy_sel - y) / sy, 0.0)
        out_ref[2, :] = jnp.where(owned, (cx_sel - x) / sx, 0.0)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    enc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(), smem(), smem(),
                  pl.BlockSpec((n, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, hw + pad), jnp.float32),
        interpret=interpret,
    )(*tables, m8)
    return enc[:, :hw].reshape(3, h, w)


@partial(jax.jit, static_argnames=("sigma", "normalize", "interpret"))
def encode_initial_masks_pallas_batched(
    masks: jnp.ndarray,
    valid: jnp.ndarray,
    centers: jnp.ndarray,
    sigma: int = 10,
    normalize: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched twin of encode_initial_masks_pallas: masks [B, N, H, W],
    valid [B, N], centers [B, N, 2] -> [B, 3, H, W]. One grid over B x pixel
    tiles; each program selects its batch's centroid tables via the index
    map (vmap of a pallas_call does not batch the block shapes).
    """
    b, n, h, w = masks.shape
    hw = h * w
    lim = float(3 * sigma + 1)
    inv2s2 = 1.0 / (2.0 * float(sigma) ** 2)
    sy = float(h) if normalize else 1.0
    sx = float(w) if normalize else 1.0

    m8 = masks.reshape(b, n, hw).astype(jnp.int8)
    pad = (-hw) % TILE
    m8 = jnp.pad(m8, ((0, 0), (0, 0), (0, pad)))
    tpb = (hw + pad) // TILE

    ok = valid
    cy = jnp.where(ok, centers[..., 0], 0.0).astype(jnp.float32)
    cx = jnp.where(ok, centers[..., 1], 0.0).astype(jnp.float32)
    ry = jnp.round(cy)
    rx = jnp.round(cx)
    pen = jnp.where(ok, 0.0, jnp.inf).astype(jnp.float32)
    okf = ok.astype(jnp.float32)
    tables = (cy, cx, ry, rx, pen, okf)  # each [B, N] in SMEM

    def kernel(cy_ref, cx_ref, ry_ref, rx_ref, pen_ref, ok_ref, m_ref, out_ref):
        bi = pl.program_id(0) // tpb
        t = pl.program_id(0) % tpb
        idx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0] + t * TILE
        y = (idx // w).astype(jnp.float32)
        x = (idx % w).astype(jnp.float32)
        d2min = jnp.full((TILE,), jnp.inf, jnp.float32)
        cy_sel = jnp.zeros((TILE,), jnp.float32)
        cx_sel = jnp.zeros((TILE,), jnp.float32)
        owned = jnp.zeros((TILE,), jnp.bool_)
        for k in range(n):
            mk = m_ref[0, k, :].astype(jnp.float32) * ok_ref[bi, k] > 0
            cy_sel = jnp.where(mk, cy_ref[bi, k], cy_sel)
            cx_sel = jnp.where(mk, cx_ref[bi, k], cx_sel)
            owned = owned | mk
            dy = y - ry_ref[bi, k]
            dx = x - rx_ref[bi, k]
            d2 = dy * dy + dx * dx + pen_ref[bi, k]
            outside = (jnp.abs(dy) > lim) | (jnp.abs(dx) > lim)
            d2min = jnp.minimum(d2min, jnp.where(outside, jnp.inf, d2))
        out_ref[0, 0, :] = jnp.where(
            jnp.isfinite(d2min), jnp.exp(-d2min * inv2s2), 0.0
        )
        out_ref[0, 1, :] = jnp.where(owned, (cy_sel - y) / sy, 0.0)
        out_ref[0, 2, :] = jnp.where(owned, (cx_sel - x) / sx, 0.0)

    # whole [B, N] scalar tables in SMEM, indexed by batch inside the kernel
    # (blocked SMEM specs hit the 8x128 block-divisibility rule)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    enc = pl.pallas_call(
        kernel,
        grid=(b * tpb,),
        in_specs=[smem(), smem(), smem(), smem(), smem(), smem(),
                  pl.BlockSpec((1, n, TILE), lambda i: (i // tpb, 0, i % tpb),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, TILE), lambda i: (i // tpb, 0, i % tpb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, hw + pad), jnp.float32),
        interpret=interpret,
    )(*tables, m8)
    return enc[:, :, :hw].reshape(b, 3, h, w)
