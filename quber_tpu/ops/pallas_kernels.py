"""Pallas TPU kernels for the grouping hot path.

The Panoptic-DeepLab pixel-grouping step computes, for every pixel, the
argmin over K candidate centers of the squared distance between
(coord + offset) and the center (reference materializes the full [K, H*W]
distance matrix, post_processing.py:71). The XLA fallback
(quber_tpu.ops.grouping.group_pixels) tiles it with lax.map; this kernel
fuses the distance computation and argmin per VMEM tile so the [T, K]
scores never round-trip to HBM:

  grid over pixel tiles; each program broadcasts the K center scalars
  (VMEM [K, 1, 1] columns, K on the untiled leading axis) against its
  (8, 512) pixel slab and reduces the (K, 8, 512) distances along the
  leading axis, so the distance matrix lives only in registers and the
  argmin is two reductions instead of a K-iteration running-select loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile = (sublanes, lanes) of pixels processed per program; Mosaic requires
# the last two block dims aligned to (8, 128), so each program's TILE pixels
# are laid out as an (SUB, LANE) slab rather than a flat vector.
SUB = 8
LANE = 512
TILE = SUB * LANE


@partial(jax.jit, static_argnames=("interpret",))
def group_pixels_pallas(
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    offsets: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in twin of ops.grouping.group_pixels (1-based ids, [H, W]).

    One (K, SUB, LANE) vector pass per pixel slab: center tables ride as
    VMEM [K, 1, 1] columns (K on the untiled leading axis, so no alignment
    padding) and broadcast against the (SUB, LANE) slab; the argmin is a
    pair of leading-axis reductions. An earlier [TILE, K_pad] formulation
    padded K to the 128-LANE minimum and burned ~5x the VPU work.
    First-index tie-break matches jnp.argmin via a min-over-matching-
    indices reduction (an all-inf row keeps index 0: inf == inf selects
    every row, min index 0)."""
    k = centers.shape[0]
    h, w = offsets.shape[1], offsets.shape[2]
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ly = (ys + offsets[0]).reshape(-1)
    lx = (xs + offsets[1]).reshape(-1)
    n = ly.shape[0]
    pad = (-n) % TILE
    tiles = (n + pad) // TILE
    ly = jnp.pad(ly, (0, pad)).reshape(tiles, SUB, LANE)
    lx = jnp.pad(lx, (0, pad)).reshape(tiles, SUB, LANE)
    grid = (tiles,)

    pen = jnp.where(valid, 0.0, jnp.inf).astype(jnp.float32).reshape(k, 1, 1)
    cy = centers[:, 0].astype(jnp.float32).reshape(k, 1, 1)
    cx = centers[:, 1].astype(jnp.float32).reshape(k, 1, 1)

    def kernel(cy_ref, cx_ref, pen_ref, ly_ref, lx_ref, out_ref):
        y = ly_ref[...]  # (1, SUB, LANE)
        x = lx_ref[...]
        dy = y - cy_ref[...]  # (K, SUB, LANE)
        dx = x - cx_ref[...]
        d2 = dy * dy + dx * dx + pen_ref[...]
        best = jnp.min(d2, axis=0, keepdims=True)
        kidx = jax.lax.broadcasted_iota(jnp.int32, (k, SUB, LANE), 0)
        out_ref[...] = jnp.min(
            jnp.where(d2 == best, kidx, k), axis=0, keepdims=True
        )

    col = lambda: pl.BlockSpec((k, 1, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[col(), col(), col(), row(), row()],
        out_specs=row(),
        out_shape=jax.ShapeDtypeStruct((tiles, SUB, LANE), jnp.int32),
        interpret=interpret,
    )(cy, cx, pen, ly, lx)
    return ids.reshape(-1)[:n].reshape(h, w) + 1


@partial(jax.jit, static_argnames=("interpret",))
def group_pixels_pallas_batched(
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    offsets: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched variant: centers [B, K, 2], valid [B, K], offsets [B, 2, H, W]
    -> ids [B, H, W]. Same (K, SUB, LANE) vector argmin as
    group_pixels_pallas; one grid over B x pixel slabs, each program
    selecting its batch's center columns via the index map (Pallas vmap of
    the single-image kernel produces unsupported squeezed block shapes).
    """
    b, k, _ = centers.shape
    h, w = offsets.shape[2], offsets.shape[3]
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ly = (ys[None] + offsets[:, 0]).reshape(b, -1)
    lx = (xs[None] + offsets[:, 1]).reshape(b, -1)
    n = h * w
    pad = (-n) % TILE
    tpb = (n + pad) // TILE
    ly = jnp.pad(ly, ((0, 0), (0, pad))).reshape(b * tpb, SUB, LANE)
    lx = jnp.pad(lx, ((0, 0), (0, pad))).reshape(b * tpb, SUB, LANE)

    pen = jnp.where(valid, 0.0, jnp.inf).astype(jnp.float32).reshape(b, k, 1, 1)
    cy = centers[..., 0].astype(jnp.float32).reshape(b, k, 1, 1)
    cx = centers[..., 1].astype(jnp.float32).reshape(b, k, 1, 1)

    def kernel(cy_ref, cx_ref, pen_ref, ly_ref, lx_ref, out_ref):
        y = ly_ref[...]  # (1, SUB, LANE)
        x = lx_ref[...]
        dy = y - cy_ref[0]  # (K, SUB, LANE)
        dx = x - cx_ref[0]
        d2 = dy * dy + dx * dx + pen_ref[0]
        best = jnp.min(d2, axis=0, keepdims=True)
        kidx = jax.lax.broadcasted_iota(jnp.int32, (k, SUB, LANE), 0)
        out_ref[...] = jnp.min(
            jnp.where(d2 == best, kidx, k), axis=0, keepdims=True
        )

    col = lambda: pl.BlockSpec((1, k, 1, 1), lambda i: (i // tpb, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    ids = pl.pallas_call(
        kernel,
        grid=(b * tpb,),
        in_specs=[col(), col(), col(), row(), row()],
        out_specs=row(),
        out_shape=jax.ShapeDtypeStruct((b * tpb, SUB, LANE), jnp.int32),
        interpret=interpret,
    )(cy, cx, pen, ly, lx)
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

    # pad the instance dim to a sublane multiple: the kernel reduces over
    # axis 0 of (N, TILE) registers, and Mosaic pads partial sublane tiles
    # with UNINITIALIZED rows (padded rows here carry mask 0 / penalty inf,
    # so they are inert in every reduction)
    npad = (-n) % 8
    if npad:
        masks = jnp.pad(masks, ((0, npad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, (0, npad))
        centers = jnp.pad(centers, ((0, npad), (0, 0)))
        n += npad

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
    # per-instance tables ride in VMEM as [N, 1] columns so the kernel body
    # broadcasts them against the pixel tile: one (N, TILE) vector pass
    # replaces the N-iteration scalar loop (~3x on the VPU)
    tables = tuple(t.reshape(n, 1) for t in (cy, cx, ry, rx, pen, okf))

    def kernel(cy_ref, cx_ref, ry_ref, rx_ref, pen_ref, ok_ref, m_ref, out_ref):
        t = pl.program_id(0)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1) + t * TILE
        y = (idx // w).astype(jnp.float32)  # (1, TILE)
        x = (idx % w).astype(jnp.float32)
        mk = m_ref[...].astype(jnp.float32) * ok_ref[...]  # (N, TILE)
        dy = y - ry_ref[...]
        dx = x - rx_ref[...]
        d2 = dy * dy + dx * dx + pen_ref[...]
        outside = (jnp.abs(dy) > lim) | (jnp.abs(dx) > lim)
        d2min = jnp.min(jnp.where(outside, jnp.inf, d2), axis=0)  # (TILE,)
        # last-wins owner (reference paint order): highest masked row index,
        # via max over (k+1) * covered; exact in f32 for any sane N
        krank = (jax.lax.broadcasted_iota(jnp.int32, (n, TILE), 0)
                 + 1).astype(jnp.float32)  # Mosaic: iota must be int
        rank = jnp.max(jnp.where(mk > 0, krank, 0.0), axis=0)  # (TILE,)
        owned = rank > 0
        onehot = krank == rank[None, :]  # true at exactly row rank-1
        cy_sel = jnp.sum(jnp.where(onehot, cy_ref[...], 0.0), axis=0)
        cx_sel = jnp.sum(jnp.where(onehot, cx_ref[...], 0.0), axis=0)
        out_ref[0, :] = jnp.where(
            jnp.isfinite(d2min), jnp.exp(-d2min * inv2s2), 0.0
        )
        out_ref[1, :] = jnp.where(owned, (cy_sel - y[0]) / sy, 0.0)
        out_ref[2, :] = jnp.where(owned, (cx_sel - x[0]) / sx, 0.0)

    col = lambda: pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    enc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[col(), col(), col(), col(), col(), col(),
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

    # sublane-pad the instance dim (see the single-frame kernel)
    npad = (-n) % 8
    if npad:
        masks = jnp.pad(masks, ((0, 0), (0, npad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, npad)))
        centers = jnp.pad(centers, ((0, 0), (0, npad), (0, 0)))
        n += npad

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
    # per-batch [N, 1] table columns in VMEM (see the single-frame kernel)
    tables = tuple(t.reshape(b, n, 1) for t in (cy, cx, ry, rx, pen, okf))

    def kernel(cy_ref, cx_ref, ry_ref, rx_ref, pen_ref, ok_ref, m_ref, out_ref):
        t = pl.program_id(0) % tpb
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1) + t * TILE
        y = (idx // w).astype(jnp.float32)
        x = (idx % w).astype(jnp.float32)
        mk = m_ref[0].astype(jnp.float32) * ok_ref[0]  # (N, TILE)
        dy = y - ry_ref[0]
        dx = x - rx_ref[0]
        d2 = dy * dy + dx * dx + pen_ref[0]
        outside = (jnp.abs(dy) > lim) | (jnp.abs(dx) > lim)
        d2min = jnp.min(jnp.where(outside, jnp.inf, d2), axis=0)
        krank = (jax.lax.broadcasted_iota(jnp.int32, (n, TILE), 0)
                 + 1).astype(jnp.float32)  # Mosaic: iota must be int
        rank = jnp.max(jnp.where(mk > 0, krank, 0.0), axis=0)
        owned = rank > 0
        onehot = krank == rank[None, :]
        cy_sel = jnp.sum(jnp.where(onehot, cy_ref[0], 0.0), axis=0)
        cx_sel = jnp.sum(jnp.where(onehot, cx_ref[0], 0.0), axis=0)
        out_ref[0, 0, :] = jnp.where(
            jnp.isfinite(d2min), jnp.exp(-d2min * inv2s2), 0.0
        )
        out_ref[0, 1, :] = jnp.where(owned, (cy_sel - y[0]) / sy, 0.0)
        out_ref[0, 2, :] = jnp.where(owned, (cx_sel - x[0]) / sx, 0.0)

    col = lambda: pl.BlockSpec((1, n, 1), lambda i: (i // tpb, 0, 0),
                               memory_space=pltpu.VMEM)
    enc = pl.pallas_call(
        kernel,
        grid=(b * tpb,),
        in_specs=[col(), col(), col(), col(), col(), col(),
                  pl.BlockSpec((1, n, TILE), lambda i: (i // tpb, 0, i % tpb),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, TILE), lambda i: (i // tpb, 0, i % tpb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, hw + pad), jnp.float32),
        interpret=interpret,
    )(*tables, m8)
    return enc[:, :, :hw].reshape(b, 3, h, w)
