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
