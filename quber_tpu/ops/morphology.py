"""Binary morphology and quadruple (TP/TN/FP/FN) error maps, TPU-native.

Re-designs the reference's OpenCV-based offline error-map generation
(/root/reference/tools/ours/panoptic2eee.py:23-132) as fused, jit-safe XLA
ops. The reference erodes each mask N times with a 3x3 all-ones kernel after
padding one zero ring (panoptic2eee.py:44-50); since iterated erosion with a
full square equals a single erosion with a (2N+1)x(2N+1) square, we lower the
whole chain to two separable `lax.reduce_window` min ops with zero borders,
which XLA tiles onto the VPU in one pass per axis.

All functions take NHW / HW float or bool arrays and are shape-polymorphic in
Python (static shapes at trace time).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _min_window_1d(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Sliding-window minimum of width `size` along `axis`, zero border.

    Matches OpenCV erosion border semantics used by the reference: the image
    is padded with background (0) so masks touching the border erode inward
    (the reference achieves this with an explicit 1-px zero ring,
    panoptic2eee.py:45).
    """
    if size <= 1:
        return x
    pad = size // 2
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (pad, pad)
    xp = jnp.pad(x, pad_cfg, constant_values=0)
    window = [1] * x.ndim
    window[axis] = size
    return lax.reduce_window(
        xp,
        init_value=jnp.array(jnp.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max,
        computation=lax.min,
        window_dimensions=window,
        window_strides=[1] * x.ndim,
        padding="VALID",
    )


def _max_window_1d(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Sliding-window maximum (dilation), zero border."""
    if size <= 1:
        return x
    pad = size // 2
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (pad, pad)
    xp = jnp.pad(x, pad_cfg, constant_values=0)
    window = [1] * x.ndim
    window[axis] = size
    return lax.reduce_window(
        xp,
        init_value=jnp.array(-jnp.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        computation=lax.max,
        window_dimensions=window,
        window_strides=[1] * x.ndim,
        padding="VALID",
    )


def erode(mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """Erode a binary mask `iterations` times with a 3x3 all-ones kernel.

    Equivalent to the reference's `cv2.erode(pad(mask), ones(3,3),
    iterations=N)` followed by a crop (panoptic2eee.py:44-48): out-of-image
    pixels count as background. Works on float32/int arrays of shape
    (..., H, W); eroding the last two axes.
    """
    if iterations <= 0:
        return mask
    size = 2 * iterations + 1
    x = mask.astype(jnp.float32)
    x = _min_window_1d(x, size, axis=mask.ndim - 2)
    x = _min_window_1d(x, size, axis=mask.ndim - 1)
    return x.astype(mask.dtype)


def dilate(mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """Dilate a binary mask `iterations` times with a 3x3 all-ones kernel."""
    if iterations <= 0:
        return mask
    size = 2 * iterations + 1
    x = mask.astype(jnp.float32)
    x = _max_window_1d(x, size, axis=mask.ndim - 2)
    x = _max_window_1d(x, size, axis=mask.ndim - 1)
    return x.astype(mask.dtype)


def boundary_width(height: int, width: int, dilation_ratio: float) -> int:
    """Boundary-band width in pixels: round(ratio * image diagonal), min 1.

    Mirrors /root/reference/tools/ours/panoptic2eee.py:40-43.
    """
    diag = math.sqrt(height**2 + width**2)
    return max(1, int(round(dilation_ratio * diag)))


def mask_to_boundary(mask: jnp.ndarray, dilation_ratio: float = 0.02) -> jnp.ndarray:
    """Boundary band of a binary mask: mask - erode(mask, N).

    N = round(dilation_ratio * diagonal). The band lives inside the mask.
    Accepts (..., H, W); the reference semantics are per-mask
    (panoptic2eee.py:33-50). Returns the same dtype as the input (band=1).
    """
    h, w = mask.shape[-2], mask.shape[-1]
    n = boundary_width(h, w, dilation_ratio)
    m = mask.astype(jnp.float32)
    return (m - erode(m, n)).astype(mask.dtype)


def masks_to_fg(masks: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Union foreground of a padded stack of masks [N, H, W] -> [H, W].

    `valid` is an optional [N] bool marking real (non-padding) instances.
    Mirrors panoptic2eee.py:23-29.
    """
    m = masks.astype(jnp.float32)
    if valid is not None:
        m = m * valid.astype(jnp.float32)[:, None, None]
    return (jnp.sum(m, axis=0) > 0).astype(jnp.float32)


def masks_to_boundary(
    masks: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    dilation_ratio: float = 0.01,
) -> jnp.ndarray:
    """Union of per-mask boundary bands [N, H, W] -> [H, W].

    Note the reference uses ratio 0.01 for the union variant but 0.02 for the
    single-mask default (panoptic2eee.py:33,52); we keep both defaults.
    """
    h, w = masks.shape[-2], masks.shape[-1]
    n = boundary_width(h, w, dilation_ratio)
    m = masks.astype(jnp.float32)
    bnd = m - erode(m, n)  # eroded along the trailing two axes, batched over N
    if valid is not None:
        bnd = bnd * valid.astype(jnp.float32)[:, None, None]
    return (jnp.sum(bnd, axis=0) > 0).astype(jnp.float32)


def error_maps(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """TP/TN/FP/FN maps between two binary maps, stacked on a new axis 0.

    Mirrors the logical-AND table at panoptic2eee.py:115-123:
      TP = gt & pred, TN = !gt & !pred, FP = !gt & pred, FN = gt & !pred.
    """
    g = gt.astype(bool)
    p = pred.astype(bool)
    return jnp.stack(
        [g & p, (~g) & (~p), (~g) & p, g & (~p)], axis=0
    ).astype(jnp.float32)


@partial(jax.jit, static_argnames=("boundary_dilation_ratio",))
def quadruple_error_maps(
    gt_masks: jnp.ndarray,
    pred_masks: jnp.ndarray,
    gt_valid: jnp.ndarray | None = None,
    pred_valid: jnp.ndarray | None = None,
    boundary_dilation_ratio: float = 0.01,
) -> dict:
    """The full quadruple-boundary-error target: 8 channels in one fused op.

    Given GT and predicted instance mask stacks [N, H, W] (zero-padded, with
    optional validity vectors), produces the per-pixel TP/TN/FP/FN error maps
    for both the foreground region and the boundary band — the training
    targets of the QuBER refiner (reference offline generator
    panoptic2eee.py:110-132, consumed by the dataset mapper).

    Returns a dict with:
      'mask':     [4, H, W] float32 (TP, TN, FP, FN) of the fg union
      'boundary': [4, H, W] float32 (TP, TN, FP, FN) of the boundary union
      'gt_fg', 'pred_fg', 'gt_boundary', 'pred_boundary': [H, W]
    """
    gt_fg = masks_to_fg(gt_masks, gt_valid)
    pred_fg = masks_to_fg(pred_masks, pred_valid)
    gt_bnd = masks_to_boundary(gt_masks, gt_valid, boundary_dilation_ratio)
    pred_bnd = masks_to_boundary(pred_masks, pred_valid, boundary_dilation_ratio)
    return {
        "mask": error_maps(gt_fg, pred_fg),
        "boundary": error_maps(gt_bnd, pred_bnd),
        "gt_fg": gt_fg,
        "pred_fg": pred_fg,
        "gt_boundary": gt_bnd,
        "pred_boundary": pred_bnd,
    }


def seg2bmap(mask: jnp.ndarray) -> jnp.ndarray:
    """1-px inner boundary of a binary mask (device variant).

    The reference's metric boundary uses cv2.findContours with RETR_EXTERNAL
    (/root/reference/eval/utilities.py:672-696); this XLA formulation uses the
    4-connected erosion difference (a pixel is boundary if any 4-neighbour is
    background or out of image), which matches external contours exactly for
    hole-free masks and additionally marks hole rims. The exact cv2 variant
    lives in quber_tpu.evaluation.metrics for parity benchmarking.
    """
    m = mask.astype(jnp.float32)
    up = jnp.pad(m, [(0, 0)] * (m.ndim - 2) + [(1, 0), (0, 0)])[..., :-1, :]
    down = jnp.pad(m, [(0, 0)] * (m.ndim - 2) + [(0, 1), (0, 0)])[..., 1:, :]
    left = jnp.pad(m, [(0, 0)] * (m.ndim - 2) + [(0, 0), (1, 0)])[..., :, :-1]
    right = jnp.pad(m, [(0, 0)] * (m.ndim - 2) + [(0, 0), (0, 1)])[..., :, 1:]
    interior = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right)) * m
    return m - interior
