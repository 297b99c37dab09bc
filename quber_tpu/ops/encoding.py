"""Center-Gaussian / offset encodings from instance mask stacks, on device.

TPU-native replacement for the reference's per-mask Python loops in
/root/reference/maskrefiner/data/dataset_mappers/target_generator.py
(PanopticDeepLabTargetGenerator:8-165, PerturbedInputGenerator:169-281) and
the inference-time re-implementation in maskrefiner/predictor.py:287-357.

Variable instance counts are handled with MAX_INSTANCES padding + validity
masks; the paint loop is a `lax.scan` over the instance axis (cheap VPU
elementwise per step, no [N, H, W] float intermediates in HBM).

Semantics preserved from the reference:
  * Gaussian value at pixel p for instance with centroid c is
    exp(-(|p - round(c)|^2) / (2 sigma^2)), painted only inside the
    (6 sigma + 3)-sized window |p - round(c)| <= 3 sigma + 1, combined with a
    running per-pixel max (target_generator.py:125-142).
  * Offsets use the *unrounded* float centroid; overlapping masks are
    resolved last-instance-wins, mirroring the reference's sequential
    overwrite (target_generator.py:144-146).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def instance_stats(masks: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Areas and float centroids of a padded mask stack.

    masks: [N, H, W] bool/float; valid: [N] bool or None.
    Returns (areas [N] f32, centers_yx [N, 2] f32); empty/invalid instances get
    area 0 and centroid (0, 0).
    """
    n, h, w = masks.shape
    m = masks.astype(jnp.float32)
    if valid is not None:
        m = m * valid.astype(jnp.float32)[:, None, None]
    areas = jnp.sum(m, axis=(1, 2))
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    denom = jnp.maximum(areas, 1.0)
    cy = jnp.sum(m * ys, axis=(1, 2)) / denom
    cx = jnp.sum(m * xs, axis=(1, 2)) / denom
    return areas, jnp.stack([cy, cx], axis=-1)


def _gaussian_paint(cy, cx, h, w, sigma):
    """Windowed Gaussian bump centered at round((cy, cx)) — see module doc."""
    ry = jnp.round(cy)
    rx = jnp.round(cx)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - ry
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - rx
    g = jnp.exp(-(xs**2 + ys**2) / (2.0 * sigma**2))
    lim = 3 * sigma + 1
    window = (jnp.abs(ys) <= lim) & (jnp.abs(xs) <= lim)
    return jnp.where(window, g, 0.0)


@partial(jax.jit, static_argnames=("sigma", "normalize", "chunk"))
def encode_initial_masks(
    masks: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    sigma: int = 10,
    normalize: bool = True,
    chunk: int = 16384,
) -> jnp.ndarray:
    """Initial-prediction offset encoding: [N, H, W] masks -> [3, H, W].

    Channel 0: max-combined center Gaussian heatmap; channels 1-2: per-pixel
    (dy, dx) to the owning instance's float centroid, divided by (H, W) when
    `normalize` (the inference-input convention, predictor.py:311-357 /
    target_generator.py:268-274). Unnormalized gives the training target
    offsets (target_generator.py:144-146).

    Fully vectorized (no per-instance scan — a 64-step scan over full
    [H, W] maps cost ~66 ms/frame on a v5e):
      * heatmap: since exp(-d^2 / 2 sigma^2) is monotone in d^2, the max
        over per-instance windowed Gaussians equals the Gaussian of the
        min over instances of d^2 (d^2 := +inf outside the instance's
        paint window). The min reduction runs in pixel chunks like
        grouping.group_pixels.
      * offsets: the reference paints instances sequentially so overlaps
        resolve last-wins — equivalently the owner of a pixel is the
        highest instance index whose mask covers it (one max-reduce over
        the mask stack) and offsets are gathered from its centroid.
    """
    n, h, w = masks.shape
    if valid is None:
        valid = jnp.sum(masks.astype(jnp.float32), axis=(1, 2)) > 0
    else:
        valid = valid & (jnp.sum(masks.astype(jnp.float32), axis=(1, 2)) > 0)

    areas, centers = instance_stats(masks, valid)
    ry = jnp.round(centers[:, 0])
    rx = jnp.round(centers[:, 1])
    lim = float(3 * sigma + 1)

    # --- heatmap: min over instances of window-clipped d^2 ---
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    npix = h * w
    inf_pen = jnp.where(valid, 0.0, jnp.inf)

    def min_d2(args):
        py, px = args  # [chunk]
        dy = py[:, None] - ry[None, :]
        dx = px[:, None] - rx[None, :]
        d2 = dy * dy + dx * dx
        outside = (jnp.abs(dy) > lim) | (jnp.abs(dx) > lim)
        d2 = jnp.where(outside, jnp.inf, d2) + inf_pen[None, :]
        return jnp.min(d2, axis=1)

    if npix * n * 4 <= 128 * 1024 * 1024:
        # small instance axis: one vectorized [H*W, N] pass. The sequential
        # lax.map chunking below is latency-bound (~19 dependent steps at
        # 480x640) and only pays off when N is large enough that the full
        # distance matrix would blow past HBM-friendly sizes.
        d2min = min_d2((ys, xs))
    else:
        pad = (-npix) % chunk
        ysp = jnp.pad(ys, (0, pad))
        xsp = jnp.pad(xs, (0, pad))
        nchunks = (npix + pad) // chunk
        d2min = jax.lax.map(
            min_d2, (ysp.reshape(nchunks, chunk), xsp.reshape(nchunks, chunk))
        ).reshape(-1)[:npix]
    center_map = jnp.where(
        jnp.isfinite(d2min), jnp.exp(-d2min / (2.0 * sigma**2)), 0.0
    ).reshape(h, w)

    # --- offsets: last-wins owner via max over instance indices ---
    m = masks.astype(jnp.int32) * valid.astype(jnp.int32)[:, None, None]
    ids = jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None]
    owner = jnp.max(m * ids, axis=0)  # [H, W], 0 = unowned
    cy_tab = jnp.concatenate([jnp.zeros((1,)), centers[:, 0]])
    cx_tab = jnp.concatenate([jnp.zeros((1,)), centers[:, 1]])
    sy = float(h) if normalize else 1.0
    sx = float(w) if normalize else 1.0
    ys2 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs2 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    owned = owner > 0
    off_y = jnp.where(owned, (cy_tab[owner] - ys2) / sy, 0.0)
    off_x = jnp.where(owned, (cx_tab[owner] - xs2) / sx, 0.0)
    return jnp.stack([center_map, off_y, off_x], axis=0)


@partial(jax.jit, static_argnames=("sigma", "small_instance_area", "small_instance_weight"))
def panoptic_train_targets(
    masks: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    is_thing: jnp.ndarray | None = None,
    is_crowd: jnp.ndarray | None = None,
    sigma: int = 10,
    small_instance_area: int = 4096,
    small_instance_weight: int = 3,
) -> dict:
    """Panoptic-DeepLab training targets from an instance mask stack.

    TPU-vectorized equivalent of PanopticDeepLabTargetGenerator.__call__
    (target_generator.py:53-165) with the QuBER convention that "semantic"
    means binary foreground of all segments:
      sem_seg [H, W]           union foreground {0, 1}
      center [H, W]            Gaussian center heatmap (things only)
      offset [2, H, W]         unnormalized (dy, dx) to float centroids
      sem_seg_weights [H, W]   1, raised to `small_instance_weight` on small things
      center_weights [1, H, W] union of non-crowd segments
      offset_weights [1, H, W] same as center_weights (ignore_stuff handled by caller)
    """
    n, h, w = masks.shape
    m = masks.astype(jnp.float32)
    if valid is None:
        valid = jnp.sum(m, axis=(1, 2)) > 0
    else:
        valid = valid & (jnp.sum(m, axis=(1, 2)) > 0)
    if is_thing is None:
        is_thing = jnp.ones((n,), bool)
    if is_crowd is None:
        is_crowd = jnp.zeros((n,), bool)

    areas, centers = instance_stats(masks, valid)
    vm = m * valid.astype(jnp.float32)[:, None, None]

    sem_seg = (jnp.sum(vm, axis=0) > 0).astype(jnp.float32)
    noncrowd = vm * (~is_crowd).astype(jnp.float32)[:, None, None]
    loss_region = (jnp.sum(noncrowd, axis=0) > 0).astype(jnp.float32)

    small = (areas < small_instance_area) & valid & is_thing
    small_region = jnp.sum(vm * small.astype(jnp.float32)[:, None, None], axis=0) > 0
    sem_weights = jnp.where(small_region, float(small_instance_weight), 1.0)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def body(carry, inp):
        center_map, off_y, off_x = carry
        mask_i, valid_i, thing_i, c_i = inp
        ok = (valid_i & thing_i).astype(jnp.float32)
        cy, cx = c_i[0], c_i[1]
        g = _gaussian_paint(cy, cx, h, w, sigma) * ok
        center_map = jnp.maximum(center_map, g)
        mi = mask_i.astype(jnp.float32) * ok
        off_y = jnp.where(mi > 0, cy - ys, off_y)
        off_x = jnp.where(mi > 0, cx - xs, off_x)
        return (center_map, off_y, off_x), None

    init = (jnp.zeros((h, w), jnp.float32),) * 3
    (center_map, off_y, off_x), _ = jax.lax.scan(
        body, init, (masks, valid, is_thing, centers)
    )

    return {
        "sem_seg": sem_seg,
        "center": center_map,
        "offset": jnp.stack([off_y, off_x], axis=0),
        "sem_seg_weights": sem_weights,
        "center_weights": loss_region[None],
        "offset_weights": loss_region[None],
        "centers": centers,
        "areas": areas,
    }
