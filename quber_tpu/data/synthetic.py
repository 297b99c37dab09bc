"""Synthetic tabletop scene renderer for self-contained train/eval runs.

The reference trains on UOAIS-Sim (Blender-rendered tabletop scenes,
`register_uoais_sim_panoptic.py:30-61`) which is not redistributable here.
This module renders a stand-in distribution that preserves the properties
the refiner learns from:

 - objects sit on a planar surface that is FARTHER than the objects
   (depth step at object boundaries, the key refinement cue);
 - object surfaces are smooth (spherical/slab bumps) with sensor-style
   quantization, the background plane is tilted;
 - RGB is textured per object with a distinct albedo + per-pixel noise, so
   color edges coincide with GT boundaries (what boundary refinement keys on);
 - objects occlude each other: GT masks are the VISIBLE regions (matching
   what an annotation label image can represent, eval_utils.py:239 semantics);
 - a fraction of zero-depth pixels simulates sensor dropout (exercises the
   inpaint path, preprocess_utils.py:44-64).

Shapes are superellipses (|x/a|^p + |y/b|^p <= 1) at random orientation:
p=2 gives ellipses, p>2 rounded boxes — covering the convex-ish silhouettes
of the tabletop object sets (OSD/OCID) without any mesh assets.
"""

from __future__ import annotations

import numpy as np


def _superellipse(ys, xs, cy, cx, a, b, theta, p):
    """Boolean mask of a rotated superellipse."""
    dy, dx = ys - cy, xs - cx
    u = np.cos(theta) * dx + np.sin(theta) * dy
    v = -np.sin(theta) * dx + np.cos(theta) * dy
    return (np.abs(u / a) ** p + np.abs(v / b) ** p) <= 1.0


def render_scene(
    rng: np.random.RandomState,
    h: int,
    w: int,
    depth_range=(2500.0, 15000.0),
    n_objects=None,
    dropout_frac: float = 0.0,
    return_amodal: bool = False,
):
    """Render one scene.

    Returns (rgb uint8 [h,w,3], depth_mm float32 [h,w], masks uint8 [n,h,w]).
    Masks are visible regions only (later = nearer objects occlude earlier
    ones); fully-occluded objects are dropped. With `return_amodal`, a
    fourth array of the full (pre-occlusion) masks per kept object is
    appended — the amodal ground truth UOAIS-Net-style amodal training
    needs (rcnn_heads.py amodal mask head targets).
    """
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    lo, hi = float(depth_range[0]), float(depth_range[1])
    span = hi - lo

    # background: tilted plane with mild large-scale ripple + speckle
    gy, gx = rng.uniform(-0.12, 0.12), rng.uniform(-0.12, 0.12)
    base = rng.uniform(lo + 0.55 * span, lo + 0.8 * span)
    depth = base + gy * span * (ys / h - 0.5) + gx * span * (xs / w - 0.5)
    depth += 0.004 * span * np.sin(ys / h * rng.uniform(2, 5) * np.pi + rng.rand() * 6)
    table_rgb = np.full((h, w, 3), rng.randint(30, 110, 3), np.float32)
    table_rgb += rng.randn(h, w, 3) * rng.uniform(2, 8)
    # low-frequency table shading
    table_rgb *= (0.85 + 0.3 * (xs / w) * rng.rand())[..., None]
    rgb = table_rgb

    if n_objects is None:
        n_objects = rng.randint(3, 9)
    margin = max(10, min(h, w) // 10)
    r_hi = max(14, min(h, w) // 5)
    r_lo = max(8, min(h, w) // 14)

    label = np.zeros((h, w), np.int32)
    keep_ids = []
    full_masks = {}
    for k in range(1, n_objects + 1):
        cy = rng.randint(margin, h - margin)
        cx = rng.randint(margin, w - margin)
        a = rng.randint(r_lo, r_hi)
        b = int(a * rng.uniform(0.5, 1.0))
        theta = rng.uniform(0, np.pi)
        p = rng.choice([2.0, 2.0, 3.0, 5.0])
        m = _superellipse(ys, xs, cy, cx, a, b, theta, p)
        if not m.any():
            continue
        # object top surface: slab at a near depth with a spherical cap bump
        z_obj = rng.uniform(lo + 0.06 * span, lo + 0.42 * span)
        rr = np.maximum(1.0 - (np.abs((np.cos(theta) * (xs - cx) + np.sin(theta) * (ys - cy)) / a) ** p
                               + np.abs((-np.sin(theta) * (xs - cx) + np.cos(theta) * (ys - cy)) / np.maximum(b, 1)) ** p), 0.0)
        bump = np.sqrt(rr) * rng.uniform(0.01, 0.05) * span
        depth = np.where(m, z_obj - bump, depth)
        albedo = rng.randint(90, 255, 3).astype(np.float32)
        shade = (0.8 + 0.4 * rr)[..., None]
        obj_rgb = albedo * shade + rng.randn(h, w, 3) * rng.uniform(2, 10)
        rgb = np.where(m[..., None], obj_rgb, rgb)
        label = np.where(m, k, label)  # later object wins = occludes
        keep_ids.append(k)
        full_masks[k] = m

    masks, amodal = [], []
    for k in keep_ids:
        vis = label == k
        if vis.sum() >= 24:  # drop (nearly) fully-occluded objects
            masks.append(vis.astype(np.uint8))
            amodal.append(full_masks[k].astype(np.uint8))
    if not masks:  # degenerate scene: force one central object
        m = _superellipse(ys, xs, h // 2, w // 2, r_hi, r_hi, 0.0, 2.0)
        depth = np.where(m, lo + 0.2 * span, depth)
        rgb = np.where(m[..., None], np.float32([200, 80, 80]), rgb)
        masks = [m.astype(np.uint8)]
        amodal = [m.astype(np.uint8)]

    if dropout_frac > 0:
        # sensor dropout blobs: zero depth at object boundaries + speckle
        drop = rng.rand(h, w) < dropout_frac
        depth = np.where(drop, 0.0, depth)

    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    if return_amodal:
        return (rgb, depth.astype(np.float32), np.asarray(masks, np.uint8),
                np.asarray(amodal, np.uint8))
    return rgb, depth.astype(np.float32), np.asarray(masks, np.uint8)


def synthetic_records(
    n: int,
    h: int,
    w: int,
    seed: int = 0,
    depth_range=(2500, 15000),
    target_iou=(0.7, 0.95),
    dropout_frac: float = 0.0,
    n_objects=None,
):
    """In-memory dataset records exercising the full mapper path (the
    train_net.py --synthetic data source). `n_objects` is an optional
    (lo, hi) range sampled per scene (default: the renderer's 3-8)."""
    from quber_tpu.data import rle
    from quber_tpu.data.perturb import perturb_masks

    rng = np.random.RandomState(seed)
    records = []
    for _ in range(n):
        n_obj = (rng.randint(n_objects[0], n_objects[1] + 1)
                 if n_objects else None)
        rgb, depth, masks = render_scene(rng, h, w, depth_range,
                                         dropout_frac=dropout_frac,
                                         n_objects=n_obj)
        pert = perturb_masks(masks, rng, target_iou=target_iou)
        records.append({
            "gt_masks": masks,
            "perturbed_segmentation": [rle.encode(m) for m in pert],
            "height": h, "width": w,
            "rgb": rgb,
            "depth_mm": depth,
        })
    return records
