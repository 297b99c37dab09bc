"""Zoom-in second-stage refinement: crop -> re-segment -> paste.

The reference's UCN and MSMFormer wrappers share this pattern
(/root/reference/eval/base_model.py: crop_rois :843-896 builds padded
square crops per instance, a second network re-segments each crop, and
match_label_crop :898-961 keeps the refined component and pastes it back).
Fixed-shape XLA formulation: every instance slot gets a crop (invalid
slots no-op), the paste is a scan where later instances overwrite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_boxes_from_labels(labels: jnp.ndarray, max_instances: int,
                               pad_ratio: float = 0.4):
    """Per-instance expanded square bounding boxes XYXY from a label map
    (crop_rois semantics, base_model.py:843-896)."""
    h, w = labels.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ids = jnp.arange(1, max_instances + 1)
    masks = labels[None] == ids[:, None, None]
    big = 1e9

    def minmax(coord):
        mn = jnp.min(jnp.where(masks, coord[None], big), axis=(1, 2))
        mx = jnp.max(jnp.where(masks, coord[None], -big), axis=(1, 2))
        return mn, mx

    y0, y1 = minmax(jnp.broadcast_to(ys, (h, w)))
    x0, x1 = minmax(jnp.broadcast_to(xs, (h, w)))
    cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
    bh = (y1 - y0) * (1 + pad_ratio) + 8
    bw = (x1 - x0) * (1 + pad_ratio) + 8
    side = jnp.maximum(bh, bw)  # square crops keep aspect
    boxes = jnp.stack([
        jnp.clip(cx - side / 2, 0, w), jnp.clip(cy - side / 2, 0, h),
        jnp.clip(cx + side / 2, 0, w), jnp.clip(cy + side / 2, 0, h),
    ], axis=-1)
    valid = jnp.any(masks, axis=(1, 2))
    return jnp.where(valid[:, None], boxes, 0.0), valid


def zoom_refine_labels(labels: jnp.ndarray, refine_one, max_instances: int,
                       zoom: int, pad_ratio: float = 0.4):
    """Second-stage refinement of an int label map.

    refine_one(box [4], valid bool, inst_id int) -> [zoom, zoom] f32 in
    {0, 1}: the refined mask of that instance inside its crop. The result
    replaces the instance's region in the full map (match_label_crop paste
    order: later instances overwrite)."""
    h, w = labels.shape
    boxes, bvalid = instance_boxes_from_labels(labels, max_instances,
                                               pad_ratio=pad_ratio)
    ids = jnp.arange(1, max_instances + 1)
    crops = jax.vmap(refine_one)(boxes, bvalid, ids)  # [N, zoom, zoom]

    def paste(full, args):
        crop, box, ok, inst_id = args
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        gy = (ys + 0.5 - box[1]) / jnp.maximum(box[3] - box[1], 1e-3) * zoom - 0.5
        gx = (xs + 0.5 - box[0]) / jnp.maximum(box[2] - box[0], 1e-3) * zoom - 0.5
        inside = (gy >= 0) & (gy < zoom) & (gx >= 0) & (gx < zoom)
        val = crop[
            jnp.clip(jnp.round(gy), 0, zoom - 1).astype(jnp.int32),
            jnp.clip(jnp.round(gx), 0, zoom - 1).astype(jnp.int32),
        ]
        refined_mask = inside & (val > 0.5) & ok
        # replace this instance's region with its refined mask
        full = jnp.where((full == inst_id) & ~refined_mask, 0, full)
        full = jnp.where(refined_mask, inst_id, full)
        return full, None

    full, _ = jax.lax.scan(paste, labels, (crops, boxes, bvalid, ids))
    return full
