"""Box ops: IoU, fixed-shape NMS, anchors, deltas, ROI-align.

TPU-native replacements for the reference's detection CUDA kernels
(/root/reference/ext_modules/uoais/adet/layers/csrc: ml_nms.cu:1-138 and
DefROIAlign_cuda.cu:1-476) used by the UOAIS-Net base segmenter: NMS is a
fixed-iteration suppression scan over score-sorted boxes (no dynamic
shapes), and ROI-align is batched bilinear grid sampling via gathers.
Boxes are XYXY float.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def box_area(boxes):
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def box_iou(a, b):
    """Pairwise IoU: a [N, 4], b [M, 4] -> [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(boxes, scores, iou_threshold: float = 0.5, max_out: int | None = None):
    """Fixed-shape greedy NMS (ml_nms.cu semantics, single class).

    Returns keep [N] bool in the ORIGINAL order. The scan walks boxes in
    score order, suppressing any box with IoU > threshold against an
    already-kept higher-scoring box.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = box_iou(b, b)

    def body(keep, i):
        # box i (in sorted order) survives iff no kept earlier box overlaps it
        earlier = jnp.arange(n) < i
        suppressed = jnp.any(keep & earlier & (iou[i] > iou_threshold))
        keep = keep.at[i].set(~suppressed)
        return keep, None

    keep_sorted, _ = lax.scan(body, jnp.ones((n,), bool), jnp.arange(n))
    if max_out is not None and max_out < n:
        rank = jnp.cumsum(keep_sorted.astype(jnp.int32))
        keep_sorted = keep_sorted & (rank <= max_out)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def generate_anchors(feat_h: int, feat_w: int, stride: int,
                     sizes=(32, 64, 128), aspect_ratios=(0.5, 1.0, 2.0),
                     offset: float = 0.5):
    """Dense anchors [H*W*A, 4] XYXY, centered on feature cells.

    offset=0.5 centers anchors on cell centers; the detectron2
    DefaultAnchorGenerator convention (used by the UOAIS-Net reference
    checkpoints) is offset=0.0 (corners).
    """
    import numpy as np

    anchors = []
    for s in sizes:
        for ar in aspect_ratios:
            w = s * np.sqrt(1.0 / ar)
            h = s * np.sqrt(ar)
            anchors.append([-w / 2, -h / 2, w / 2, h / 2])
    base = np.asarray(anchors, np.float32)  # [A, 4]
    ys = (np.arange(feat_h) + offset) * stride
    xs = (np.arange(feat_w) + offset) * stride
    cx, cy = np.meshgrid(xs, ys)
    shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
    return jnp.asarray((shifts + base[None]).reshape(-1, 4))


def apply_deltas(boxes, deltas, clip_hw=None, weights=None, scale_clamp=4.0):
    """Faster-RCNN box decoding: (dx, dy, dw, dh) on XYXY anchors.

    weights: optional (wx, wy, ww, wh) Box2BoxTransform divisors (detectron2
    uses (10, 10, 5, 5) for the ROI box head, (1, 1, 1, 1) for the RPN);
    scale_clamp bounds dw/dh (detectron2: log(1000/16) ~= 4.135)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    if weights is not None:
        wx, wy, ww, wh = weights
        dx, dy, dw, dh = dx / wx, dy / wy, dw / ww, dh / wh
    dw = jnp.clip(dw, -scale_clamp, scale_clamp)
    dh = jnp.clip(dh, -scale_clamp, scale_clamp)
    ncx = cx + dx * w
    ncy = cy + dy * h
    nw = w * jnp.exp(dw)
    nh = h * jnp.exp(dh)
    out = jnp.stack(
        [ncx - nw / 2, ncy - nh / 2, ncx + nw / 2, ncy + nh / 2], axis=-1
    )
    if clip_hw is not None:
        hh, ww = clip_hw
        out = jnp.stack([
            jnp.clip(out[:, 0], 0, ww), jnp.clip(out[:, 1], 0, hh),
            jnp.clip(out[:, 2], 0, ww), jnp.clip(out[:, 3], 0, hh),
        ], axis=-1)
    return out


def boxes_to_deltas(anchors, targets):
    """Inverse of apply_deltas (for RPN/box-head training)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    tw = targets[:, 2] - targets[:, 0]
    th = targets[:, 3] - targets[:, 1]
    tcx = targets[:, 0] + 0.5 * tw
    tcy = targets[:, 1] + 0.5 * th
    return jnp.stack([
        (tcx - acx) / jnp.maximum(aw, 1e-6),
        (tcy - acy) / jnp.maximum(ah, 1e-6),
        jnp.log(jnp.maximum(tw, 1e-6) / jnp.maximum(aw, 1e-6)),
        jnp.log(jnp.maximum(th, 1e-6) / jnp.maximum(ah, 1e-6)),
    ], axis=-1)


def assign_fpn_levels(boxes, min_level: int = 2, max_level: int = 5,
                      canonical_level: int = 4, canonical_size: float = 224.0):
    """FPN level per box: floor(k0 + log2(sqrt(area)/s0)), clamped.

    The detectron2 `assign_boxes_to_levels` rule used by the reference's
    ROIPooler (uoais ROI heads pool from ["p2","p3","p4","p5"],
    configs/R50_rgbdconcat_mlc_occatmask_hom_concat.yaml ROI_HEADS block).
    """
    area = box_area(boxes)
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(jnp.maximum(area, 1e-6)) / canonical_size + 1e-8)
    )
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def roi_align_multilevel(features: dict, boxes: jnp.ndarray, out_size: int,
                         strides: dict, min_level: int = 2, max_level: int = 5):
    """ROI-align from an FPN pyramid with area-based level assignment.

    features: {"p2": [H2, W2, C], ...}; strides: {"p2": 4, ...}. Aligns every
    box on every level (fixed shapes — the per-level cost is tiny at ROI
    counts <= a few hundred) and selects the assigned level's result with a
    one-hot mask, which XLA turns into a masked sum instead of a gather.
    """
    lvl = assign_fpn_levels(boxes, min_level, max_level)
    out = None
    for name, stride in strides.items():
        level_idx = int(name[1:])
        if not (min_level <= level_idx <= max_level):
            continue
        sel = (lvl == level_idx).astype(features[name].dtype)[:, None, None, None]
        pooled = roi_align(features[name], boxes, out_size=out_size, stride=stride)
        out = pooled * sel if out is None else out + pooled * sel
    return out


@partial(jax.jit, static_argnames=("out_size",))
def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, out_size: int = 14,
              stride: int = 1, offsets: jnp.ndarray | None = None) -> jnp.ndarray:
    """ROI-align via bilinear grid sampling (one sample per output cell,
    detectron2 aligned=True convention).

    features [H, W, C] (a single level, stride given); boxes [N, 4] XYXY in
    image coordinates. Returns [N, out_size, out_size, C].

    `offsets` [N, out_size, out_size, 2] adds learned per-cell (dy, dx)
    displacements scaled by the box size — the deformable variant
    (DefROIAlign_cuda.cu's trans_std-scaled offsets).
    """
    h, w, c = features.shape
    b = boxes / stride  # to feature coordinates
    if offsets is None:
        offsets = jnp.zeros((boxes.shape[0], out_size, out_size, 2), jnp.float32)

    def sample_one(box, off):
        x0, y0, x1, y1 = box
        bw = jnp.maximum(x1 - x0, 1e-6)
        bh = jnp.maximum(y1 - y0, 1e-6)
        gy = y0 + (jnp.arange(out_size) + 0.5) * bh / out_size - 0.5
        gx = x0 + (jnp.arange(out_size) + 0.5) * bw / out_size - 0.5
        yy = jnp.broadcast_to(gy[:, None], (out_size, out_size)) + off[..., 0] * bh
        xx = jnp.broadcast_to(gx[None, :], (out_size, out_size)) + off[..., 1] * bw
        y0i = jnp.floor(yy)
        x0i = jnp.floor(xx)
        dy = yy - y0i
        dx = xx - x0i

        def gather(cy, cx):
            inb = (cy >= 0) & (cy < h) & (cx >= 0) & (cx < w)
            idx = jnp.clip(cy, 0, h - 1).astype(jnp.int32) * w + jnp.clip(
                cx, 0, w - 1
            ).astype(jnp.int32)
            vals = features.reshape(-1, c)[idx.reshape(-1)].reshape(out_size, out_size, c)
            return vals * inb[..., None].astype(features.dtype)

        return (
            gather(y0i, x0i) * ((1 - dy) * (1 - dx))[..., None]
            + gather(y0i, x0i + 1) * ((1 - dy) * dx)[..., None]
            + gather(y0i + 1, x0i) * (dy * (1 - dx))[..., None]
            + gather(y0i + 1, x0i + 1) * (dy * dx)[..., None]
        )

    return jax.vmap(sample_one)(b, offsets)
