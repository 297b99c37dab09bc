"""Box-op tests vs naive numpy/torch oracles."""

import numpy as np
import torch
import jax.numpy as jnp

from quber_tpu.ops import boxes as B


def naive_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx0 = max(boxes[i, 0], boxes[j, 0]); yy0 = max(boxes[i, 1], boxes[j, 1])
            xx1 = min(boxes[i, 2], boxes[j, 2]); yy1 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx1 - xx0, 0) * max(yy1 - yy0, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > thresh:
                suppressed[j] = True
    return sorted(keep)


def random_boxes(rng, n, size=200):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * 60 + 5
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_iou_matches_naive(rng):
    a = random_boxes(rng, 8)
    b = random_boxes(rng, 5)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(8):
        for j in range(5):
            xx0 = max(a[i, 0], b[j, 0]); yy0 = max(a[i, 1], b[j, 1])
            xx1 = min(a[i, 2], b[j, 2]); yy1 = min(a[i, 3], b[j, 3])
            inter = max(xx1 - xx0, 0) * max(yy1 - yy0, 0)
            union = ((a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
                     + (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1]) - inter)
            assert abs(got[i, j] - inter / union) < 1e-5


def test_nms_matches_naive(rng):
    for trial in range(3):
        boxes = random_boxes(rng, 24)
        scores = rng.rand(24).astype(np.float32)
        keep = np.asarray(B.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        want = naive_nms(boxes, scores, 0.5)
        assert sorted(np.nonzero(keep)[0].tolist()) == want


def test_nms_max_out(rng):
    boxes = random_boxes(rng, 30)
    scores = rng.rand(30).astype(np.float32)
    keep = np.asarray(B.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.9, max_out=5))
    assert keep.sum() <= 5


def test_deltas_roundtrip(rng):
    anchors = random_boxes(rng, 16)
    targets = random_boxes(rng, 16)
    deltas = B.boxes_to_deltas(jnp.asarray(anchors), jnp.asarray(targets))
    rec = np.asarray(B.apply_deltas(jnp.asarray(anchors), deltas))
    np.testing.assert_allclose(rec, targets, atol=1e-3)


def test_anchors_shapes():
    a = np.asarray(B.generate_anchors(4, 6, 16))
    assert a.shape == (4 * 6 * 9, 4)
    # centers on the stride grid
    c0 = (a[0, :2] + a[0, 2:]) / 2
    np.testing.assert_allclose(c0, [8, 8], atol=1e-4)


def naive_bilinear(feat, y, x):
    h, w, c = feat.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    dy, dx = y - y0, x - x0
    out = np.zeros(c)
    for cy, cx, wt in [(y0, x0, (1 - dy) * (1 - dx)), (y0, x0 + 1, (1 - dy) * dx),
                       (y0 + 1, x0, dy * (1 - dx)), (y0 + 1, x0 + 1, dy * dx)]:
        if 0 <= cy < h and 0 <= cx < w:
            out += wt * feat[cy, cx]
    return out


def test_roi_align_matches_naive(rng):
    feat = rng.rand(12, 16, 3).astype(np.float32)
    boxes = np.asarray([[2.0, 3.0, 10.0, 9.0], [0.0, 0.0, 16.0, 12.0]], np.float32)
    out_size = 4
    got = np.asarray(B.roi_align(jnp.asarray(feat), jnp.asarray(boxes), out_size=out_size))
    for n, (x0b, y0b, x1b, y1b) in enumerate(boxes):
        bw, bh = x1b - x0b, y1b - y0b
        for i in range(out_size):
            for j in range(out_size):
                y = y0b + (i + 0.5) * bh / out_size - 0.5
                x = x0b + (j + 0.5) * bw / out_size - 0.5
                want = naive_bilinear(feat, y, x)
                np.testing.assert_allclose(got[n, i, j], want, atol=1e-4)


def test_roi_align_identity_box(rng):
    # a box covering the whole feature map at out_size == map size samples
    # exactly the pixel centers
    feat = rng.rand(8, 8, 2).astype(np.float32)
    boxes = np.asarray([[0.0, 0.0, 8.0, 8.0]], np.float32)
    got = np.asarray(B.roi_align(jnp.asarray(feat), jnp.asarray(boxes), out_size=8))
    np.testing.assert_allclose(got[0], feat, atol=1e-5)


def test_roi_align_deformable_offsets(rng):
    # constant offset of (0, +2px/bw normalized) shifts samples right by 2 px
    feat = rng.rand(16, 16, 2).astype(np.float32)
    box = np.asarray([[4.0, 4.0, 12.0, 12.0]], np.float32)
    base = np.asarray(B.roi_align(jnp.asarray(feat), jnp.asarray(box), out_size=4))
    off = np.zeros((1, 4, 4, 2), np.float32)
    off[..., 1] = 2.0 / 8.0  # dx normalized by box width 8 -> +2 px
    shifted_box = box + np.asarray([[2.0, 0.0, 2.0, 0.0]])
    want = np.asarray(B.roi_align(jnp.asarray(feat), jnp.asarray(shifted_box), out_size=4))
    got = np.asarray(B.roi_align(jnp.asarray(feat), jnp.asarray(box), out_size=4,
                                 offsets=jnp.asarray(off)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert not np.allclose(got, base)


def test_assign_fpn_levels():
    # detectron2 rule: level = floor(4 + log2(sqrt(area)/224)), clamp [2, 5]
    boxes = np.asarray([
        [0, 0, 32, 32],      # sqrt(area)=32  -> 4 + log2(32/224)  = 1.19 -> 2
        [0, 0, 112, 112],    # 112 -> 4 - 1 = 3
        [0, 0, 224, 224],    # 224 -> 4
        [0, 0, 448, 448],    # 448 -> 5
        [0, 0, 2000, 2000],  # huge -> clamp 5
    ], np.float32)
    got = np.asarray(B.assign_fpn_levels(jnp.asarray(boxes)))
    np.testing.assert_array_equal(got, [2, 3, 4, 5, 5])


def test_roi_align_multilevel_selects_assigned_level(rng):
    # build a pyramid where each level is a constant = its level index;
    # the pooled value then reveals which level each box was pooled from
    feats = {}
    strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32}
    for name, s in strides.items():
        lvl = int(name[1:])
        feats[name] = jnp.full((256 // s, 256 // s, 1), float(lvl), jnp.float32)
    boxes = jnp.asarray([
        [0, 0, 32, 32],    # level 2
        [0, 0, 224, 224],  # level 4
        [0, 0, 250, 250],  # level 5 (sqrt area 250 -> floor(4.16) = 4... )
    ], jnp.float32)
    got = np.asarray(B.roi_align_multilevel(feats, boxes, 4, strides))
    assert got.shape == (3, 4, 4, 1)
    lvl = np.asarray(B.assign_fpn_levels(boxes))
    for i in range(3):
        np.testing.assert_allclose(got[i], float(lvl[i]), atol=1e-5)
