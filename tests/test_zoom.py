"""Zoom-in crop/refine/paste op (shared by UCN and MSMFormer wrappers)."""

import numpy as np
import jax.numpy as jnp

from quber_tpu.ops.zoom import instance_boxes_from_labels, zoom_refine_labels


def _label_map():
    labels = np.zeros((64, 64), np.int32)
    labels[8:24, 8:24] = 1
    labels[36:56, 30:50] = 2
    return labels


def test_instance_boxes_from_labels():
    boxes, valid = instance_boxes_from_labels(jnp.asarray(_label_map()), 4)
    boxes, valid = np.asarray(boxes), np.asarray(valid)
    assert valid.tolist() == [True, True, False, False]
    # box 0 contains instance 0's extent (padded square)
    x0, y0, x1, y1 = boxes[0]
    assert x0 <= 8 and y0 <= 8 and x1 >= 23 and y1 >= 23
    assert abs((x1 - x0) - (y1 - y0)) < 1e-4  # square
    np.testing.assert_array_equal(boxes[2], 0)  # invalid slots zeroed


def test_zoom_refine_identity_keeps_labels():
    # a refiner that returns the instance's own crop mask leaves the map
    # unchanged (up to crop resampling) — exercised at exact pixel grid
    labels = _label_map()
    z = 32

    from quber_tpu.ops.boxes import roi_align

    def refine_one(box, ok, inst_id):
        crop = roi_align(
            (jnp.asarray(labels) == inst_id).astype(jnp.float32)[..., None],
            box[None], out_size=z,
        )[0, ..., 0]
        return (crop > 0.5).astype(jnp.float32) * ok

    out = np.asarray(zoom_refine_labels(jnp.asarray(labels), refine_one, 4, z))
    # identity refinement: large overlap with the original per instance
    for inst in (1, 2):
        a = labels == inst
        b = out == inst
        iou = (a & b).sum() / max((a | b).sum(), 1)
        assert iou > 0.85, (inst, iou)


def test_zoom_refine_shrinks_instance():
    # a refiner that returns an empty mask erases the instance
    labels = _label_map()

    def refine_none(box, ok, inst_id):
        return jnp.zeros((16, 16), jnp.float32)

    out = np.asarray(zoom_refine_labels(jnp.asarray(labels), refine_none, 4, 16))
    assert (out == 1).sum() == 0 and (out == 2).sum() == 0
