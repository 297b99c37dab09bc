"""Synthetic renderer invariants: the hardened (round-3) shape vocabulary.

The renderer stands in for UOAIS-Sim (register_uoais_sim_panoptic.py:30-61);
these tests pin the distribution properties the refiner trains against —
occlusion semantics, depth-step boundaries, and the concave/hole/thin
silhouettes + non-boundary texture edges added for round 3.
"""

import numpy as np
import pytest

from quber_tpu.data.synthetic import render_scene, synthetic_records


def _scene_stats(shapes, n=12, seed=7, h=240, w=320):
    # measure on AMODAL masks (pre-occlusion silhouettes): occlusion carves
    # concavities into visible masks even for convex shapes, which would
    # drown the intrinsic-shape signal this test pins
    import cv2

    rng = np.random.RandomState(seed)
    out = {"deficiency": [], "holes": 0, "objs": 0}
    for _ in range(n):
        rgb, depth, masks, amodal = render_scene(
            rng, h, w, (250.0, 1500.0), shapes=shapes, return_amodal=True)
        assert rgb.dtype == np.uint8 and rgb.shape == (h, w, 3)
        assert depth.dtype == np.float32 and depth.shape == (h, w)
        for m in amodal:
            cnts, hier = cv2.findContours(m, cv2.RETR_CCOMP,
                                          cv2.CHAIN_APPROX_SIMPLE)
            if not cnts:
                continue
            pts = np.concatenate([c.reshape(-1, 2) for c in cnts])
            hull_area = cv2.contourArea(cv2.convexHull(pts))
            out["deficiency"].append(1 - m.sum() / max(hull_area, 1))
            if hier is not None and (hier[0][:, 3] >= 0).any():
                out["holes"] += 1
            out["objs"] += 1
    return out


def test_visible_masks_disjoint_and_depth_step():
    rng = np.random.RandomState(0)
    rgb, depth, masks = render_scene(rng, 240, 320, (250.0, 1500.0))
    stack = masks.astype(np.int32)
    assert (stack.sum(0) <= 1).all()  # visible regions are disjoint
    # objects are nearer than the table (the refinement cue): compare each
    # object's median depth to the scene background median
    bg = depth[stack.sum(0) == 0]
    for m in masks:
        assert np.median(depth[m > 0]) < np.median(bg)


def test_amodal_superset_of_visible():
    rng = np.random.RandomState(1)
    _, _, vis, amo = render_scene(rng, 240, 320, (250.0, 1500.0),
                                  return_amodal=True)
    assert vis.shape == amo.shape
    for v, a in zip(vis, amo):
        assert (a >= v).all()  # amodal includes the occluded part


def test_mixed_distribution_is_harder_than_convex():
    convex = _scene_stats("convex")
    mixed = _scene_stats("mixed")
    # holes exist in the mixed vocabulary and (practically) not in convex
    assert mixed["holes"] >= 3
    assert convex["holes"] <= mixed["holes"] // 3 + 1
    # concavity (hull deficiency) increases distribution-wide
    assert np.mean(mixed["deficiency"]) > np.mean(convex["deficiency"])


def test_concave_stress_set():
    concave = _scene_stats("concave")
    assert concave["holes"] >= 3
    assert np.mean(np.asarray(concave["deficiency"]) > 0.1) > 0.15


def test_textured_background_has_nonboundary_edges():
    # a striped/checkered table produces strong color edges outside every
    # object mask; convex (legacy) tables carry only per-pixel noise, whose
    # horizontal gradient never reaches texture contrast. Count strong edges
    # whose BOTH pixels are background (one-sided masking would leak true
    # object-boundary edges into the statistic).
    def strong_bg_edges(shapes):
        rng = np.random.RandomState(11)
        count = 0
        for _ in range(8):
            rgb, _, masks = render_scene(rng, 120, 160, (250.0, 1500.0),
                                         shapes=shapes)
            g = np.abs(np.diff(rgb.astype(np.int32), axis=1)).sum(-1)
            bg = masks.sum(0) == 0
            count += int((g[bg[:, 1:] & bg[:, :-1]] > 120).sum())
        return count

    assert strong_bg_edges("convex") == 0
    assert strong_bg_edges("mixed") >= 10


def test_n_objects_and_determinism():
    r1, r2 = np.random.RandomState(5), np.random.RandomState(5)
    a = render_scene(r1, 120, 160, n_objects=4)
    b = render_scene(r2, 120, 160, n_objects=4)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[2], b[2])
    assert len(a[2]) <= 4


def test_records_roundtrip():
    recs = synthetic_records(2, 64, 64, seed=3, shapes="concave")
    assert len(recs) == 2
    for rec in recs:
        assert rec["gt_masks"].shape[1:] == (64, 64)
        assert len(rec["perturbed_segmentation"]) >= 1


@pytest.mark.parametrize("shapes", ["convex", "mixed", "concave"])
def test_degenerate_scene_fallback(shapes):
    # tiny canvas: objects may all be occluded/cut away; the renderer must
    # still return at least one mask
    rng = np.random.RandomState(2)
    for _ in range(5):
        _, _, masks = render_scene(rng, 48, 48, n_objects=1, shapes=shapes)
        assert len(masks) >= 1
