"""Eval-harness mechanics on a synthetic OSD-layout dataset (CPU)."""

import os

import numpy as np
import pytest

from quber_tpu.evaluation.harness import aggregate, masks_to_label_image, run_eval


@pytest.fixture
def osd_dir(tmp_path, rng, blobs):
    import cv2

    root = tmp_path / "osd"
    for sub in ["image_color", "disparity", "annotation"]:
        (root / sub).mkdir(parents=True)
    for i in range(3):
        rgb = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        depth = rng.uniform(400, 1400, (480, 640)).astype(np.uint16)
        masks = blobs(rng, 3, 480, 640, min_r=40, max_r=70)
        anno = masks_to_label_image(masks, np.zeros((480, 640), np.uint8))
        cv2.imwrite(str(root / "image_color" / f"img{i}.png"), rgb)
        cv2.imwrite(str(root / "disparity" / f"img{i}.png"), depth)
        cv2.imwrite(str(root / "annotation" / f"img{i}.png"), anno.astype(np.uint8))
    return str(root)


def test_gt_identity_is_perfect(osd_dir, tmp_path):
    results = run_eval(
        base_model="gt",
        refiner_model="identity",
        test_dataset="OSD",
        dataset_path=osd_dir,
        csv_path=str(tmp_path / "out.csv"),
    )
    for stage in ["initial", "refined"]:
        assert results[stage]["Objects F-measure"] == 1.0
        assert results[stage]["Boundary F-measure"] == 1.0
    assert os.path.exists(tmp_path / "out.csv")


def test_perturbed_gt_identity_degrades(osd_dir, tmp_path):
    results = run_eval(
        base_model="perturbed-gt",
        refiner_model="identity",
        test_dataset="OSD",
        dataset_path=osd_dir,
        csv_path=str(tmp_path / "out.csv"),
    )
    assert results["initial"]["Objects F-measure"] < 1.0
    assert results["initial"]["Objects F-measure"] > 0.3


def test_empty_base(osd_dir, tmp_path):
    results = run_eval(
        base_model="empty",
        refiner_model="identity",
        test_dataset="OSD",
        dataset_path=osd_dir,
        csv_path=str(tmp_path / "out.csv"),
    )
    assert results["initial"]["Objects F-measure"] == 0.0
    assert results["initial"]["Objects Precision"] == 1.0  # all-FN edge case


def test_timing_artifact_guard(osd_dir, tmp_path):
    """A multi-frame run writes time_<ds>.json (with n) next to the CSV; a
    subsequent <=1-timed-frame smoke run must not clobber it (round-2
    regression: smoke runs zeroed the committed artifact)."""
    import json

    csv = str(tmp_path / "out.csv")
    run_eval(base_model="gt", refiner_model="identity", test_dataset="OSD",
             dataset_path=osd_dir, csv_path=csv)
    path = tmp_path / "time_OSD.json"
    art = json.loads(path.read_text())
    assert art["n"] == 2  # 3 frames, first timed frame dropped as warmup
    path.write_text(json.dumps({"average": 0.5, "std": 0.1, "n": 99}))
    run_eval(base_model="gt", refiner_model="identity", test_dataset="OSD",
             dataset_path=osd_dir, csv_path=csv, limit=1)
    art = json.loads(path.read_text())
    assert art["n"] == 99 and art["average"] == 0.5


def test_aggregate_skips_missing():
    agg = aggregate([{"a": 1.0, "b": None}, {"a": 3.0, "b": 2.0}])
    assert agg["a"] == 2.0 and agg["b"] == 2.0


def test_save_mode_dumps_npy(osd_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run_eval(
        base_model="gt",
        refiner_model="save",
        test_dataset="OSD",
        dataset_path=osd_dir,
        csv_path=str(tmp_path / "out.csv"),
    )
    dumped = list((tmp_path / "segfix" / "OSD" / "initial_mask_predict").glob("*.npy"))
    assert len(dumped) == 3
    arr = np.load(dumped[0])
    assert arr.ndim == 3 and arr.max() == 255


def test_streamed_refine_matches_per_image(osd_dir, tmp_path, monkeypatch, rng):
    # predict_stream must reproduce per-image predict() exactly (tiny config;
    # the eval resolution is monkeypatched down to keep the CPU forward cheap)
    import quber_tpu.evaluation.refiner_models as rm
    from quber_tpu.models.mask_refiner import MaskRefinerConfig

    monkeypatch.setattr(rm, "EVAL_H", 64)
    monkeypatch.setattr(rm, "EVAL_W", 64)
    cfg = MaskRefinerConfig(height=64, width=64, use_pallas_grouping=False)
    refiner = rm.QuBERRefiner(cfg, dataset="OSD", max_instances=8,
                              use_fg_filter=False)

    import cv2

    from tests.conftest import random_blobs

    items = []
    for i in range(3):
        rgb_p = str(tmp_path / f"r{i}.png")
        dep_p = str(tmp_path / f"d{i}.png")
        cv2.imwrite(rgb_p, (rng.rand(64, 64, 3) * 255).astype(np.uint8))
        cv2.imwrite(dep_p, rng.uniform(400, 1400, (64, 64)).astype(np.uint16))
        masks = random_blobs(rng, 2, 64, 64, min_r=6, max_r=12)
        items.append((rgb_p, dep_p, list(masks), None))

    per_image = [refiner.predict(r, d, m, f) for r, d, m, f in items]
    streamed = list(refiner.predict_stream(items, batch_size=2))
    assert len(streamed) == 3
    for (m1, o1, _t, _f1), (m2, o2, _f2) in zip(per_image, streamed):
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(o1["panoptic"], o2["panoptic"])
