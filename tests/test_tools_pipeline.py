"""Full offline data-generation pipeline integration test:
detection JSON -> panoptic PNGs -> perturbation -> EEE maps -> mapper sample.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture
def detection_json(tmp_path, rng, blobs):
    import cv2

    h, w = 96, 128
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 1
    from quber_tpu.data import rle

    for i in range(2):
        name = f"img{i}.png"
        cv2.imwrite(str(img_dir / name), (rng.rand(h, w, 3) * 255).astype(np.uint8))
        # 16-bit depth alongside (for the mapper)
        cv2.imwrite(str(img_dir / f"depth{i}.png"),
                    rng.uniform(3000, 12000, (h, w)).astype(np.uint16))
        images.append({"id": i + 1, "file_name": name, "height": h, "width": w,
                       "depth_file_name": f"depth{i}.png"})
        for m in blobs(rng, 3, h, w, min_r=10, max_r=22):
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": 1,
                "iscrowd": 0, "segmentation": rle.encode(m),
            })
            aid += 1
    path = tmp_path / "instances.json"
    path.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "object", "isthing": 1}],
    }))
    return tmp_path


def run_tool(script, *args):
    r = subprocess.run(
        [sys.executable, os.path.join("tools", script), *args],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_full_data_generation_pipeline(detection_json):
    root = detection_json
    run_tool("detection2panoptic.py", "--json", str(root / "instances.json"),
             "--out-json", str(root / "panoptic.json"),
             "--out-dir", str(root / "panoptic_pngs"))
    run_tool("perturbate_masks.py", "--json", str(root / "panoptic.json"),
             "--panoptic-root", str(root / "panoptic_pngs"),
             "--out", str(root / "panoptic_perturbed.json"),
             "--iou-low", "0.6", "--iou-high", "0.9")
    run_tool("panoptic2eee.py", "--json", str(root / "panoptic_perturbed.json"),
             "--panoptic-root", str(root / "panoptic_pngs"))

    with open(root / "panoptic_perturbed.json") as f:
        coco = json.load(f)
    for img in coco["images"]:
        assert len(img["perturbed_segmentation"]) >= 2
        for key in ["tp_mask", "fn_boundary", "fp_mask", "tn_boundary"]:
            assert key in img

    # the generated dataset loads through the registry + mapper
    import dataclasses

    from quber_tpu.config import TrainConfig
    from quber_tpu.data.datasets import load_perturbed_panoptic_json
    from quber_tpu.data.mappers import PerturbedPanopticMapper
    from quber_tpu.models.mask_refiner import MaskRefinerConfig

    records = load_perturbed_panoptic_json(
        str(root / "panoptic_perturbed.json"), str(root / "images"),
        str(root / "panoptic_pngs"),
    )
    assert len(records) == 2
    model_cfg = MaskRefinerConfig(height=96, width=128)
    train_cfg = TrainConfig(perlin_distortion=False)
    mapper = PerturbedPanopticMapper(train_cfg, model_cfg, is_train=True)
    sample = mapper(records[0])
    assert sample["image"].shape == (96, 128, 6)
    assert sample["offset_enc"].shape == (96, 128, 3)
    assert sample["eee_mask"].shape == (96, 128, 2)
    assert sample["sem_seg"].max() == 1.0
    # stored EEE RLEs decode into a valid partition
    total = sample["eee_mask"].sum(-1)
    np.testing.assert_array_equal(total, np.ones_like(total))


def test_preprocess_bop_and_tod(tmp_path, rng, blobs):
    import cv2
    import imageio.v2 as imageio

    # BOP-style scene tree
    scene = tmp_path / "raw" / "000001"
    for sub in ["rgb", "depth", "mask_visib"]:
        (scene / sub).mkdir(parents=True)
    cv2.imwrite(str(scene / "rgb" / "000000.png"), (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    cv2.imwrite(str(scene / "depth" / "000000.png"), rng.uniform(500, 1500, (48, 64)).astype(np.uint16))
    for i, m in enumerate(blobs(rng, 2, 48, 64, min_r=6, max_r=12)):
        cv2.imwrite(str(scene / "mask_visib" / f"000000_{i:06d}.png"), m * 255)
    run_tool("preprocess_datasets.py", "hope", "--root", str(tmp_path / "raw"),
             "--out", str(tmp_path / "flat"))
    anno = imageio.imread(str(tmp_path / "flat" / "annotation" / "000001_000000.png"))
    assert set(np.unique(anno)) >= {0, 1}

    # TOD-style tree
    tod = tmp_path / "tod" / "scene_0"
    tod.mkdir(parents=True)
    label = np.zeros((48, 64), np.uint8)
    label[5:20, 5:20] = 2
    label[25:40, 30:50] = 3
    cv2.imwrite(str(tod / "segmentation_00000.png"), label)
    run_tool("preprocess_datasets.py", "tod", "--root", str(tmp_path / "tod"),
             "--out", str(tmp_path / "tod.json"))
    with open(tmp_path / "tod.json") as f:
        coco = json.load(f)
    assert len(coco["images"]) == 1 and len(coco["annotations"]) == 2
