"""Armbench instance-eval entry point (tools/run_eval_armbench.py): COCO
instance JSON walk with a category filter, RGB-only refine (no depth, the
armbench convention), npy replay, metrics + CSV row (reference
eval/run_eval_armbench.py semantics, with the aggregation it lacks)."""

import csv
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def armbench_coco(tmp_path_factory):
    """Tiny mix-object-tote-style COCO tree: 3 images, category 2 objects
    plus a category-1 (tote) annotation that the filter must drop."""
    import imageio.v2 as imageio

    from quber_tpu.data import rle
    from quber_tpu.data.synthetic import render_scene

    tmp = tmp_path_factory.mktemp("armbench")
    img_root = tmp / "images"
    os.makedirs(img_root)
    rng = np.random.RandomState(11)
    h, w = 60, 80
    images, anns = [], []
    aid = 1
    for i in range(3):
        rgb, _depth, masks = render_scene(rng, h, w, (250.0, 1500.0))
        name = f"tote_{i:03d}.png"
        imageio.imwrite(img_root / name, rgb)
        images.append({"id": i + 1, "file_name": name, "height": h, "width": w})
        # category-1 distractor covering the frame (the tote itself)
        anns.append({"id": aid, "image_id": i + 1, "category_id": 1,
                     "segmentation": rle.encode(np.ones((h, w), np.uint8))})
        aid += 1
        for m in masks:
            anns.append({"id": aid, "image_id": i + 1, "category_id": 2,
                         "segmentation": rle.encode((m > 0).astype(np.uint8))})
            aid += 1
    coco = {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "Tote"}, {"id": 2, "name": "Object"}]}
    json_path = tmp / "test.json"
    json_path.write_text(json.dumps(coco))
    return str(json_path), str(img_root), (h, w)


def _small_cfg(tmp_path):
    cfg = tmp_path / "rgb_small.yaml"
    cfg.write_text(
        "_BASE_: " + os.path.abspath("configs/mask_refiner_rgb_only.yaml")
        + "\nmodel:\n  height: 60\n  width: 80\n"
    )
    return str(cfg)


def test_armbench_perturbed_gt(armbench_coco, tmp_path):
    import run_eval_armbench as tool

    json_path, img_root, _ = armbench_coco
    csv_path = tmp_path / "arm.csv"
    old_argv = sys.argv
    sys.argv = ["x", "--json", json_path, "--image-root", img_root,
                "--config-file", _small_cfg(tmp_path),
                "--csv", str(csv_path), "--visualize",
                "--vis-dir", str(tmp_path / "vis")]
    try:
        tool.main()
    finally:
        sys.argv = old_argv
    rows = list(csv.DictReader(open(csv_path)))
    assert [r["stage"] for r in rows] == ["initial", "refined"]
    assert rows[0]["dataset"] == "armbench" and rows[0]["n_images"] == "3"
    # category filter dropped the frame-covering tote: initial masks come
    # from perturbed category-2 GT, so initial Objects F is high, not ~0
    assert float(rows[0]["Objects F-measure"]) > 0.5
    assert (tmp_path / "vis" / "tote_000.jpg").exists()


def test_armbench_npy_replay(armbench_coco, tmp_path):
    import run_eval_armbench as tool

    from quber_tpu.data import rle

    json_path, img_root, (h, w) = armbench_coco
    # replay folder: exact GT masks -> initial metrics must be perfect
    coco = json.loads(open(json_path).read())
    npy_dir = tmp_path / "npy"
    os.makedirs(npy_dir)
    for im in coco["images"]:
        gts = [rle.decode(a["segmentation"]) for a in coco["annotations"]
               if a["image_id"] == im["id"] and a["category_id"] == 2]
        np.save(npy_dir / (os.path.splitext(im["file_name"])[0] + ".npy"),
                np.stack(gts).astype(np.uint8))
    csv_path = tmp_path / "arm2.csv"
    old_argv = sys.argv
    sys.argv = ["x", "--json", json_path, "--image-root", img_root,
                "--npy-folder", str(npy_dir),
                "--config-file", _small_cfg(tmp_path), "--csv", str(csv_path)]
    try:
        tool.main()
    finally:
        sys.argv = old_argv
    rows = list(csv.DictReader(open(csv_path)))
    assert float(rows[0]["Objects F-measure"]) > 0.999  # GT replay
