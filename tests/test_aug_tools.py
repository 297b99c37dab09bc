"""Tests for the offline copy-paste augmentation and visualization CLIs
(reference: tools/ours/copy_and_paste_aug.py, vis_osd.py,
visualize_perturbate_masks.py).
"""

import json
import os
import subprocess
import sys

import numpy as np


def run_tool(script, *args):
    r = subprocess.run(
        [sys.executable, os.path.join("tools", script), *args],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def _coco_scene(tmp_path, rng):
    """Two images, two disc instances each, 16-bit mm depth."""
    import imageio.v2 as imageio

    from quber_tpu.data import rle

    h, w = 96, 128
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    images, annotations = [], []
    aid = 1
    ys, xs = np.mgrid[:h, :w]
    for i in range(2):
        rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        depth = np.full((h, w), 900, np.uint16)
        depth += (40 * ys / h).astype(np.uint16)
        masks = []
        for j, cx in enumerate((w // 4, 3 * w // 4)):  # disjoint discs
            cy = rng.randint(30, h - 30)
            r = rng.randint(12, 18)
            m = ((ys - cy) ** 2 + (xs - cx) ** 2 <= r * r)
            masks.append(m)
            depth[m] = 700 + 10 * j
        imageio.imwrite(str(img_root / f"rgb{i}.png"), rgb)
        imageio.imwrite(str(img_root / f"depth{i}.png"), depth)
        images.append({"id": i + 1, "file_name": f"rgb{i}.png",
                       "depth_file_name": f"depth{i}.png",
                       "height": h, "width": w})
        for m in masks:
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": 1, "iscrowd": 0,
                "segmentation": rle.encode(m.astype(np.uint8)),
                "area": int(m.sum()),
            })
            aid += 1
    path = tmp_path / "instances.json"
    path.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "object", "isthing": 1}],
    }))
    return path, img_root


def test_copy_paste_aug(tmp_path, rng):
    from quber_tpu.data import rle

    path, img_root = _coco_scene(tmp_path, rng)
    out_dir = tmp_path / "aug"
    out_json = tmp_path / "aug.json"
    run_tool("copy_paste_aug.py", "--json", str(path),
             "--image-root", str(img_root), "--out-dir", str(out_dir),
             "--out-json", str(out_json), "--variants", "2",
             "--min-paste", "2", "--max-paste", "4", "--seed", "3")
    out = json.loads(out_json.read_text())
    # 2 source images x 2 variants
    assert len(out["images"]) == 4
    by_image = {}
    for a in out["annotations"]:
        by_image.setdefault(a["image_id"], []).append(a)
    import imageio.v2 as imageio

    pasted_any = False
    for img in out["images"]:
        # written files exist, dtypes preserved
        rgb = np.asarray(imageio.imread(str(out_dir / img["file_name"])))
        depth = np.asarray(imageio.imread(str(out_dir / img["depth_file_name"])))
        assert rgb.shape == (96, 128, 3) and depth.dtype == np.uint16
        anns = by_image[img["id"]]
        masks = np.stack([rle.decode(a["segmentation"]) for a in anns])
        # masks stay disjoint after occlusion carving
        assert (masks.sum(0) <= 1).all()
        if len(anns) > 2:
            pasted_any = True
        for a in anns:
            assert a["area"] > 0 and a["bbox"] is not None
    # with 2-4 paste attempts per variant at least one paste must land
    assert pasted_any


def test_visualize_osd(tmp_path, rng):
    import imageio.v2 as imageio

    root = tmp_path / "osd"
    for sub in ("image_color", "disparity", "annotation"):
        (root / sub).mkdir(parents=True)
    h, w = 48, 64
    imageio.imwrite(str(root / "image_color" / "a.png"),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
    imageio.imwrite(str(root / "disparity" / "a.png"),
                    np.full((h, w), 800, np.uint16))
    anno = np.zeros((h, w), np.uint8)
    anno[10:30, 10:30] = 1
    imageio.imwrite(str(root / "annotation" / "a.png"), anno)
    out_dir = tmp_path / "vis"
    run_tool("visualize_dataset.py", "osd", "--root", str(root),
             "--out-dir", str(out_dir))
    tile = np.asarray(imageio.imread(str(out_dir / "a.png")))
    assert tile.shape == (h, 3 * w, 3)  # rgb | depth | overlay


def test_visualize_perturbed(tmp_path, rng):
    import imageio.v2 as imageio

    from quber_tpu.data import rle

    h, w = 48, 64
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    imageio.imwrite(str(img_root / "x.png"),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
    gt = np.zeros((h, w), np.uint8)
    gt[5:25, 5:25] = 1
    pert = np.zeros((h, w), np.uint8)
    pert[8:28, 8:28] = 1
    coco = {
        "images": [{"id": 1, "file_name": "x.png", "height": h, "width": w,
                    "perturbed_segmentation": [rle.encode(pert)]}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "iscrowd": 0, "segmentation": rle.encode(gt)}],
    }
    path = tmp_path / "perturbed.json"
    path.write_text(json.dumps(coco))
    out_dir = tmp_path / "vis"
    run_tool("visualize_dataset.py", "perturbed", "--json", str(path),
             "--image-root", str(img_root), "--out-dir", str(out_dir))
    tile = np.asarray(imageio.imread(str(out_dir / "x.png")))
    assert tile.shape == (h, 2 * w, 3)  # gt | perturbed
