"""Tests for the standalone evaluator/converter CLIs:
panoptic2semantic, evaluate_pq, evaluate_boundary_ap
(reference: tools/ours/panoptic2semantic_segmentation.py,
tools/evaluate_pq_for_semantic_segmentation.py,
tools/evaluate_coco_boundary_ap.py).
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


# ---------------------------------------------------------------------------
# panoptic2semantic
# ---------------------------------------------------------------------------

def _tiny_panoptic(tmp_path):
    import imageio.v2 as imageio

    sys.path.insert(0, "/root/repo/tools")
    from detection2panoptic import id2rgb

    h, w = 40, 60
    pan = np.zeros((h, w), np.uint32)
    pan[5:15, 5:25] = 1   # category 1 (thing)
    pan[20:30, 5:25] = 2  # category 1 (thing), second instance
    pan[5:35, 40:55] = 3  # category 2 (stuff)
    png_dir = tmp_path / "pngs"
    png_dir.mkdir()
    imageio.imwrite(str(png_dir / "img0.png"), id2rgb(pan))
    coco = {
        "images": [{"id": 1, "file_name": "img0.png", "height": h, "width": w}],
        "annotations": [{
            "image_id": 1, "file_name": "img0.png",
            "segments_info": [
                {"id": 1, "category_id": 1, "iscrowd": 0},
                {"id": 2, "category_id": 1, "iscrowd": 0},
                {"id": 3, "category_id": 2, "iscrowd": 0},
            ],
        }],
        "categories": [
            {"id": 1, "name": "object", "isthing": 1},
            {"id": 2, "name": "table", "isthing": 0},
        ],
    }
    path = tmp_path / "panoptic.json"
    path.write_text(json.dumps(coco))
    return path, png_dir, pan


def test_panoptic2semantic_png(tmp_path):
    import imageio.v2 as imageio

    path, png_dir, pan = _tiny_panoptic(tmp_path)
    sem_dir = tmp_path / "semantic"
    run_tool("panoptic2semantic.py", "--json", str(path),
             "--panoptic-root", str(png_dir), "--semantic-dir", str(sem_dir))
    sem = np.asarray(imageio.imread(str(sem_dir / "img0.png")))
    # both category-1 instances fused into one semantic class
    assert set(np.unique(sem)) == {0, 1, 2}
    assert (sem[5:15, 5:25] == 1).all() and (sem[20:30, 5:25] == 1).all()
    assert (sem[5:35, 40:55] == 2).all()


def test_panoptic2semantic_json_things_other(tmp_path):
    from quber_tpu.data import rle

    path, png_dir, pan = _tiny_panoptic(tmp_path)
    out_json = tmp_path / "semantic.json"
    run_tool("panoptic2semantic.py", "--json", str(path),
             "--panoptic-root", str(png_dir), "--out-json", str(out_json),
             "--things-other")
    recs = json.loads(out_json.read_text())["annotations"]
    # thing instances collapse to OTHER (183); stuff keeps its id
    cats = sorted(r["category_id"] for r in recs)
    assert cats == [2, 183]
    other = next(r for r in recs if r["category_id"] == 183)
    mask = rle.decode(other["segmentation"])
    expect = ((pan == 1) | (pan == 2)).astype(np.uint8)
    assert (mask == expect).all()
    assert other["area"] == int(expect.sum())


# ---------------------------------------------------------------------------
# evaluate_pq
# ---------------------------------------------------------------------------

def test_pq_perfect_match():
    sys.path.insert(0, "/root/repo/tools")
    from evaluate_pq import aggregate, pq_stats_single_image

    gt = np.zeros((32, 32), np.uint8)
    gt[2:12, 2:12] = 1
    gt[16:28, 16:28] = 2
    results, mean = aggregate([pq_stats_single_image(gt, gt)])
    assert mean["pq"] == mean["sq"] == mean["rq"] == 1.0
    assert results[1]["tp"] == 1 and results[2]["tp"] == 1


def test_pq_partial_and_void():
    sys.path.insert(0, "/root/repo/tools")
    from evaluate_pq import aggregate, pq_stats_single_image

    gt = np.zeros((32, 32), np.uint8)
    gt[0:16, 0:32] = 1
    pred = np.zeros((32, 32), np.uint8)
    pred[0:12, 0:32] = 1  # IoU = 12/16 = 0.75 -> TP
    pred[20:32, 0:32] = 3  # spurious class -> FP for class 3
    results, mean = aggregate([pq_stats_single_image(gt, pred)])
    assert abs(results[1]["pq"] - 0.75) < 1e-9
    assert results[3]["fp"] == 1 and results[3]["pq"] == 0.0
    # class 0 (background) is a real segment here and matches partially
    assert 0 in results

    # a prediction mostly covering VOID is exempted from FP (ref :128-135)
    gt_v = np.full((32, 32), 255, np.uint8)
    gt_v[0:8, 0:8] = 1
    pred_v = np.zeros((32, 32), np.uint8)
    pred_v[:] = 255
    pred_v[0:8, 0:8] = 1
    pred_v[16:32, 0:32] = 7  # lies entirely on VOID
    results_v, _ = aggregate([pq_stats_single_image(gt_v, pred_v)])
    assert results_v[1]["tp"] == 1
    assert 7 not in results_v  # not counted as FP


def test_pq_iou_union_subtracts_void():
    """Union excludes the prediction's VOID overlap (ref :105)."""
    sys.path.insert(0, "/root/repo/tools")
    from evaluate_pq import pq_stats_single_image

    gt = np.full((10, 10), 255, np.uint8)
    gt[:, :4] = 1  # 40 px of class 1, 60 px VOID
    pred = np.ones((10, 10), np.uint8)  # predicts class 1 everywhere
    stats = pq_stats_single_image(gt, pred)
    # inter=40, union = 100 + 40 - 40 - 60(void overlap) = 40 -> IoU 1.0
    assert stats[1]["tp"] == 1 and abs(stats[1]["iou"] - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# evaluate_boundary_ap
# ---------------------------------------------------------------------------

def _square_mask(h, w, y0, x0, size):
    m = np.zeros((h, w), bool)
    m[y0:y0 + size, x0:x0 + size] = True
    return m


def _ap_jsons(tmp_path, shift):
    from quber_tpu.data import rle

    h, w = 80, 80
    gt_masks = [_square_mask(h, w, 10, 10, 30), _square_mask(h, w, 45, 45, 24)]
    images = [{"id": 1, "height": h, "width": w, "file_name": "x.png"}]
    gts = [{"id": i + 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
            "segmentation": rle.encode(m.astype(np.uint8)), "area": int(m.sum())}
           for i, m in enumerate(gt_masks)]
    dts = [{"image_id": 1, "category_id": 1, "score": 0.9 - 0.1 * i,
            "segmentation": rle.encode(np.roll(m, shift, axis=1).astype(np.uint8))}
           for i, m in enumerate(gt_masks)]
    gt_path = tmp_path / "gt.json"
    dt_path = tmp_path / "dt.json"
    gt_path.write_text(json.dumps(
        {"images": images, "annotations": gts,
         "categories": [{"id": 1, "name": "object"}]}))
    dt_path.write_text(json.dumps(dts))
    return gt_path, dt_path


def test_boundary_ap_perfect(tmp_path):
    gt_path, dt_path = _ap_jsons(tmp_path, shift=0)
    out = run_tool("evaluate_boundary_ap.py", "--gt-json", str(gt_path),
                   "--dt-json", str(dt_path))
    assert "Boundary AP (dilation_ratio=0.02): 100.00" in out


def test_boundary_ap_more_sensitive_than_mask(tmp_path):
    """A shifted mask keeps high mask IoU but loses boundary IoU faster
    (the Boundary IoU paper's motivating property)."""
    import re

    gt_path, dt_path = _ap_jsons(tmp_path, shift=5)
    out_b = run_tool("evaluate_boundary_ap.py", "--gt-json", str(gt_path),
                     "--dt-json", str(dt_path), "--iou-type", "boundary")
    out_m = run_tool("evaluate_boundary_ap.py", "--gt-json", str(gt_path),
                     "--dt-json", str(dt_path), "--iou-type", "segm")
    ap_b = float(re.search(r"AP \(.*\): ([\d.]+)", out_b).group(1))
    ap_m = float(re.search(r"AP \(.*\): ([\d.]+)", out_m).group(1))
    assert ap_b <= ap_m
    assert ap_m < 100.0  # shift hurts mask AP at high thresholds too


def test_ap_false_positive_lowers_score(tmp_path):
    from quber_tpu.data import rle

    gt_path, dt_path = _ap_jsons(tmp_path, shift=0)
    dts = json.loads(dt_path.read_text())
    # a confident FP in empty space
    fp = _square_mask(80, 80, 2, 50, 10)
    dts.insert(0, {"image_id": 1, "category_id": 1, "score": 0.95,
                   "segmentation": rle.encode(fp.astype(np.uint8))})
    dt_path.write_text(json.dumps(dts))
    out = run_tool("evaluate_boundary_ap.py", "--gt-json", str(gt_path),
                   "--dt-json", str(dt_path))
    import re

    ap = float(re.search(r"AP \(.*\): ([\d.]+)", out).group(1))
    assert ap < 100.0


def test_ap_crowd_is_ignored(tmp_path):
    """Detections matching a crowd GT are neither TP nor FP."""
    from quber_tpu.data import rle

    h, w = 60, 60
    crowd = _square_mask(h, w, 0, 0, 40)
    real = _square_mask(h, w, 45, 45, 12)
    images = [{"id": 1, "height": h, "width": w, "file_name": "x.png"}]
    gts = [
        {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 1,
         "segmentation": rle.encode(crowd.astype(np.uint8)), "area": int(crowd.sum())},
        {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
         "segmentation": rle.encode(real.astype(np.uint8)), "area": int(real.sum())},
    ]
    dts = [
        {"image_id": 1, "category_id": 1, "score": 0.9,
         "segmentation": rle.encode(crowd.astype(np.uint8))},
        {"image_id": 1, "category_id": 1, "score": 0.8,
         "segmentation": rle.encode(real.astype(np.uint8))},
    ]
    gt_path = tmp_path / "gt.json"
    dt_path = tmp_path / "dt.json"
    gt_path.write_text(json.dumps(
        {"images": images, "annotations": gts,
         "categories": [{"id": 1, "name": "object"}]}))
    dt_path.write_text(json.dumps(dts))
    out = run_tool("evaluate_boundary_ap.py", "--gt-json", str(gt_path),
                   "--dt-json", str(dt_path), "--iou-type", "segm")
    assert "Mask AP" in out and "100.00" in out
