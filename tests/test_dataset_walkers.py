"""All five benchmark dataset walkers driven end to end on synthetic layout
twins (tools/make_synthetic_dataset.py --layout ...): the OCID three-level
tree walk + background-label zeroing, WISDOM test_indices.npy indexing +
npy meter depth, HOPE/DoPose flat trees (reference eval_utils.py:107-224,
242-250)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import make_synthetic_dataset as mk  # noqa: E402

from quber_tpu.evaluation.datasets import build_file_lists, load_annotation


def _make(tmp, layout, n, **kw):
    argv = ["--out", str(tmp / layout), "--layout", layout, "--n", str(n),
            "--height", "60", "--width", "80", "--seed", "5"]
    mk.main(argv)
    return str(tmp / layout)


@pytest.fixture(scope="module")
def twins(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("twins")
    return {
        "OCID": _make(tmp, "ocid", 36),
        "WISDOM": _make(tmp, "wisdom", 8),
        "HOPE": _make(tmp, "hope", 4),
        "DoPose": _make(tmp, "dopose", 4),
    }


def test_ocid_tree_walk(twins):
    rgb, depth, anno = build_file_lists("OCID", twins["OCID"])
    assert len(rgb) == len(depth) == len(anno) == 36
    # every ARID20/YCB10/ARID10 subtree contributed, through its seq dir
    assert {"ARID20", "YCB10", "ARID10"} <= {s for p in rgb for s in p.split(os.sep)}
    for r, d, a in zip(rgb, depth, anno):
        assert os.path.basename(r) == os.path.basename(d) == os.path.basename(a)
        assert f"{os.sep}rgb{os.sep}" in r and f"{os.sep}depth{os.sep}" in d \
            and f"{os.sep}label{os.sep}" in a
        assert os.path.exists(r) and os.path.exists(d) and os.path.exists(a)


def test_ocid_label_zeroing(twins):
    """OCID annotations label the support planes (floor=1, table=2);
    load_annotation must zero them or the planes evaluate as objects."""
    rgb, _, anno = build_file_lists("OCID", twins["OCID"])
    import imageio.v2 as imageio

    checked = {"floor": 0, "table": 0}
    for r, a in zip(rgb, anno):
        key = "floor" if "floor" in r else "table"
        raw = np.asarray(imageio.imread(a))
        out = load_annotation(a, "OCID", r)
        bg = [1] if key == "floor" else [1, 2]
        assert any((raw == b).any() for b in bg), "twin must paint the planes"
        for b in bg:
            assert not (out == b).any()
        assert out.max() > 0, "objects must survive the zeroing"
        # surviving ids are exactly the shifted instance ids
        lo = 2 if key == "floor" else 3
        assert out[out > 0].min() >= lo
        checked[key] += 1
    assert checked["floor"] and checked["table"]


def test_wisdom_indexing_and_depth(twins):
    root = twins["WISDOM"]
    idx = np.load(os.path.join(root, "test_indices.npy"))
    rgb, depth, anno = build_file_lists("WISDOM", root)
    assert len(rgb) == len(idx) == 8
    # distractor (non-test) frames exist on disk but are not walked
    total = len(os.listdir(os.path.join(root, "color_ims")))
    assert total > len(idx)
    for i, (r, d, a) in enumerate(zip(rgb, depth, anno)):
        assert os.path.basename(r) == f"image_{idx[i]:06d}.png"
        assert d.endswith(f"image_{idx[i]:06d}.npy")
        assert os.path.exists(r) and os.path.exists(d) and os.path.exists(a)
        dm = np.load(d)
        assert dm.dtype == np.float32 and 0.0 <= dm.max() <= 2.0  # meters


@pytest.mark.parametrize("name", ["HOPE", "DoPose"])
def test_flat_walkers(twins, name):
    rgb, depth, anno = build_file_lists(name, twins[name])
    assert len(rgb) == len(depth) == len(anno) == 4
    for r, d, a in zip(rgb, depth, anno):
        assert f"{os.sep}rgb{os.sep}" in r and f"{os.sep}depth{os.sep}" in d \
            and f"{os.sep}annotation{os.sep}" in a


@pytest.mark.parametrize("name", ["OCID", "WISDOM", "HOPE", "DoPose"])
def test_harness_smoke_every_walker(twins, name, tmp_path):
    """run_eval produces a metrics row through each walker: GT base +
    identity refiner must score (near-)perfect, which pins annotation
    loading, path derivation (incl. WISDOM's color_ims -> modal_segmasks
    and npy depth), and the OCID zeroing inside the full harness loop."""
    from quber_tpu.evaluation.harness import run_eval

    res = run_eval(
        base_model="gt", refiner_model="identity", test_dataset=name,
        dataset_path=twins[name], limit=3,
        csv_path=str(tmp_path / "out.csv"), tag=f"walker-smoke-{name}",
    )
    for stage in ("initial", "refined"):
        f = res[stage]["Objects F-measure"]
        assert f > 0.999, (name, stage, f)
    import csv

    with open(tmp_path / "out.csv") as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2 and rows[0]["dataset"] == name
    assert rows[0]["tag"] == f"walker-smoke-{name}"
