"""End-to-end smokes of the round-3 train_zoo recipes: each new trainer
(cascadepsp, samhq, detic, gsam) must run its FULL CLI path — scene pool,
jitted step, checkpoint + sidecar files — for a few tiny iterations, and
the written checkpoint must load back through the eval wrapper's env-var
seam. Subprocess-based with --cpu (the in-repo TPU may be busy training)."""

import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tmp_path, model, extra=()):
    out = tmp_path / f"{model}_out"
    r = subprocess.run(
        [sys.executable, "tools/train_zoo.py", "--model", model, "--cpu",
         "--size", "4", "--height", "96", "--width", "128",
         "--max-iter", "3", "--log-period", "1", "--checkpoint-period", "3",
         "--lr", "1e-4", "--output-dir", str(out), *extra],
        capture_output=True, text=True, cwd=_ROOT, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert os.path.isdir(str(out / "ckpt"))
    return out


def test_cascadepsp_recipe_smoke(tmp_path):
    out = _run(tmp_path, "cascadepsp")
    from quber_tpu.train.checkpoint import restore_params

    v = restore_params(str(out / "ckpt"))
    assert "params" in v


def test_samhq_recipe_smoke(tmp_path):
    out = _run(tmp_path, "samhq")
    arch = json.loads((out / "arch.json").read_text())
    assert arch["img_size"] % 4 == 0
    from quber_tpu.train.checkpoint import restore_params

    v = restore_params(str(out / "ckpt"))
    assert "params" in v


def test_detic_recipe_smoke(tmp_path):
    out = _run(tmp_path, "detic")
    vocab = json.loads((out / "vocab.json").read_text())
    assert len(vocab) == 7
    from quber_tpu.train.checkpoint import restore_params

    tree = restore_params(str(out / "ckpt"))
    assert set(tree) == {"text", "detector"}


def test_gsam_recipe_smoke(tmp_path):
    out = _run(tmp_path, "gsam")
    arch = json.loads((out / "arch.json").read_text())
    assert arch["img_size"] % 4 == 0
    from quber_tpu.train.checkpoint import restore_params

    tree = restore_params(str(out / "ckpt"))
    assert set(tree) == {"text", "grounder", "sam"}
