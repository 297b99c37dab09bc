"""End-to-end pin of the one-command parity drill (tools/parity_drill.py):
a FULL-SCALE synthetic torch state dict (the exact detectron2 key/byte
layout a real reference checkpoint presents, exported from a fresh flax
init) must survive import -> activation parity -> harness eval and yield
an ok report. This keeps the reference-parity seam drill-ready for the
day real weights arrive (VERDICT r2 item 7)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import torch

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_drill_end_to_end(tmp_path):
    from quber_tpu.config import load_config
    from quber_tpu.models import MaskRefiner
    from quber_tpu.models.import_torch import export_mask_refiner

    # full-scale flagship state dict: param shapes are input-size
    # independent, so a 64x64 init carries the real checkpoint layout
    cfg, _ = load_config(os.path.join(
        _ROOT, "configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml"))
    model = MaskRefiner(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 6)),
                           jnp.zeros((1, 64, 64, 3)))
    sd = {k: torch.from_numpy(v) for k, v in
          export_mask_refiner(variables, cfg).items()}
    ckpt = tmp_path / "model_final.pth"
    torch.save(sd, str(ckpt))

    out = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, "tools/parity_drill.py", "--torch", str(ckpt),
         "--cpu", "--parity-size", "64", "64", "--eval-size", "120", "160",
         "--synthetic-n", "2", "--limit", "2",
         "--workdir", str(tmp_path / "work"), "--out", str(out)],
        capture_output=True, text=True, cwd=_ROOT,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    report = json.loads(out.read_text())
    assert report["ok"]
    assert report["parity"]["n_mismatched"] == 0
    assert report["parity"]["n_stages"] >= 20
    assert report["import"]["n_params"] > 50_000_000  # full-scale flagship
    # the eval leg produced real Hungarian-matched metrics on both stages
    for stage in ("initial", "refined"):
        f = report["eval"][stage]["Objects F-measure"]
        assert 0.0 < f <= 100.0
