"""The activation-parity harness doubles as the MaskRefiner oracle test:
every stage of the flax model must match a plain-torch re-execution of the
reference layer semantics (SURVEY §7 step 2 / hard part 5)."""

import json
import os
import subprocess
import sys


def test_activation_parity_all_stages(tmp_path):
    out = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, "tools/activation_parity.py", "--random",
         "--height", "64", "--width", "64", "--out", str(out)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    report = json.loads(out.read_text())
    assert report["n_mismatched"] == 0, report["stages"]
    assert report["n_stages"] >= 20
