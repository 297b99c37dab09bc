"""Run every base segmenter and refiner baseline once on the current device.

Smoke + timing for the model zoo (random weights): catches backend-specific
compile/runtime breakage that CPU tests can't see, and records per-model
predict latency. Writes one JSON artifact and prints a table.

    python tools/bench_zoo.py [--out zoo_bench.json] [--iters 3]
          [--models ucn,msmformer,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_scene(rng, h=480, w=640, n=6):
    import numpy as np

    ys, xs = np.mgrid[:h, :w]
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    depth16 = rng.uniform(400, 1400, (h, w)).astype(np.uint16)
    masks = []
    for _ in range(n):
        cy, cx = rng.randint(60, h - 60), rng.randint(60, w - 60)
        r = rng.randint(25, 55)
        masks.append(((ys - cy) ** 2 + (xs - cx) ** 2 <= r * r))
    return rgb, depth16, masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="zoo_bench.json")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--models", default=None,
                    help="comma-separated subset (default: all)")
    args = ap.parse_args()

    import cv2
    import numpy as np

    import jax

    from quber_tpu.evaluation.base_models import build_base_model
    from quber_tpu.evaluation.refiner_models import build_refiner_model
    from quber_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(7)
    rgb, depth16, masks = synth_scene(rng)
    # OSD directory layout so the GT / perturbed-gt models find an annotation
    tmp = tempfile.mkdtemp()
    for sub in ("image_color", "disparity", "annotation"):
        os.makedirs(os.path.join(tmp, sub))
    rgb_path = os.path.join(tmp, "image_color", "scene.png")
    depth_path = os.path.join(tmp, "disparity", "scene.png")
    anno = __import__("numpy").zeros(rgb.shape[:2], dtype="uint8")
    for i, m in enumerate(masks):
        anno[m] = i + 1
    cv2.imwrite(rgb_path, rgb)
    cv2.imwrite(depth_path, depth16)
    cv2.imwrite(os.path.join(tmp, "annotation", "scene.png"), anno)

    base_names = ["gt", "perturbed-gt", "ucn", "ucn-zoomin", "msmformer",
                  "msmformer-zoomin", "uoisnet3d", "uoaisnet",
                  "uoaisnet-amodal", "uoaisnet-pretrained", "sam", "sam-depth"]
    refiner_names = ["maskrefiner-nofilter", "identity", "cascadepsp",
                     "rice", "sam", "hq-sam"]
    # not in the default sweep (ViT-H is ~10x the compute of the rest of the
    # zoo; maskrefiner/cascadepsp-rgbd duplicate their default-list siblings)
    # but selectable explicitly via --models for targeted timing runs.
    # NOTE: timing runs build each model at random init (params=None) — the
    # "-pretrained" suffix selects the architecture variant, not fine-tuned
    # weights; latency is weight-independent, so the numbers stand, but do
    # not read them as quality measurements.
    extra_refiners = ["hq-sam-pretrained", "cascadepsp-rgbd", "maskrefiner"]
    if args.models:
        chosen = set(args.models.split(","))
        base_names = [n for n in base_names if n in chosen]
        refiner_names = [n for n in refiner_names + extra_refiners
                         if n in chosen]

    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0]), "models": {}}

    def record(kind, name, fn):
        entry = {"kind": kind}
        try:
            t0 = time.time()
            out = fn()  # build + first predict (compile)
            entry["first_s"] = round(time.time() - t0, 2)
            ts = []
            for _ in range(args.iters):
                t0 = time.time()
                out = fn(reuse=True)
                ts.append(time.time() - t0)
            entry["median_s"] = round(sorted(ts)[len(ts) // 2], 4)
            entry["n_masks"] = int(out)
            entry["ok"] = True
        except Exception as e:
            entry["ok"] = False
            entry["error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc(limit=3)
        results["models"][name] = entry
        status = "ok" if entry.get("ok") else "FAIL"
        print(f"  {name:22s} {status:5s} first={entry.get('first_s', '-'):>7}s "
              f"median={entry.get('median_s', '-'):>8}s "
              f"masks={entry.get('n_masks', '-')}", flush=True)

    print("== base segmenters ==", flush=True)
    for name in base_names:
        holder = {}

        def fn(reuse=False, name=name, holder=holder):
            if not reuse or "m" not in holder:
                holder["m"] = build_base_model(name, "OSD")
            pred_masks, fg, _t = holder["m"].predict(rgb_path, depth_path)
            return len(pred_masks)

        record("base", name, fn)

    print("== refiner baselines ==", flush=True)
    initial = [m for m in masks]
    for name in refiner_names:
        holder = {}

        def fn(reuse=False, name=name, holder=holder):
            if not reuse or "m" not in holder:
                holder["m"] = build_refiner_model(name, "OSD")
            refined, _out, _t, _fg = holder["m"].predict(
                rgb_path, depth_path, initial, None
            )
            return len(refined)

        record("refiner", name, fn)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    n_fail = sum(1 for e in results["models"].values() if not e["ok"])
    print(f"wrote {args.out}; {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
