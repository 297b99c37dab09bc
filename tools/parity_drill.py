"""One-command reference-parity drill: torch checkpoint -> verdict.

Reference-checkpoint parity is the one claim this environment cannot
discharge (zero egress: no reference weights, no OSD/OCID captures). This
tool is the drill for the day a checkpoint arrives — ONE command runs the
whole seam and writes ONE report:

  1. import: detectron2/torch MaskRefiner state dict -> flax params
     (quber_tpu/models/import_torch.py; the `depth_`-prefixed dual-trunk
     key layout of /root/reference/maskrefiner/modeling/backbone/
     resnet.py:132,463-465);
  2. activation parity: per-stage flax activations vs a plain-torch
     re-execution of the reference layer semantics, from the SAME state
     dict (tools/activation_parity.py);
  3. harness eval: the imported weights through the real metric pipeline
     (run_eval semantics, eval/run_eval.py) on the given dataset — or on
     freshly rendered synthetic OSD-layout scenes when no real dataset is
     present;
  4. one JSON report: import coverage, worst parity stage, eval table.

    python tools/parity_drill.py --torch model_final.pth \
        [--dataset OSD --dataset-path datasets/OSD] [--limit 25] \
        [--out parity_drill.json]

With no --dataset-path the drill renders `--synthetic-n` scenes itself
(tools/make_synthetic_dataset.py layout) and evaluates with the
perturbed-gt base model. Exit status is nonzero unless the import
succeeds AND every parity stage matches.

Tested end-to-end (tests/test_parity_drill.py) with a full-scale
synthetic torch state dict exported from a fresh flax init — the exact
byte layout a real detectron2 checkpoint presents.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _render_synth_osd(out_dir: str, n: int, h: int = 480, w: int = 640,
                      seed: int = 1000) -> None:
    """OSD-layout synthetic scenes (image_color/ disparity/ annotation/),
    the tools/make_synthetic_dataset.py format the harness walks."""
    import imageio.v2 as imageio

    from quber_tpu.data.synthetic import render_scene

    for sub in ("image_color", "disparity", "annotation"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        rgb, depth_mm, masks = render_scene(rng, h, w,
                                            depth_range=(250.0, 1500.0))
        label = np.zeros(rgb.shape[:2], np.uint8)
        for k, m in enumerate(masks, start=1):
            label[m > 0] = k
        name = f"synth_{i:05d}.png"
        imageio.imwrite(os.path.join(out_dir, "image_color", name), rgb)
        imageio.imwrite(os.path.join(out_dir, "disparity", name),
                        np.round(depth_mm).astype(np.uint16))
        imageio.imwrite(os.path.join(out_dir, "annotation", name), label)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch", required=True,
                        help=".pth MaskRefiner state dict (reference layout)")
    parser.add_argument("--config", default="configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml")
    parser.add_argument("--dataset", default="OSD",
                        help="harness dataset name for the eval leg")
    parser.add_argument("--dataset-path", default=None,
                        help="real dataset root; omitted -> rendered "
                             "synthetic OSD-layout scenes")
    parser.add_argument("--base-model", default="perturbed-gt",
                        help="harness base model for the eval leg")
    parser.add_argument("--synthetic-n", type=int, default=20)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--parity-size", type=int, nargs=2, default=(128, 128),
                        metavar=("H", "W"),
                        help="activation-parity input size (the torch "
                             "re-execution is host-CPU; parity is "
                             "size-independent)")
    parser.add_argument("--atol", type=float, default=3e-4)
    parser.add_argument("--eval-size", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="override the eval leg's model/scene size "
                             "(default: the config's 480x640); the imported "
                             "state dict is size-independent, so tests can "
                             "drill the full-scale weights at small frames")
    parser.add_argument("--workdir", default="output/parity_drill")
    parser.add_argument("--out", default="parity_drill.json")
    parser.add_argument("--cpu", action="store_true",
                        help="pin JAX to CPU (default: whatever device JAX "
                             "picks — the TPU when attached)")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from quber_tpu.config import load_config
    from quber_tpu.models.import_torch import (
        import_mask_refiner,
        load_torch_checkpoint,
    )

    report = {"torch": os.path.abspath(args.torch), "config": args.config}

    # ---- 1. import --------------------------------------------------------
    cfg, _ = load_config(args.config)
    sd = load_torch_checkpoint(args.torch)
    params = import_mask_refiner(sd, cfg)
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    report["import"] = {"n_torch_tensors": len(sd), "n_params": n_params}
    print(f"[1/3] import ok: {len(sd)} torch tensors -> {n_params:,} params")

    # ---- 2. activation parity --------------------------------------------
    import torch as _torch

    import activation_parity as AP

    ph, pw = args.parity_size
    pcfg = dataclasses.replace(cfg, height=ph, width=pw)
    pvars = import_mask_refiner(sd, pcfg)
    rng = np.random.RandomState(0)
    images = (rng.rand(1, ph, pw, 6) * 255).astype(np.float32)
    offset = rng.rand(1, ph, pw, 3).astype(np.float32)
    ref = AP.TorchRef(sd, pcfg)
    with _torch.no_grad():
        ref.forward(_torch.from_numpy(np.transpose(images, (0, 3, 1, 2))),
                    _torch.from_numpy(np.transpose(offset, (0, 3, 1, 2))))
    stages = AP.compare(ref.acts, AP.flax_activations(pvars, pcfg, images, offset),
                        args.atol)
    n_bad = sum(1 for v in stages.values() if v.get("status") != "ok")
    worst = max((v.get("max_abs", 0.0) for v in stages.values()), default=0.0)
    report["parity"] = {"n_stages": len(stages), "n_mismatched": n_bad,
                        "worst_max_abs": worst, "atol": args.atol,
                        "stages": stages}
    print(f"[2/3] parity: {len(stages) - n_bad}/{len(stages)} stages match "
          f"(worst max|d| {worst:.2e})")

    # ---- 3. harness eval --------------------------------------------------
    from quber_tpu.evaluation.harness import run_eval

    ecfg = cfg
    if args.eval_size:
        ecfg = dataclasses.replace(cfg, height=args.eval_size[0],
                                   width=args.eval_size[1])
        params = import_mask_refiner(sd, ecfg)
    dataset_path = args.dataset_path
    if dataset_path is None:
        dataset_path = os.path.join(args.workdir, "synth_osd")
        marker = os.path.join(dataset_path, "image_color")
        if not os.path.isdir(marker) or len(os.listdir(marker)) < args.synthetic_n:
            print(f"    rendering {args.synthetic_n} synthetic scenes -> "
                  f"{dataset_path}")
            _render_synth_osd(dataset_path, args.synthetic_n,
                              ecfg.height, ecfg.width)
    os.makedirs(args.workdir, exist_ok=True)
    results = run_eval(
        base_model=args.base_model,
        refiner_model="maskrefiner-nofilter",
        test_dataset=args.dataset,
        dataset_path=dataset_path,
        config=ecfg,
        params=params,
        limit=args.limit,
        csv_path=os.path.join(args.workdir, "eval_results.csv"),
    )
    report["eval"] = {
        "dataset": args.dataset,
        "dataset_path": os.path.abspath(dataset_path),
        "base_model": args.base_model,
        "initial": results["initial"],
        "refined": results["refined"],
        "avg_refine_ms": results["avg_refine_ms"],
    }
    print("[3/3] harness eval done")

    report["ok"] = n_bad == 0
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(("PARITY DRILL OK" if report["ok"] else
           f"PARITY DRILL FAILED ({n_bad} mismatched stages)")
          + f" -> {args.out}")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
