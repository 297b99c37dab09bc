"""Learns-to-refine self-check: train on synthetic scenes, verify the
refiner beats the perturbed initial masks.

The environment carries no UOAIS-Sim/TOD data or pretrained weights, so this
tool is the end-to-end proof that the training stack (mapper -> targets ->
losses -> SPMD step -> checkpoint) actually teaches the QuBER refiner to
refine: it renders synthetic tabletop-like scenes (objects drawn into
rgb/depth), trains for --steps, then compares Overlap/Boundary F of
(a) the perturbed initial masks and (b) the refined masks on held-out
scenes. Expected: refined F > initial F by a clear margin.

    python tools/selfcheck_train.py --height 128 --width 160 --steps 400

Prints one JSON line: {"initial_overlap_f", "refined_overlap_f",
"initial_boundary_f", "refined_boundary_f", "improved": bool}.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=160)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--train-size", type=int, default=64)
    parser.add_argument("--val-size", type=int, default=8)
    parser.add_argument("--base-lr", type=float, default=3e-4)
    parser.add_argument("--output-dir", default="output/selfcheck")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax

    from train_net import SyntheticMapper, synthetic_records

    from quber_tpu.config import load_config
    from quber_tpu.data import rle
    from quber_tpu.data.mappers import batch_iterator, normalize_depth_mm
    from quber_tpu.evaluation.metrics import multilabel_metrics
    from quber_tpu.parallel.mesh import make_mesh, put_batch
    from quber_tpu.predictor import MaskRefinerPredictor
    from quber_tpu.train.checkpoint import save_state
    from quber_tpu.train.loop import create_train_state, make_train_step

    model_cfg, train_cfg = load_config(
        "configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml"
    )
    model_cfg = dataclasses.replace(
        model_cfg, height=args.height, width=args.width
    )
    train_cfg = dataclasses.replace(
        train_cfg, batch_size=args.batch, max_iter=args.steps,
        base_lr=args.base_lr, warmup_iters=min(100, args.steps // 4),
    )

    records = synthetic_records(args.train_size, args.height, args.width, seed=0)
    val = synthetic_records(args.val_size, args.height, args.width, seed=999)
    mapper = SyntheticMapper(train_cfg, model_cfg)

    mesh = make_mesh()
    state, tx = create_train_state(model_cfg, train_cfg)
    step_fn = make_train_step(model_cfg, train_cfg, tx, mesh)
    batches = batch_iterator(records, mapper, train_cfg.batch_size, seed=7)

    rng = jax.random.PRNGKey(7)
    t0 = time.time()
    for it in range(args.steps):
        batch = put_batch(next(batches), mesh)
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, step_rng)
        if (it + 1) % 50 == 0 or it + 1 == args.steps:
            rate = (it + 1) / (time.time() - t0)
            print(f"iter {it + 1}/{args.steps} "
                  f"total_loss={float(metrics['total_loss']):.4f} "
                  f"({rate:.2f} it/s)", flush=True)
    os.makedirs(args.output_dir, exist_ok=True)
    save_state(os.path.join(args.output_dir, "ckpt"), state)

    predictor = MaskRefinerPredictor(
        model_cfg,
        params={"params": state.params, "batch_stats": state.batch_stats},
        max_instances=16,
    )

    def label_image(masks):
        out = np.zeros(masks.shape[1:], np.int32)
        for i, m in enumerate(masks):
            out[m > 0] = i + 1
        return out

    agg = {"io": [], "ro": [], "ib": [], "rb": []}
    for rec in val:
        gt = label_image(rec["gt_masks"])
        pert = np.asarray([rle.decode(r) for r in rec["perturbed_segmentation"]])
        depth3 = normalize_depth_mm(rec["depth_mm"], train_cfg.depth_range)
        pan, count, _ = predictor.predict_packed(rec["rgb"], depth3, list(pert))
        m_init = multilabel_metrics(label_image(pert), gt)
        m_ref = multilabel_metrics(pan, gt)
        agg["io"].append(m_init["Objects F-measure"])
        agg["ro"].append(m_ref["Objects F-measure"])
        agg["ib"].append(m_init["Boundary F-measure"])
        agg["rb"].append(m_ref["Boundary F-measure"])

    out = {
        "initial_overlap_f": round(float(np.mean(agg["io"])), 4),
        "refined_overlap_f": round(float(np.mean(agg["ro"])), 4),
        "initial_boundary_f": round(float(np.mean(agg["ib"])), 4),
        "refined_boundary_f": round(float(np.mean(agg["rb"])), 4),
    }
    out["improved"] = bool(
        out["refined_overlap_f"] > out["initial_overlap_f"]
        and out["refined_boundary_f"] > out["initial_boundary_f"]
    )
    print(json.dumps(out))
    return 0 if out["improved"] else 1


if __name__ == "__main__":
    sys.exit(main())
