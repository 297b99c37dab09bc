"""QuBER-TPU training driver.

CLI equivalent of /root/reference/train_net.py (detectron2 DefaultTrainer +
DDP launch): SPMD data parallelism over a jax.sharding mesh replaces the
per-GPU process launch; orbax checkpoints replace DetectionCheckpointer.

    python train_net.py --config-file configs/mask_refiner_rgbd_...yaml \
        --dataset uoais_sim_train_panoptic --data-root datasets \
        --output-dir output/flagship [--resume] [--max-iter N]

Use --synthetic for a self-contained smoke run without datasets on disk.
"""

import argparse
import os
import time


def synthetic_records(n, h, w, seed=0, depth_range=(2500, 15000),
                      n_objects=None, shapes="mixed"):
    """In-memory dataset records exercising the full mapper path.

    Scenes are RENDERED (occlusion-aware superellipse objects over a tilted
    table plane, quber_tpu/data/synthetic.py) so that refinement is actually
    learnable from the image — training on these scenes demonstrably improves
    boundary/overlap F over the perturbed initial masks (see
    tests/test_train.py's learns-to-refine check and the committed
    EVAL_SYNTH table).
    """
    from quber_tpu.data.synthetic import synthetic_records as _gen

    return _gen(n, h, w, seed=seed, depth_range=depth_range,
                n_objects=n_objects, shapes=shapes)


class SyntheticMapper:
    """Mapper for in-memory records (bypasses file IO, keeps target math)."""

    def __init__(self, train_cfg, model_cfg):
        from quber_tpu.data.mappers import PerturbedPanopticMapper

        self._m = PerturbedPanopticMapper(train_cfg, model_cfg)
        self.tc, self.mc = train_cfg, model_cfg

    def __call__(self, record):
        import numpy as np

        from quber_tpu.data import rle
        from quber_tpu.data.eee import compute_eee_maps
        from quber_tpu.data.mappers import normalize_depth_mm, numpy_center_offset
        from quber_tpu.models.mask_refiner import assemble_eee_targets

        h, w = self.mc.height, self.mc.width
        gt_masks = record["gt_masks"]
        pert = np.asarray([rle.decode(r) for r in record["perturbed_segmentation"]])
        sem_seg = (gt_masks.sum(0) > 0).astype(np.float32)
        center, offset, _ = numpy_center_offset(gt_masks, h, w, self.tc.gaussian_sigma)
        p_center, p_offset, _ = numpy_center_offset(pert, h, w, self.tc.gaussian_sigma, normalize=True)
        maps = compute_eee_maps(gt_masks, pert)
        et = self.mc.error_type
        sem_weights = np.ones((h, w), np.float32)
        for m in gt_masks:
            if m.sum() < self.tc.small_instance_area:
                sem_weights[m > 0] = self.tc.small_instance_weight
        return {
            "image": np.concatenate(
                [record["rgb"].astype(np.float32),
                 normalize_depth_mm(record["depth_mm"], self.tc.depth_range)], axis=-1),
            "offset_enc": np.stack([p_center, p_offset[0], p_offset[1]], -1).astype(np.float32),
            "sem_seg": sem_seg,
            "sem_seg_weights": sem_weights,
            "center": center,
            "center_weights": sem_seg,
            "offset": np.stack([offset[0], offset[1]], -1),
            "offset_weights": sem_seg,
            "eee_mask": np.asarray(assemble_eee_targets(
                maps["tp_mask"], maps["tn_mask"], maps["fp_mask"], maps["fn_mask"], et)),
            "eee_boundary": np.asarray(assemble_eee_targets(
                maps["tp_boundary"], maps["tn_boundary"], maps["fp_boundary"], maps["fn_boundary"], et)),
        }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-file", default="configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml")
    parser.add_argument("--dataset", default="uoais_sim_train_panoptic")
    parser.add_argument("--data-root", default="datasets")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max-iter", type=int, default=None)
    parser.add_argument("--checkpoint-period", type=int, default=None)
    parser.add_argument("--log-period", type=int, default=20)
    parser.add_argument("--synthetic", action="store_true",
                        help="train on generated data (smoke/e2e test)")
    parser.add_argument("--synthetic-size", type=int, default=32)
    parser.add_argument("--n-objects", type=int, nargs=2, default=None,
                        metavar=("LO", "HI"),
                        help="--synthetic: objects per scene sampled in "
                             "[LO, HI] (default: the renderer's 3-8)")
    parser.add_argument("--shapes", default="mixed",
                        choices=["convex", "mixed", "concave"],
                        help="--synthetic: silhouette vocabulary "
                             "(quber_tpu/data/synthetic.py)")
    parser.add_argument("--depth-range", type=float, nargs=2, default=None,
                        help="override INPUT.DEPTH_RANGE (mm); use 250 1500 "
                             "to match the eval harness's OSD depth "
                             "normalization (preprocess_utils.py:12-28)")
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--eval-dataset", default=None,
                        help="run the metric harness every eval_period iters (e.g. OSD)")
    parser.add_argument("--eval-dataset-path", default=None)
    parser.add_argument("--eval-limit", type=int, default=20)
    parser.add_argument("--device-targets", action="store_true",
                        help="generate ALL training targets on device inside "
                             "the jitted step (host only decodes images and "
                             "bitpacks masks) — removes the host target-math "
                             "bottleneck on weak hosts")
    parser.add_argument("--target-slots", type=int, default=32,
                        help="instance-slot bound for --device-targets")
    parser.add_argument("--workers", type=int, default=0,
                        help="grain prefetch workers (0 = in-process loader)")
    parser.add_argument("--space", type=int, default=1,
                        help="spatial-partition factor: shard image height "
                        "over a second mesh axis (data x space); XLA inserts "
                        "the conv halo exchanges (parallel/mesh.make_mesh_2d)")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host data parallelism over DCN: "
                        "jax.distributed.initialize, mesh over the GLOBAL "
                        "device set, each process feeding its local batch "
                        "shard (parallel/mesh.initialize_multihost; the "
                        "reference's --num-machines/--machine-rank launch, "
                        "train_net.py:204-214)")
    parser.add_argument("--no-data-device-cache", action="store_true",
                        help="disable the device-resident packed-sample pool "
                             "for --synthetic --device-targets runs (the pool "
                             "eliminates the per-step H2D transfer, which the "
                             "remote-TPU transport never frees host-side)")
    args = parser.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from quber_tpu.config import load_config
    from quber_tpu.data.mappers import PerturbedPanopticMapper, batch_iterator
    from quber_tpu.parallel.mesh import make_mesh, put_batch
    from quber_tpu.train.checkpoint import restore_state, save_state
    from quber_tpu.train.loop import create_train_state, make_train_step
    from quber_tpu.profiling import enable_compilation_cache

    if args.multihost:
        from quber_tpu.parallel.mesh import initialize_multihost

        initialize_multihost()  # must precede any backend use

    enable_compilation_cache()  # warm restarts skip the ~minutes step compile

    model_cfg, train_cfg = load_config(args.config_file)
    if args.height or args.width:
        model_cfg = dataclasses.replace(
            model_cfg, height=args.height or model_cfg.height,
            width=args.width or model_cfg.width,
        )
    if args.max_iter:
        train_cfg = dataclasses.replace(train_cfg, max_iter=args.max_iter)
    if args.checkpoint_period:
        train_cfg = dataclasses.replace(
            train_cfg, checkpoint_period=args.checkpoint_period
        )
    if args.depth_range:
        train_cfg = dataclasses.replace(
            train_cfg, depth_range=tuple(args.depth_range)
        )
    output_dir = args.output_dir or os.path.join(
        "output", os.path.splitext(os.path.basename(args.config_file))[0]
    )
    os.makedirs(output_dir, exist_ok=True)

    if args.synthetic:
        records = synthetic_records(args.synthetic_size, model_cfg.height,
                                    model_cfg.width,
                                    depth_range=train_cfg.depth_range,
                                    n_objects=args.n_objects,
                                    shapes=args.shapes)
        mapper = SyntheticMapper(train_cfg, model_cfg)
    else:
        from quber_tpu.data.datasets import register_standard_datasets

        register_standard_datasets(args.data_root)
        records = args.dataset
        mapper = PerturbedPanopticMapper(train_cfg, model_cfg, is_train=True)
    if args.device_targets:
        from quber_tpu.train.device_targets import PackedMapper

        mapper = PackedMapper(train_cfg, model_cfg, n_slots=args.target_slots)

    if args.space > 1:
        if args.device_targets:
            # the packed-buffer path carries flat byte samples [B, nbytes];
            # height sharding only applies once targets are unpacked, so the
            # two features are mutually exclusive
            raise SystemExit("--space is incompatible with --device-targets")
        from quber_tpu.parallel.mesh import make_mesh_2d

        mesh = make_mesh_2d(space=args.space)
    else:
        mesh = make_mesh()
    print(f"mesh: {mesh}; devices: {jax.devices()}")
    state, tx = create_train_state(model_cfg, train_cfg)
    if args.resume:
        restored = restore_state(os.path.join(output_dir, "ckpt"), state)
        if restored is not None:
            state = restored
            print(f"resumed at step {int(state.step)}")
    if args.device_targets:
        from quber_tpu.train.device_targets import make_device_target_step

        train_step = make_device_target_step(
            model_cfg, train_cfg, tx, mesh, n_slots=args.target_slots
        )
    else:
        train_step = make_train_step(model_cfg, train_cfg, tx, mesh)
    # Device-resident data pool for synthetic + device-targets runs: the
    # packed samples are deterministic per record (no host-side augmentation
    # on the synthetic branch), so transfer the whole pool to the device ONCE
    # and gather each batch by index on-device. This removes the ~30 MB/step
    # H2D transfer — which the remote-TPU (axon) transport retains host-side
    # forever, OOM-killing long runs — and takes the input pipeline off the
    # step's critical path entirely.
    device_pool = None
    if args.multihost and args.synthetic and args.device_targets \
            and not args.no_data_device_cache:
        # the pool device_puts a replicated host array, which needs the
        # process-local-shard assembly path on multi-host; keep the two
        # features apart rather than special-case it
        raise SystemExit("--multihost requires --no-data-device-cache")
    if args.synthetic and args.device_targets and not args.no_data_device_cache:
        from jax.sharding import NamedSharding, PartitionSpec

        from quber_tpu.parallel.mesh import shard_batch

        packed_all = np.stack([mapper(r)["packed"] for r in records])
        pool = jax.device_put(packed_all, NamedSharding(mesh, PartitionSpec()))
        gather = jax.jit(
            lambda p, idx: p[idx], out_shardings=shard_batch(mesh)
        )
        pool_rng = np.random.RandomState(train_cfg.seed)
        order = np.arange(len(records))
        pos = len(records)  # force an initial shuffle

        def device_pool():
            nonlocal pos
            idx = np.empty(train_cfg.batch_size, np.int32)
            for i in range(train_cfg.batch_size):
                if pos >= len(order):
                    pool_rng.shuffle(order)
                    pos = 0
                idx[i] = order[pos]
                pos += 1
            return gather(pool, jax.device_put(idx))

        batches = None
    elif args.workers:
        from quber_tpu.data.datasets import get_dataset
        from quber_tpu.data.pipeline import make_dataloader

        recs = get_dataset(records) if isinstance(records, str) else records
        batches = make_dataloader(recs, mapper, train_cfg.batch_size,
                                  seed=train_cfg.seed, worker_count=args.workers)
    else:
        # distinct per-process stream: each host contributes a different
        # local shard of the global batch (global = batch_size x n_processes)
        batches = batch_iterator(records, mapper, train_cfg.batch_size,
                                 seed=train_cfg.seed + jax.process_index())

    put = put_batch
    if args.multihost:
        from quber_tpu.parallel.mesh import put_batch_local_shard

        put = put_batch_local_shard

    rng = jax.random.PRNGKey(train_cfg.seed)
    t0 = time.time()
    start = int(state.step)
    t_first = step_flops = None
    for it in range(start, train_cfg.max_iter):
        if device_pool is not None:
            batch = device_pool()
        else:
            batch = put(next(batches), mesh)
            if args.device_targets:
                batch = batch["packed"]
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, batch, step_rng)
        if t_first is None:
            # time-to-first-step ~ compile time: the queue's compile-vs-run
            # accounting greps this line (tools/r5_chip.sh stage())
            jax.block_until_ready(metrics)
            t_first = time.time() - t0
            print(f"[timing] compile_s={t_first:.1f}", flush=True)
            try:  # XLA's own FLOP count of the exact compiled step (for MFU).
                # lower().compile() bypasses the jit cache, so only attempt it
                # when the persistent compilation cache is on (the entry the
                # first step just wrote makes this a cache hit, not a second
                # multi-minute remote compile)
                if jax.config.jax_compilation_cache_dir:
                    ca = train_step.lower(state, batch, step_rng).compile(
                    ).cost_analysis()
                    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                    step_flops = float(ca.get("flops", 0.0)) or None
            except Exception:
                step_flops = None
            t0 = time.time()
        if (it + 1) % args.log_period == 0 or it + 1 == train_cfg.max_iter:
            metrics = {k: float(v) for k, v in metrics.items()}
            rate = args.log_period / (time.time() - t0)
            t0 = time.time()
            # train-step MFU: compiled-step FLOPs x steps/s / v5e bf16 peak
            mfu = f" mfu={step_flops * rate / 197e12:.3f}" if step_flops else ""
            print(f"iter {it + 1}/{train_cfg.max_iter} "
                  + " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
                  + f" ({rate:.2f} it/s){mfu}", flush=True)
        if (it + 1) % train_cfg.checkpoint_period == 0 or it + 1 == train_cfg.max_iter:
            save_state(os.path.join(output_dir, "ckpt"), state)
            print(f"checkpoint saved at {it + 1}")
        if args.eval_dataset and (it + 1) % train_cfg.eval_period == 0:
            # periodic eval (the reference's COCOEvaluator hook,
            # train_net.py:43-70): run the metric harness against the val
            # split with the current weights
            from quber_tpu.evaluation.harness import run_eval as _run_eval

            _run_eval(
                base_model="perturbed-gt",
                refiner_model="maskrefiner-nofilter",
                test_dataset=args.eval_dataset,
                dataset_path=args.eval_dataset_path,
                config=model_cfg,
                params={"params": state.params, "batch_stats": state.batch_stats},
                limit=args.eval_limit,
                csv_path=os.path.join(output_dir, "eval.csv"),
                tag=f"train-eval@{it + 1}",
            )


if __name__ == "__main__":
    main()
