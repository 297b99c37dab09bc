"""CLI for the end-to-end UOIS refinement benchmark.

Drop-in equivalent of /root/reference/eval/run_eval.py:

    python run_eval.py --base-model gt --refiner-model maskrefiner \
        --test-dataset OSD --dataset-path /data/OSD-0.2-depth
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-file", default="configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml")
    parser.add_argument("--base-model", default="gt",
                        help="gt | empty | npy | perturbed-gt | uoaisnet | "
                             "uoaisnet-amodal | uoaisnet-pretrained | ucn | "
                             "ucn-zoomin | msmformer | msmformer-zoomin | "
                             "msmformer-pretrained | uoisnet3d | "
                             "uoisnet3d-pretrained | sam | "
                             "sam-depth | detic | grounded-sam")
    parser.add_argument("--refiner-model", default="maskrefiner",
                        help="maskrefiner | maskrefiner-nofilter | identity | "
                             "npy | rice | cascadepsp | cascadepsp-rgbd | sam | "
                             "hq-sam | hq-sam-pretrained | save")
    parser.add_argument("--test-dataset", default="OSD",
                        help="OSD | OCID | WISDOM | HOPE | DoPose")
    parser.add_argument("--dataset-path", default=None)
    parser.add_argument("--use-cgnet", action="store_true",
                        help="filter refined instances with the foreground "
                             "segmenter (reference run_eval.py:26-30; without "
                             "it 'maskrefiner' runs unfiltered)")
    parser.add_argument("--gpu", default=None,
                        help="accepted for reference-CLI compatibility; "
                             "device selection is JAX-managed on TPU")
    parser.add_argument("--weights-file", default=None,
                        help="orbax checkpoint dir or int8 .npz artifact "
                             "(random init if omitted)")
    parser.add_argument("--npy-folder", default="")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--refine-batch", type=int, default=0,
                        help="stream refinement in device batches of this "
                             "size (throughput mode; 0 = per-image)")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--vis_dir", default="./vis")
    parser.add_argument("--csv", default="./eval_results.csv")
    parser.add_argument("--tag", default=None,
                        help="provenance tag recorded in the CSV row "
                             "(default: <weights-basename>|<mode>[|limitN])")
    args = parser.parse_args()

    from quber_tpu.config import from_detectron2_yaml, load_config
    from quber_tpu.evaluation.harness import run_eval
    from quber_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()  # warm re-runs skip pipeline compiles

    if args.config_file.startswith("configs/") or "model:" in open(args.config_file).read():
        model_cfg, _ = load_config(args.config_file)
    else:
        model_cfg, _ = from_detectron2_yaml(args.config_file)

    params = None
    if args.weights_file:
        from quber_tpu.train.checkpoint import load_eval_params

        params = load_eval_params(args.weights_file)

    refiner_name = args.refiner_model
    if refiner_name == "maskrefiner" and not args.use_cgnet:
        # reference semantics: the fg filter is opt-in via --use-cgnet
        refiner_name = "maskrefiner-nofilter"

    tag = args.tag
    if tag is None:
        ckpt = "random-init"
        if args.weights_file:
            ckpt = os.path.basename(os.path.normpath(args.weights_file))
            if ckpt == "ckpt":  # orbax dirs are <run>/ckpt — use the run name
                ckpt = os.path.basename(os.path.dirname(os.path.normpath(args.weights_file)))
        mode = f"batch{args.refine_batch}" if args.refine_batch else "per-image"
        tag = f"{ckpt}|{mode}" + (f"|limit{args.limit}" if args.limit else "")

    run_eval(
        base_model=args.base_model,
        refiner_model=refiner_name,
        test_dataset=args.test_dataset,
        dataset_path=args.dataset_path,
        config=model_cfg,
        params=params,
        npy_folder=args.npy_folder,
        limit=args.limit,
        visualize=args.visualize,
        vis_dir=args.vis_dir,
        csv_path=args.csv,
        refine_batch=args.refine_batch,
        tag=tag,
    )


if __name__ == "__main__":
    main()
