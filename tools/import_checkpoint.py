"""Convert reference (detectron2/torch) checkpoints to orbax flax trees.

The reference's eval path loads trained torch weights for every model it
runs: the MaskRefiner itself (/root/reference/train_net.py:191-198), the
fg filter (foreground_segmentation/predictor.py:21-99), UCN
(eval/base_model.py:522-546), SAM-HQ (eval/refiner_model.py:554-664) and
CascadePSP-RGBD (eval/refiner_model.py:300-330). This CLI maps any of
those checkpoints onto the corresponding flax parameter tree (round-trip /
oracle-tested importers in quber_tpu/models/{import_torch,import_zoo}.py)
and writes an orbax checkpoint the predictor / harness wrappers load.

    python tools/import_checkpoint.py --model mask_refiner \
        --torch model_final.pth --out output/imported
    python tools/import_checkpoint.py --model cgnet --torch rgbd_fg.pth \
        --out output/fg
    python tools/import_checkpoint.py --model sam_hq \
        --torch sam_hq_vit_h.pth --out output/samhq

Use --export (mask_refiner only) to go the other way (orbax -> torch
state dict .pth), e.g. to validate activations against the reference
implementation on a GPU host.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODELS = ("mask_refiner", "cgnet", "lmffnet", "ucn", "cascadepsp", "sam_hq",
          "msmformer", "uoais_net", "uois_dsn", "uois_rrn")


def import_variables(model: str, sd: dict, model_cfg=None) -> dict:
    """Dispatch a loaded state dict to the right importer."""
    from quber_tpu.models import import_zoo as IZ

    if model == "mask_refiner":
        from quber_tpu.models.import_torch import import_mask_refiner

        return import_mask_refiner(sd, model_cfg)
    if model == "cgnet":
        return IZ.import_cgnet(sd)
    if model == "lmffnet":
        return IZ.import_lmffnet(sd)
    if model == "ucn":
        return IZ.import_ucn(sd)
    if model == "cascadepsp":
        return IZ.import_cascadepsp(sd)
    if model == "sam_hq":
        return IZ.import_sam_hq(sd)
    if model == "msmformer":
        # deployed PretrainedMeanShiftMaskFormer (norm_model_0069999.pth /
        # crop_dec9_model_final.pth, eval/base_model.py:963-1012)
        return IZ.import_msmformer(sd)
    if model == "uoais_net":
        # deployed GeneralizedRCNN model_final.pth
        # (R50_rgbdconcat_mlc_occatmask_hom_concat, eval/base_model.py:174-186)
        return IZ.import_uoais_net(sd)
    if model == "uois_dsn":
        # DepthSeedingNetwork_3D_TOD_checkpoint.pth (eval/base_model.py:444)
        return IZ.import_uois_dsn(sd)
    if model == "uois_rrn":
        # RRN_OID_checkpoint.pth (eval/base_model.py:445)
        return IZ.import_uois_rrn(sd)
    raise ValueError(f"unknown model {model!r}; choose from {MODELS}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="mask_refiner", choices=MODELS)
    parser.add_argument("--torch", help="input .pth/.pkl state dict")
    parser.add_argument("--config", default="configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml",
                        help="model config (mask_refiner only)")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--export", help="orbax checkpoint dir to export to torch instead")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from quber_tpu.config import load_config
    from quber_tpu.models.import_torch import (
        export_mask_refiner,
        load_torch_checkpoint,
    )

    model_cfg, train_cfg = load_config(args.config)

    if args.export:
        if args.model != "mask_refiner":
            parser.error("--export currently supports mask_refiner only")
        import torch

        from quber_tpu.train.checkpoint import restore_params

        variables = {"params": restore_params(args.export)}
        sd = export_mask_refiner(variables, model_cfg)
        os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.out)
        print(f"exported {len(sd)} tensors -> {args.out}")
        return 0

    if not args.torch:
        parser.error("--torch (import) or --export required")
    sd = load_torch_checkpoint(args.torch)
    variables = import_variables(args.model, sd, model_cfg)

    from quber_tpu.train.checkpoint import save_params

    os.makedirs(args.out, exist_ok=True)
    # the payload is the FULL variables dict (params + batch_stats): the
    # predictor consumes it as-is via restore_params
    save_params(os.path.join(args.out, "ckpt"), variables)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"imported {args.model}: {n / 1e6:.1f}M params -> {args.out}/ckpt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
