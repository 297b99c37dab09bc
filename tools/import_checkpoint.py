"""Convert a reference (detectron2/torch) MaskRefiner checkpoint to orbax.

The reference trains with detectron2's DetectionCheckpointer
(/root/reference/train_net.py:191-198, .pth/.pkl state dicts with the
`depth_`-prefixed dual-trunk key naming, backbone/resnet.py:132). This CLI
maps such a checkpoint onto the flax parameter tree
(quber_tpu/models/import_torch.py, round-trip tested) and writes an orbax
checkpoint that train_net.py --resume and the predictor can load.

    python tools/import_checkpoint.py --torch model_final.pth \
        --config configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml \
        --out output/imported

Use --export to go the other way (orbax -> torch state dict .pth), e.g. to
validate activations against the reference implementation on a GPU host.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch", help="input .pth/.pkl state dict")
    parser.add_argument("--config", default="configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--export", help="orbax checkpoint dir to export to torch instead")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from quber_tpu.config import load_config
    from quber_tpu.models.import_torch import (
        export_mask_refiner,
        import_mask_refiner,
        load_torch_checkpoint,
    )

    model_cfg, train_cfg = load_config(args.config)

    if args.export:
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
    variables = import_mask_refiner(sd, model_cfg)

    from quber_tpu.train.checkpoint import save_params

    os.makedirs(args.out, exist_ok=True)
    # the payload is the FULL variables dict (params + batch_stats): the
    # predictor consumes it as-is via restore_params
    save_params(os.path.join(args.out, "ckpt"), variables)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"imported {n / 1e6:.1f}M params -> {args.out}/ckpt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
