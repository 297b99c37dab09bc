"""Quantize an orbax checkpoint into an in-repo int8 .npz release artifact.

The serving default the benchmark picks up (weights/flagship_synth_int8.npz)
is produced from a trained checkpoint directory:

    python tools/quantize_checkpoint.py output/flagship_synth/ckpt \
        weights/flagship_synth_int8.npz

Symmetric per-output-channel int8 for large floating leaves, f32 for the
rest (see quber_tpu/train/checkpoint.py save_quantized_params). ~4x smaller
than the f32 checkpoint; bf16 inference output quality is unaffected in
practice (verify with --check, which reports worst-leaf relative error).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt_dir", help="orbax checkpoint directory")
    parser.add_argument("out", help="output .npz path")
    parser.add_argument("--check", action="store_true",
                        help="reload and report worst-leaf relative error")
    args = parser.parse_args()

    import numpy as np

    from quber_tpu.train.checkpoint import (
        _flatten_dict,
        load_eval_params,
        load_quantized_params,
        save_quantized_params,
    )

    variables = load_eval_params(args.ckpt_dir)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_quantized_params(args.out, variables)
    print(f"wrote {args.out}: {os.path.getsize(args.out) / 1e6:.1f} MB")

    if args.check:
        re = load_quantized_params(args.out)
        ref = dict(_flatten_dict(variables))
        worst = ("", 0.0)
        for key, v in _flatten_dict(re):
            a = np.asarray(ref[key], np.float32)
            scale = np.abs(a).max() or 1.0
            err = float(np.abs(a - np.asarray(v, np.float32)).max() / scale)
            if err > worst[1]:
                worst = (key, err)
        print(f"worst leaf: {worst[0]} rel err {worst[1]:.5f}")


if __name__ == "__main__":
    main()
