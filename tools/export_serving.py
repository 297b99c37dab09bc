"""AOT-export the refine pipeline to a serialized StableHLO artifact.

Serving deployments load the artifact with jax.export.deserialize and call
it with (params, packed input batch) — no model source, flax, or tracing at
serving time, and the compiled program is pinned to what was validated. This
goes beyond the reference (which serves from the full detectron2 stack).

    # export (weights via orbax checkpoint dir, or random for smoke)
    python tools/export_serving.py --out refine_b16.jexp \
        [--weights ckpt_dir] [--batch 16] [--max-instances 24] [--input-rle]

    # serve
    import jax.export
    exp = jax.export.deserialize(open("refine_b16.jexp", "rb").read())
    out = exp.call(params, bufs)   # bufs: uint8 [batch, in_bytes]

A --selfcheck run exports, reloads, executes both the artifact and the live
pipeline on a synthetic batch, and compares outputs exactly.
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="refine.jexp")
    ap.add_argument("--weights", default=None, help="orbax checkpoint dir")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-instances", type=int, default=24)
    ap.add_argument("--input-rle", action="store_true", default=True)
    ap.add_argument("--dense-input", dest="input_rle", action="store_false")
    ap.add_argument("--rle-output", action="store_true",
                    help="export the RLE-output variant (default: raw maps)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--selfcheck", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.export
    import jax.numpy as jnp

    from quber_tpu.models import MaskRefinerConfig
    from quber_tpu.predictor import MaskRefinerPredictor

    cfg = MaskRefinerConfig(height=args.height, width=args.width,
                            dtype=args.dtype)
    params = None
    if args.weights:
        from quber_tpu.train.checkpoint import load_eval_params

        params = load_eval_params(args.weights)
    pred = MaskRefinerPredictor(cfg, params, max_instances=args.max_instances)

    from functools import partial

    if args.rle_output:
        fn = jax.jit(partial(pred._pipeline_packed_batch_rle_impl,
                             input_rle=args.input_rle))
    else:
        fn = jax.jit(partial(pred._pipeline_packed_batch_impl,
                             input_rle=args.input_rle))
    in_bytes = pred._in_bytes_rle if args.input_rle else pred._in_bytes
    buf_spec = jax.ShapeDtypeStruct((args.batch, in_bytes), jnp.uint8)
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), pred.params
    )

    exported = jax.export.export(fn)(param_specs, buf_spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, "
          f"platforms={exported.platforms}, "
          f"input=[{args.batch}, {in_bytes}] uint8 "
          f"({'rle' if args.input_rle else 'dense'} masks, "
          f"{'rle' if args.rle_output else 'raw'} output)")

    if args.selfcheck:
        rng = np.random.RandomState(7)
        h, w = cfg.height, cfg.width
        ys, xs = np.mgrid[:h, :w]
        masks = [((ys - h // 2) ** 2 + (xs - w // 2) ** 2 < (min(h, w) // 5) ** 2)]
        rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        depth = (rng.rand(h, w) * 255).astype(np.uint8)
        pack = pred._pack_inputs_rle if args.input_rle else pred._pack_inputs
        bufs = jnp.asarray(np.stack([pack(rgb, depth, masks)] * args.batch))

        reloaded = jax.export.deserialize(blob)
        got = reloaded.call(pred.params, bufs)
        want = fn(pred.params, bufs)
        for g, wnt in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(wnt))
        print("selfcheck OK: artifact output == live pipeline output")
    return 0


if __name__ == "__main__":
    sys.exit(main())
