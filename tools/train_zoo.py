#!/usr/bin/env python
"""Zoo base-segmenter training CLI (UOAIS-Net on synthetic scenes).

The reference trains its base segmenters in their own vendored repos
(ext_modules/uoais train_net.py with the adet RPN/ROI/mask losses,
rcnn_heads.py:62-381). This driver is the TPU-native equivalent for the
UOAIS-Net port: fixed-shape anchor/ROI target assignment inside one jitted
step (quber_tpu/models/uoais_net.uoais_losses), trained on the in-repo
occlusion-aware synthetic scenes with real amodal ground truth.

    python tools/train_zoo.py --model uoaisnet --size 192 --max-iter 3000 \
        --output-dir output/uoaisnet_synth

The checkpoint loads into the eval harness:
    QUBER_UOAISNET_CKPT=output/uoaisnet_synth/ckpt python run_eval.py \
        --base-model uoaisnet --refiner-model maskrefiner ...
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLOTS = 12  # gt instance slots (synthetic scenes have 3-8 objects)


def make_scenes(n, h, w, seed, depth_range):
    """Pre-render scenes to host arrays the jitted step consumes directly:
    rgb float32 0..255 (the eval wrapper feeds raw cv2 BGR; synthetic colors
    are channel-symmetric), depth normalized to the 0..255 x3 encoding
    (preprocess_utils.py:12-28), gt padded to SLOTS."""
    import numpy as np

    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.ops.preprocess import normalize_depth

    rng = np.random.RandomState(seed)
    scenes = []
    for _ in range(n):
        rgb, depth_mm, vis, amo = render_scene(
            rng, h, w, depth_range=depth_range, return_amodal=True
        )
        k = min(vis.shape[0], SLOTS)
        boxes = np.zeros((SLOTS, 4), np.float32)
        gvis = np.zeros((SLOTS, h, w), np.float32)
        gamo = np.zeros((SLOTS, h, w), np.float32)
        valid = np.zeros((SLOTS,), bool)
        for i in range(k):
            ys, xs = np.nonzero(amo[i])
            boxes[i] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
            gvis[i] = vis[i]
            gamo[i] = amo[i]
            valid[i] = True
        scenes.append({
            "rgb": rgb.astype(np.float32),
            "depth": normalize_depth(depth_mm).astype(np.float32),
            "boxes": boxes, "vis": gvis, "amo": gamo, "valid": valid,
        })
    return scenes


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=["uoaisnet"], default="uoaisnet")
    parser.add_argument("--size", type=int, default=192,
                        help="number of pre-rendered scenes")
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--depth-range", type=float, nargs=2, default=(250, 1500))
    parser.add_argument("--max-iter", type=int, default=3000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--log-period", type=int, default=50)
    parser.add_argument("--checkpoint-period", type=int, default=500)
    parser.add_argument("--output-dir", default="output/uoaisnet_synth")
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.uoais_net import UOAISNet, uoais_losses
    from quber_tpu.profiling import enable_compilation_cache
    from quber_tpu.train.checkpoint import save_params

    enable_compilation_cache()

    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt"))
    os.makedirs(ckpt_dir, exist_ok=True)

    print(f"rendering {args.size} scenes ...", flush=True)
    scenes = make_scenes(args.size, args.height, args.width, args.seed,
                         tuple(args.depth_range))

    # FrozenBN (the eval wrapper's default) keeps the param tree identical to
    # UOAISNetBaseModel's; at random init it is the identity transform, which
    # is the right from-scratch behavior (the reference fine-tunes from
    # ImageNet weights with BN frozen the same way).
    model = UOAISNet()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.height, args.width, 3)),
        jnp.zeros((1, args.height, args.width, 3)),
    )
    tx = optax.adam(args.lr)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rgb, depth, boxes, vis, amo, valid):
        def loss_fn(p):
            # GT boxes spliced into the proposals + detections
            # (add_ground_truth_to_proposals) so ROI/mask heads train from
            # step one
            out = model.apply({"params": p}, rgb[None], depth[None],
                              gt_proposals=jnp.where(valid[:, None], boxes, 0.0))
            losses = uoais_losses(out, boxes, vis, amo, valid)
            return sum(losses.values()), losses

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, parts

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(scenes))
    cursor = 0
    t0 = time.time()
    for it in range(1, args.max_iter + 1):
        if cursor >= len(order):
            order = rng.permutation(len(scenes))
            cursor = 0
        s = scenes[order[cursor]]
        cursor += 1
        params, opt_state, loss, parts = step(
            params, opt_state,
            jnp.asarray(s["rgb"]), jnp.asarray(s["depth"]),
            jnp.asarray(s["boxes"]), jnp.asarray(s["vis"]),
            jnp.asarray(s["amo"]), jnp.asarray(s["valid"]),
        )
        if it % args.log_period == 0 or it == args.max_iter:
            detail = " ".join(
                f"{k}={float(v):.4f}" for k, v in sorted(parts.items())
            )
            print(f"iter {it}/{args.max_iter} total={float(loss):.4f} {detail} "
                  f"({it / (time.time() - t0):.2f} it/s)", flush=True)
        if it % args.checkpoint_period == 0 or it == args.max_iter:
            save_params(ckpt_dir, {"params": params}, step=it)
            print(f"checkpoint saved at {it}", flush=True)


if __name__ == "__main__":
    main()
