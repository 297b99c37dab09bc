#!/usr/bin/env python
"""Foreground-segmenter training CLI (CGNet / LMFFNet).

Rebuild of the reference's standalone fg trainer
(/root/reference/foreground_segmentation/train.py:25-86): per-batch channel
assembly per input mode, class-balanced weighted CE (loss.py:9-66), RAdam,
periodic checkpoint saves — as a jitted TPU step (quber_tpu/train/fg_train.py).

Trains on any OSD-layout dataset (image_color/ disparity/ annotation/), e.g.
the synthetic scenes written by tools/make_synthetic_dataset.py:

    python tools/train_fg.py --model lmffnet --dataset-path datasets/synth_osd \
        --max-iter 2000 --output-dir output/fg_lmffnet

The saved checkpoint loads straight into the eval path:
    QUBER_LMFFNET_CKPT=output/fg_lmffnet/ckpt python run_eval.py \
        --refiner-model maskrefiner --use-cgnet ...
(the reference's refiner wrapper loads rgbd_fg.pth the same way,
foreground_segmentation/predictor.py:57-72).
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def list_samples(root):
    rgbs = sorted(glob.glob(os.path.join(root, "image_color", "*.png")))
    out = []
    for r in rgbs:
        name = os.path.basename(r)
        d = os.path.join(root, "disparity", name)
        a = os.path.join(root, "annotation", name)
        if os.path.exists(d) and os.path.exists(a):
            out.append((r, d, a))
    return out


def load_sample(paths, model, rng):
    """Host-side sample assembly, matching the eval predictors' preprocessing
    exactly (fg_predictor._load_rgbd): BGR imread, depth normalize (mm ->
    [0,255] u8 3ch) + Telea inpaint, ImageNet standardize; CGNet gets 4ch at
    320x240 (predictor.py:21-52), LMFFNet 6ch at 640x480 (:57-99)."""
    import cv2
    import imageio.v2 as imageio
    import numpy as np

    from quber_tpu.ops.preprocess import (
        inpaint_depth,
        normalize_depth,
        standardize_image,
    )

    rgb_path, depth_path, anno_path = paths
    size = (320, 240) if model == "cgnet" else (640, 480)
    w, h = size
    rgb = cv2.imread(rgb_path)
    rgb = cv2.resize(rgb, (w, h))
    depth = np.asarray(imageio.imread(depth_path))
    depth = normalize_depth(depth)
    depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
    depth = inpaint_depth(depth)
    anno = np.asarray(imageio.imread(anno_path))
    anno = cv2.resize(anno, (w, h), interpolation=cv2.INTER_NEAREST)

    if rng.random() < 0.5:  # horizontal flip (data_augmentation.py rotations/
        rgb = rgb[:, ::-1]  # flips family; flip is the shape-preserving one)
        depth = depth[:, ::-1]
        anno = anno[:, ::-1]

    if model == "cgnet":
        x = np.concatenate(
            [standardize_image(rgb), depth[:, :, 0:1].astype(np.float32) / 255.0],
            axis=-1,
        )
        y = (anno > 0).astype(np.int32)  # 2-class fg/bg
    else:
        x = np.concatenate(
            [standardize_image(rgb), depth.astype(np.float32) / 255.0], axis=-1
        )
        # 3-class bg/table/object: object instances -> class 2 (the class the
        # predictor thresholds, predictor.py:96-99); no table labels in the
        # synthetic scenes so class 1 stays empty.
        y = np.where(anno > 0, 2, 0).astype(np.int32)
    return x.astype(np.float32), y


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=["cgnet", "lmffnet"], default="lmffnet")
    parser.add_argument("--dataset-path", default="datasets/synth_osd")
    parser.add_argument("--max-iter", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--log-period", type=int, default=50)
    parser.add_argument("--checkpoint-period", type=int, default=500)
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    import numpy as np

    import jax.numpy as jnp

    from quber_tpu.profiling import enable_compilation_cache
    from quber_tpu.train.checkpoint import save_params
    from quber_tpu.train.fg_train import create_fg_train_state, make_fg_train_step

    enable_compilation_cache()

    out_dir = args.output_dir or f"output/fg_{args.model}"
    ckpt_dir = os.path.abspath(os.path.join(out_dir, "ckpt"))
    os.makedirs(ckpt_dir, exist_ok=True)

    samples = list_samples(args.dataset_path)
    assert samples, f"no OSD-layout samples under {args.dataset_path}"
    print(f"{len(samples)} samples; model={args.model}")

    if args.model == "cgnet":
        from quber_tpu.models.cgnet import CGNet

        model = CGNet(classes=2, in_channels=4, train=True)
        in_shape = (1, 240, 320, 4)
    else:
        from quber_tpu.models.lmffnet import LMFFNet

        model = LMFFNet(classes=3, train=True)
        in_shape = (1, 480, 640, 6)

    state, tx = create_fg_train_state(model, in_shape, lr=args.lr, seed=args.seed)
    step_fn = make_fg_train_step(model, tx)

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(samples))
    cursor = 0
    t0 = time.time()
    for it in range(1, args.max_iter + 1):
        xs, ys = [], []
        for _ in range(args.batch):
            if cursor >= len(order):
                order = rng.permutation(len(samples))
                cursor = 0
            x, y = load_sample(samples[order[cursor]], args.model, rng)
            cursor += 1
            xs.append(x)
            ys.append(y)
        state, metrics = step_fn(state, jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)))
        if it % args.log_period == 0 or it == args.max_iter:
            loss = float(metrics["loss"])
            rate = it / (time.time() - t0)
            print(f"iter {it}/{args.max_iter} loss={loss:.4f} ({rate:.2f} it/s)",
                  flush=True)
        if it % args.checkpoint_period == 0 or it == args.max_iter:
            save_params(
                ckpt_dir,
                {"params": state.params, "batch_stats": state.batch_stats},
                step=it,
            )
            print(f"checkpoint saved at {it}", flush=True)


if __name__ == "__main__":
    main()
