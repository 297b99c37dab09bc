"""Single-image refinement entry point (reference predict.py equivalent).

    python predict.py --rgb img.png --depth depth.png --masks masks.npy \
        [--config-file ...] [--weights ckpt_dir] [--out vis.png]

masks.npy: [N, H, W] (bool or uint8) initial instance masks.
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rgb", required=True)
    parser.add_argument("--depth", default=None)
    parser.add_argument("--masks", required=True)
    parser.add_argument("--config-file", default="configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--out", default="refined.png")
    args = parser.parse_args()

    import cv2
    import numpy as np

    from quber_tpu.config import load_config
    from quber_tpu.ops.preprocess import inpaint_depth, normalize_depth
    from quber_tpu.predictor import MaskRefinerPredictor
    from quber_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()  # warm reruns skip the ~40 s pipeline compile
    model_cfg, _ = load_config(args.config_file)
    from quber_tpu.train.checkpoint import load_default_params

    params = load_default_params(args.weights)
    predictor = MaskRefinerPredictor(model_cfg, params)

    h, w = model_cfg.height, model_cfg.width
    rgb = cv2.resize(cv2.imread(args.rgb), (w, h))
    if args.depth:
        import imageio.v2 as imageio

        depth = np.asarray(imageio.imread(args.depth))
        depth = normalize_depth(depth)
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
        depth = inpaint_depth(depth)
    else:
        depth = np.zeros((h, w, 3), np.uint8)
    masks = np.load(args.masks) > 0
    masks = np.asarray([
        cv2.resize(m.astype(np.uint8), (w, h), interpolation=cv2.INTER_NEAREST)
        for m in masks
    ])

    pan, count, scores = predictor.predict_packed(rgb, depth, masks)
    print(f"refined {len(masks)} -> {count} instances; "
          f"scores: {np.round(scores[1:count + 1], 3)}")

    rng = np.random.RandomState(1)
    colors = rng.randint(0, 255, (count + 1, 3), np.uint8)
    colors[0] = 0
    overlay = (0.5 * rgb + 0.5 * colors[pan]).astype(np.uint8)
    cv2.imwrite(args.out, overlay)
    print(f"visualization saved to {args.out}")


if __name__ == "__main__":
    main()
