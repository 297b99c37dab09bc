"""Batch visualization demo (reference demo/demo.py equivalent).

Walks a folder of RGB(+depth) images, runs a base segmenter + the QuBER
refiner with the double-buffered streaming predictor (the TPU-native
equivalent of the reference's AsyncPredictor, demo/predictor.py:131-218),
and writes side-by-side visualizations.

    python demo.py --input "imgs/*.png" --output vis/ \
        [--depth-dir depths/] [--base-model gt|empty|...] [--weights ckpt]
"""

import argparse
import glob
import os


def colorize(label, seed=1):
    import numpy as np

    rng = np.random.RandomState(seed)
    colors = rng.randint(0, 255, (int(label.max()) + 1, 3), np.uint8)
    colors[0] = 0
    return colors[label]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="glob of RGB images")
    parser.add_argument("--output", default="./demo_vis")
    parser.add_argument("--depth-dir", default=None)
    parser.add_argument("--config-file", default="configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--base-model", default="empty")
    parser.add_argument("--batch-size", type=int, default=4)
    args = parser.parse_args()

    import cv2
    import numpy as np

    from quber_tpu.config import load_config
    from quber_tpu.evaluation.base_models import build_base_model
    from quber_tpu.ops.preprocess import inpaint_depth, normalize_depth
    from quber_tpu.predictor import MaskRefinerPredictor
    from quber_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()  # warm reruns skip the ~40 s pipeline compile
    model_cfg, _ = load_config(args.config_file)
    from quber_tpu.train.checkpoint import load_default_params

    params = load_default_params(args.weights)
    predictor = MaskRefinerPredictor(model_cfg, params)
    base = build_base_model(args.base_model, "OSD")
    os.makedirs(args.output, exist_ok=True)

    paths = sorted(glob.glob(args.input))
    h, w = model_cfg.height, model_cfg.width

    def frames():
        for p in paths:
            rgb = cv2.resize(cv2.imread(p), (w, h))
            depth_path = (
                os.path.join(args.depth_dir, os.path.basename(p))
                if args.depth_dir else None
            )
            if depth_path and os.path.exists(depth_path):
                import imageio.v2 as imageio

                depth = normalize_depth(np.asarray(imageio.imread(depth_path)))
                depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
                depth = inpaint_depth(depth)
            else:
                depth = np.zeros((h, w, 3), np.uint8)
            masks, _, _ = base.predict(p, depth_path or "")
            yield (rgb, depth, list(masks))

    results = predictor.predict_batch_stream(frames(), batch_size=args.batch_size)
    for path, (pan, count, scores) in zip(paths, results):
        rgb = cv2.resize(cv2.imread(path), (w, h))
        overlay = (0.5 * rgb + 0.5 * colorize(pan)).astype(np.uint8)
        canvas = np.concatenate([rgb, overlay], axis=1)
        out = os.path.join(args.output, os.path.basename(path))
        cv2.imwrite(out, canvas)
        print(f"{os.path.basename(path)}: {count} instances -> {out}")


if __name__ == "__main__":
    main()
