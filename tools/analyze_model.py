"""Model analysis CLI: parameters, FLOPs, network-only speed.

Equivalent of the reference's fvcore analysis driver
(/root/reference/tools/analyze_model.py) plus its BENCHMARK_NETWORK_SPEED
mode (maskrefiner/config.py:101-102):

    python tools/analyze_model.py --config-file configs/...yaml \
        [--depth 3] [--speed] [--height 480 --width 640]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-file", default="configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml")
    parser.add_argument("--depth", type=int, default=3, help="param table depth")
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--speed", action="store_true",
                        help="run the network-only speed benchmark")
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from quber_tpu.config import load_config
    from quber_tpu.models import MaskRefiner
    from quber_tpu.profiling import benchmark_network_speed, cost_analysis, parameter_count_table

    model_cfg, _ = load_config(args.config_file)
    model_cfg = dataclasses.replace(
        model_cfg,
        height=args.height or model_cfg.height,
        width=args.width or model_cfg.width,
        dtype=args.dtype,
    )
    model = MaskRefiner(model_cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 6 if model_cfg.depth_on and model_cfg.rgb_on else 3)),
        jnp.zeros((1, 64, 64, 3)) if model_cfg.offset_input_on else None,
    )
    print(parameter_count_table(params["params"] if "params" in params else params,
                                depth=args.depth))

    h, w = model_cfg.height, model_cfg.width
    c = 6 if (model_cfg.rgb_on and model_cfg.depth_on) else 3
    image = jnp.zeros((1, h, w, c))
    offsets = jnp.zeros((1, h, w, 3)) if model_cfg.offset_input_on else None

    def fwd(p, im, of):
        return model.apply(p, im, of)

    costs = cost_analysis(fwd, params, image, offsets)
    print(f"\nforward cost at {h}x{w}: {costs['gflops']:.1f} GFLOPs, "
          f"{(costs['bytes_accessed'] or 0) / 1e9:.2f} GB accessed")

    if args.speed:
        stats = benchmark_network_speed(fwd, params, image, offsets)
        print(f"network-only: {stats['mean_ms']:.1f} ms +- {stats['std_ms']:.1f} "
              f"({stats['fps']:.1f} FPS) [includes transport sync overhead]")


if __name__ == "__main__":
    main()
