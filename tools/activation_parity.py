"""Activation-level parity harness: flax MaskRefiner vs a torch
re-execution of the reference layer semantics.

SURVEY §7 step 2 / hard part 5: given a torch state dict in the reference
detectron2 layout (a real checkpoint, or --random to round-trip a freshly
initialized flax tree through export_mask_refiner), this driver

  1. re-executes the reference forward in plain torch, directly from the
     state-dict tensors, following the reference code:
     DeepLabStem + bottleneck stages w/ stride_in_1x1 + res5 multigrid
     (/root/reference/maskrefiner/modeling/backbone/resnet.py:24-66,
     440-518; detectron2 BottleneckBlock semantics), per-stage RGBD fusion
     (:472-506), DeepLabV3+ decoder with ASPP image pooling, and the
     hierarchical 5-head InsEmbedHead (mask_refiner/model.py:461-764);
  2. runs the flax model with capture_intermediates on the same input;
  3. compares per-stage activations (stems, each res stage per trunk,
     fused features, ASPP/decoder, each head feature, each logit) and
     writes a JSON report.

    python tools/activation_parity.py --random --out parity_report.json
    python tools/activation_parity.py --torch model_final.pth \
        --config configs/... --out parity_report.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------------------
# torch functional re-execution of the reference semantics
# ---------------------------------------------------------------------------


class TorchRef:
    """Executes the reference MaskRefiner forward from a state dict."""

    def __init__(self, sd, cfg):
        import torch

        self.t = torch
        self.sd = {k: torch.from_numpy(np.asarray(v)).float() for k, v in sd.items()}
        self.cfg = cfg
        self.acts = {}

    # -- primitive layers ---------------------------------------------------
    def conv(self, x, key, stride=1, dilation=1, groups=1):
        import torch.nn.functional as F

        w = self.sd[f"{key}.weight"]
        b = self.sd.get(f"{key}.bias")
        pad = dilation * (w.shape[-1] - 1) // 2
        return F.conv2d(x, w, b, stride=stride, padding=pad,
                        dilation=dilation, groups=groups)

    def norm(self, x, key, kind):
        import torch.nn.functional as F

        if kind == "GN":
            return F.group_norm(x, 32, self.sd[f"{key}.weight"],
                                self.sd[f"{key}.bias"], eps=1e-5)
        # FrozenBN / eval BN: (x - mean)/sqrt(var+eps)*w + b
        w, b = self.sd[f"{key}.weight"], self.sd[f"{key}.bias"]
        m, v = self.sd[f"{key}.running_mean"], self.sd[f"{key}.running_var"]
        scale = w / (v + 1e-5).sqrt()
        return x * scale[None, :, None, None] + (b - m * scale)[None, :, None, None]

    def conv_norm_relu(self, x, key, kind, stride=1, dilation=1, groups=1,
                       relu=True):
        import torch.nn.functional as F

        x = self.conv(x, key, stride, dilation, groups)
        if kind:
            x = self.norm(x, f"{key}.norm", kind)
        return F.relu(x) if relu else x

    # -- backbone -----------------------------------------------------------
    def stem(self, x, pfx, norm):
        import torch.nn.functional as F

        # DeepLabStem (resnet.py:24-75): three 3x3 convs (first stride 2)
        # then maxpool 3x3 s2 p1
        x = self.conv_norm_relu(x, f"{pfx}.stem.conv1", norm, stride=2)
        x = self.conv_norm_relu(x, f"{pfx}.stem.conv2", norm)
        x = self.conv_norm_relu(x, f"{pfx}.stem.conv3", norm)
        return F.max_pool2d(x, 3, stride=2, padding=1)

    def bottleneck(self, x, key, norm, stride, dilation):
        import torch.nn.functional as F

        # detectron2 BottleneckBlock with stride_in_1x1=True (default; the
        # reference configs never override it)
        s1, s2 = stride, 1
        y = self.conv_norm_relu(x, f"{key}.conv1", norm, stride=s1)
        y = self.conv_norm_relu(y, f"{key}.conv2", norm, stride=s2,
                                dilation=dilation)
        y = self.conv_norm_relu(y, f"{key}.conv3", norm, relu=False)
        if f"{key}.shortcut.weight" in self.sd:
            sc = self.conv_norm_relu(x, f"{key}.shortcut", norm, stride=stride,
                                     relu=False)
        else:
            sc = x
        return F.relu(y + sc)

    def trunk(self, x, pfx, stage_prefix, tag):
        cfg = self.cfg
        norm = cfg.backbone_norm
        x = self.stem(x, pfx, norm)
        self.acts[f"{tag}_stem"] = x
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[cfg.resnet_depth]
        out = {}
        for s, n in zip(range(2, 6), blocks):
            # stage dilation/stride (resnet.py:394-443): res5 dilation 2
            # with multigrid (1,2,4); first_stride 2 for res3/res4, 1 for
            # res2 and dilated res5
            if s == 5:
                multi_grid = getattr(cfg, "res5_multi_grid", (1, 2, 4))
                dil_per_block = [2 * mg for mg in multi_grid]
                stride = 1
            else:
                dil_per_block = [1] * n
                stride = 1 if s == 2 else 2
            for b in range(n):
                x = self.bottleneck(
                    x, f"{pfx}.{stage_prefix}res{s}.{b}", norm,
                    stride if b == 0 else 1, dil_per_block[b % len(dil_per_block)],
                )
            self.acts[f"{tag}_res{s}"] = x
            out[f"res{s}"] = x
        return out

    def backbone(self, images, offset_enc):
        t, cfg = self.t, self.cfg
        rgb = t.cat([images[:, :3], offset_enc], dim=1)
        depth = t.cat([images[:, 3:6], offset_enc], dim=1)
        rgb_out = self.trunk(rgb, "backbone.rgb_backbone", "", "rgb")
        depth_out = self.trunk(depth, "backbone.depth_backbone", "depth_", "depth")
        import torch.nn.functional as F

        fused = {}
        for f in cfg.in_features:
            if cfg.fusion_strategy == "concat":
                y = t.cat([rgb_out[f], depth_out[f]], dim=1)
                y = F.relu(F.group_norm(
                    self.conv(y, f"backbone.fusion_{f}.conv"), 32,
                    self.sd[f"backbone.fusion_{f}.gn.weight"],
                    self.sd[f"backbone.fusion_{f}.gn.bias"], eps=1e-5))
            else:
                y = rgb_out[f] + depth_out[f]
            if f != "res5":
                for i in range(cfg.num_backbone_fusion_layers):
                    y = F.relu(F.group_norm(
                        self.conv(y, f"backbone.fusion_{f}.conv{i}"), 32,
                        self.sd[f"backbone.fusion_{f}.gn{i}.weight"],
                        self.sd[f"backbone.fusion_{f}.gn{i}.bias"], eps=1e-5))
            fused[f] = y
            self.acts[f"fused_{f}"] = y
        return fused

    # -- head ---------------------------------------------------------------
    def aspp(self, x, key):
        import torch.nn.functional as F

        cfg, t = self.cfg, self.t
        norm = cfg.norm
        h, w = x.shape[2:]
        outs = [self.conv_norm_relu(x, f"{key}.convs.0", norm)]
        for i, d in enumerate(cfg.aspp_dilations):
            outs.append(self.conv_norm_relu(x, f"{key}.convs.{i + 1}", norm,
                                            dilation=d))
        # image pooling branch: AdaptiveAvgPool2d(1) + 1x1 conv + relu
        # (detectron2 aspp.py; no norm on the pool conv)
        p = x.mean(dim=(2, 3), keepdim=True)
        p = F.relu(self.conv(p, f"{key}.convs.4.1"))
        p = F.interpolate(p, size=(h, w), mode="bilinear", align_corners=False)
        outs.append(p)
        y = t.cat(outs, dim=1)
        return self.conv_norm_relu(y, f"{key}.project", norm)
        # (aspp dropout is inference-inactive)

    def decoder(self, features):
        import torch.nn.functional as F

        cfg = self.cfg
        head, norm = "ins_embed_head", cfg.norm
        names = list(cfg.in_features)
        y = None
        for f in reversed(names):
            x = features[f]
            if y is None:
                y = self.aspp(x, f"{head}.decoder.{f}.project_conv")
                self.acts["aspp"] = y
            else:
                proj = self.conv_norm_relu(x, f"{head}.decoder.{f}.project_conv", norm)
                y = F.interpolate(y, size=proj.shape[2:], mode="bilinear",
                                  align_corners=False)
                y = self.t.cat([proj, y], dim=1)
                y = self.conv_norm_relu(y, f"{head}.decoder.{f}.fuse_conv.0", norm)
                y = self.conv_norm_relu(y, f"{head}.decoder.{f}.fuse_conv.1", norm)
        self.acts["decoder"] = y
        return y

    def pred_head(self, y, name):
        cfg = self.cfg
        head, norm = "ins_embed_head", cfg.norm
        k = f"{head}.{name}_pred_head.head"
        if cfg.head_depthwise_separable:
            c = y.shape[1]
            y = self.conv_norm_relu(y, f"{k}.depthwise", norm, groups=c)
            y = self.conv_norm_relu(y, f"{k}.pointwise", norm)
            return y
        y = self.conv_norm_relu(y, f"{k}.0", norm)
        return self.conv_norm_relu(y, f"{k}.1", norm)

    def predictor(self, feat, name):
        return self.conv(feat, f"ins_embed_head.{name}_predictor.predictor")

    def head(self, y):
        import torch.nn.functional as F

        cfg, t = self.cfg, self.t
        head_names = ["foreground", "center", "offset"]
        if cfg.eee_mask_on:
            head_names.append("eee_mask")
        if cfg.eee_boundary_on:
            head_names.append("eee_boundary")

        feats, outs = {}, {}
        if not cfg.hierarchical_fusion_on:
            for name in head_names:
                feats[name] = self.pred_head(y, name)
                outs[name] = self.predictor(feats[name], name)
        else:
            for i, level in enumerate(cfg.hierarchy):
                if i == 0:
                    for name in level:
                        feats[name] = self.pred_head(y, name)
                        outs[name] = self.predictor(feats[name], name)
                else:
                    y_prime = y
                    if "feat" in cfg.fusion_target:
                        for prev in cfg.hierarchy[i - 1]:
                            y_prime = t.cat([y_prime, feats[prev]], dim=1)
                    if "pred" in cfg.fusion_target:
                        for prev in cfg.hierarchy[i - 1]:
                            o = outs[prev]
                            o = o.softmax(dim=1) if "eee" in prev else o.sigmoid()
                            y_prime = t.cat([y_prime, o], dim=1)
                    # FusionLayers (model.py:424-458): 1x1 + BN + relu then
                    # N x (3x3 + BN + relu)
                    fk = f"ins_embed_head.fusion_layers_{i}.fusion_layers"
                    z = self.conv_norm_relu(y_prime, f"{fk}.0", "FrozenBN")
                    for j in range(cfg.num_head_fusion_layers):
                        z = self.conv_norm_relu(z, f"{fk}.{j + 1}", "FrozenBN")
                    for name in level:
                        feats[name] = self.pred_head(z, name)
                        outs[name] = self.predictor(feats[name], name)
        for name in head_names:
            self.acts[f"{name}_feat"] = feats[name]
        # inference upsample (model.py:689-709); offset scaled by stride
        for name in head_names:
            o = F.interpolate(outs[name], scale_factor=cfg.common_stride,
                              mode="bilinear", align_corners=False)
            if name == "offset":
                o = o * cfg.common_stride
            outs[name] = o
            self.acts[f"{name}_logit"] = o
        return outs

    def forward(self, images, offset_enc):
        """images [B,6,H,W] raw 0..255; offset_enc [B,3,H,W]."""
        mean = self.t.tensor(list(self.cfg.pixel_mean), dtype=self.t.float32)
        std = self.t.tensor(list(self.cfg.pixel_std), dtype=self.t.float32)
        x = (images - mean[None, :, None, None]) / std[None, :, None, None]
        feats = self.backbone(x, offset_enc)
        y = self.decoder(feats)
        return self.head(y)


# ---------------------------------------------------------------------------
# flax side: capture matching intermediates
# ---------------------------------------------------------------------------


def flax_activations(variables, cfg, images_nhwc, offset_nhwc):
    import jax
    import jax.numpy as jnp

    from quber_tpu.models import MaskRefiner

    model = MaskRefiner(cfg)
    out, state = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        jnp.asarray(images_nhwc), jnp.asarray(offset_nhwc),
        capture_intermediates=True,
    )
    inter = state["intermediates"]

    def get(*path):
        node = inter
        for p in path:
            if p not in node:
                return None
            node = node[p]
        return np.asarray(node["__call__"][0]) if "__call__" in node else None

    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[cfg.resnet_depth]
    acts = {}
    for tag, trunk in (("rgb", "rgb_trunk"), ("depth", "depth_trunk")):
        acts[f"{tag}_stem"] = get("backbone", trunk, "stem")
        for s, n in zip(range(2, 6), blocks):
            acts[f"{tag}_res{s}"] = get("backbone", trunk, f"res{s}_{n - 1}")
    # fused features: the backbone __call__ output is a dict
    node = inter["backbone"]["__call__"][0]
    for f in cfg.in_features:
        acts[f"fused_{f}"] = np.asarray(node[f])
    acts["aspp"] = get("ins_embed_head", "decoder", f"aspp_{cfg.in_features[-1]}")
    acts["decoder"] = get("ins_embed_head", "decoder")
    head_names = ["foreground", "center", "offset"]
    if cfg.eee_mask_on:
        head_names.append("eee_mask")
    if cfg.eee_boundary_on:
        head_names.append("eee_boundary")
    for name in head_names:
        acts[f"{name}_feat"] = get("ins_embed_head", f"{name}_head")
        acts[f"{name}_logit"] = np.asarray(out[name])
    return acts


def compare(torch_acts, flax_acts, atol):
    report = {}
    for key, tv in torch_acts.items():
        fv = flax_acts.get(key)
        if fv is None:
            report[key] = {"status": "missing_in_flax"}
            continue
        tv = tv.detach().numpy() if hasattr(tv, "detach") else np.asarray(tv)
        if fv.ndim == 4:  # NHWC -> NCHW
            fv = np.transpose(fv, (0, 3, 1, 2))
        if tv.shape != fv.shape:
            report[key] = {"status": "shape_mismatch",
                           "torch": list(tv.shape), "flax": list(fv.shape)}
            continue
        diff = np.abs(tv - fv)
        scale = max(1e-6, float(np.abs(tv).max()))
        report[key] = {
            "status": "ok" if diff.max() <= atol * max(1.0, scale) else "DIFF",
            "max_abs": float(diff.max()),
            "mean_abs": float(diff.mean()),
            "ref_max_abs": scale,
            "shape": list(tv.shape),
        }
    return report


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch", help=".pth state dict in reference layout")
    parser.add_argument("--random", action="store_true",
                        help="round-trip a random flax init through "
                             "export_mask_refiner instead")
    parser.add_argument("--config", default="configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml")
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--atol", type=float, default=3e-4,
                        help="relative-to-peak tolerance per stage (f32)")
    parser.add_argument("--out", default="parity_report.json")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")

    from quber_tpu.config import load_config
    from quber_tpu.models import MaskRefiner
    from quber_tpu.models.import_torch import (
        export_mask_refiner,
        import_mask_refiner,
        load_torch_checkpoint,
    )

    cfg, _ = load_config(args.config)
    cfg = dataclasses.replace(cfg, height=args.height, width=args.width)

    if args.random or not args.torch:
        import jax.numpy as jnp

        model = MaskRefiner(cfg)
        variables = model.init(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((1, args.height, args.width, 6)),
            jnp.zeros((1, args.height, args.width, 3)),
        )
        sd = export_mask_refiner(variables, cfg)
    else:
        sd = load_torch_checkpoint(args.torch)
        variables = import_mask_refiner(sd, cfg)

    rng = np.random.RandomState(args.seed)
    images = (rng.rand(1, args.height, args.width, 6) * 255).astype(np.float32)
    offset = rng.rand(1, args.height, args.width, 3).astype(np.float32)

    import torch

    ref = TorchRef(sd, cfg)
    with torch.no_grad():
        ref.forward(torch.from_numpy(np.transpose(images, (0, 3, 1, 2))),
                    torch.from_numpy(np.transpose(offset, (0, 3, 1, 2))))
    flax_acts = flax_activations(variables, cfg, images, offset)
    report = compare(ref.acts, flax_acts, args.atol)

    n_bad = sum(1 for v in report.values() if v.get("status") != "ok")
    with open(args.out, "w") as f:
        json.dump({"config": args.config, "atol": args.atol,
                   "stages": report, "n_stages": len(report),
                   "n_mismatched": n_bad}, f, indent=1)
    width = max(len(k) for k in report)
    for k, v in report.items():
        line = f"{k:<{width}}  {v.get('status'):>6}"
        if "max_abs" in v:
            line += f"  max|d|={v['max_abs']:.3e} (peak {v['ref_max_abs']:.2e})"
        print(line)
    print(f"{len(report) - n_bad}/{len(report)} stages match -> {args.out}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
