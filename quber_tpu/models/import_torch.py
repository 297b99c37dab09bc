"""PyTorch/detectron2 checkpoint import: state_dict -> flax param pytrees.

The reference trains with detectron2 and ships .pth checkpoints; checkpoint
fidelity is SURVEY §7 hard part 5 (Conv2d+norm fusion layout, FrozenBN
semantics, the `depth_` stage-name prefixing at
/root/reference/maskrefiner/modeling/backbone/resnet.py:132,169). This module
provides:

  * tensor converters (OIHW -> HWIO, depthwise group layout, linear
    transpose) — numerically verified against torch in tests
  * `import_mask_refiner(state_dict, config)`: full key mapping from the
    detectron2 MaskRefiner layout onto quber_tpu.models.MaskRefiner
  * `export_mask_refiner(params)`: the inverse (for round-trip testing and
    for users moving back)

Weights are loaded with `torch.load(..., map_location="cpu")` by the caller;
this module only sees a {key: np.ndarray} dict.
"""

from __future__ import annotations

import numpy as np


def conv_kernel(t: np.ndarray) -> np.ndarray:
    """torch Conv2d [O, I/g, kh, kw] -> flax HWIO [kh, kw, I/g, O]."""
    return np.transpose(t, (2, 3, 1, 0))


def conv_kernel_inv(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (3, 2, 0, 1))


def linear_kernel(t: np.ndarray) -> np.ndarray:
    """torch Linear [O, I] -> flax [I, O]."""
    return np.transpose(t)


def norm_params(sd: dict, prefix: str, kind: str) -> dict:
    """detectron2 norm sub-keys -> flax module params.

    kind: 'GN' (GroupNorm scale/bias), 'FrozenBN' (4 frozen arrays),
    'BN' (scale/bias here; running stats go to batch_stats separately).
    """
    if kind == "GN":
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    if kind == "FrozenBN":
        return {
            "frozen_weight": sd[f"{prefix}.weight"],
            "frozen_bias": sd[f"{prefix}.bias"],
            "frozen_mean": sd[f"{prefix}.running_mean"],
            "frozen_var": sd[f"{prefix}.running_var"],
        }
    if kind == "BN":
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    raise ValueError(kind)


def bn_stats(sd: dict, prefix: str) -> dict:
    return {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}


NORM_MODULE = {"GN": "GroupNorm_0", "FrozenBN": "FrozenBatchNorm_0", "BN": "BatchNorm_0"}


class _Builder:
    """Accumulates params/batch_stats trees from (path, value) inserts."""

    def __init__(self, sd: dict):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: dict = {}
        self.batch_stats: dict = {}
        self.used: set = set()

    def _insert(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        if isinstance(value, dict):
            node.setdefault(path[-1], {}).update(
                {k: np.asarray(v) for k, v in value.items()}
            )
        else:
            node[path[-1]] = np.asarray(value)

    def conv(self, flax_path: list, torch_key: str, norm: str | None = None,
             bias: bool | None = None):
        """Map a detectron2 Conv2d(+fused norm) onto a ConvNorm module."""
        w = self.sd[f"{torch_key}.weight"]
        self._insert(self.params, flax_path + ["conv", "kernel"], conv_kernel(w))
        self.used.add(f"{torch_key}.weight")
        if bias is None:
            bias = f"{torch_key}.bias" in self.sd
        if bias:
            self._insert(self.params, flax_path + ["conv", "bias"], self.sd[f"{torch_key}.bias"])
            self.used.add(f"{torch_key}.bias")
        if norm:
            nmod = NORM_MODULE[norm]
            self._insert(self.params, flax_path + [nmod],
                         norm_params(self.sd, f"{torch_key}.norm", norm))
            for suffix in (["weight", "bias"] if norm == "GN"
                           else ["weight", "bias", "running_mean", "running_var"]):
                self.used.add(f"{torch_key}.norm.{suffix}")
            if norm == "BN":
                self._insert(self.batch_stats, flax_path + [nmod],
                             bn_stats(self.sd, f"{torch_key}.norm"))


def _map_trunk(b: _Builder, flax_trunk: str, torch_trunk: str, stage_prefix: str,
               norm: str = "FrozenBN", depth: int = 50):
    """One DeepLab-ResNet trunk (stem + res2..res5).

    stage_prefix handles the reference's depth-trunk naming where stages are
    'depth_res2'... while the stem stays unprefixed (resnet.py:169)."""
    for i in (1, 2, 3):
        b.conv(["backbone", flax_trunk, "stem", f"conv{i}"],
               f"{torch_trunk}.stem.conv{i}", norm)
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    for s, n in zip(range(2, 6), blocks):
        for blk in range(n):
            tb = f"{torch_trunk}.{stage_prefix}res{s}.{blk}"
            fb = ["backbone", flax_trunk, f"res{s}_{blk}"]
            for c in ("conv1", "conv2", "conv3"):
                b.conv(fb + [c], f"{tb}.{c}", norm)
            if f"{tb}.shortcut.weight" in b.sd:
                b.conv(fb + ["shortcut"], f"{tb}.shortcut", norm)


def import_mask_refiner(state_dict: dict, config=None) -> dict:
    """detectron2 MaskRefiner state_dict -> {'params': ..., 'batch_stats': ...}.

    Mapped components: RGB/depth trunks (+depth_ prefix), per-stage fusion
    convs, DeepLabV3+ decoder (ASPP convs.0-4 + project), the five
    SinglePredictionHeads + 1x1 predictors, and hierarchical FusionLayers
    (BatchNorm stats included).
    """
    from quber_tpu.models.mask_refiner import MaskRefinerConfig

    cfg = config or MaskRefinerConfig()
    b = _Builder(state_dict)

    _map_trunk(b, "rgb_trunk", "backbone.rgb_backbone", "", cfg.backbone_norm)
    _map_trunk(b, "depth_trunk", "backbone.depth_backbone", "depth_", cfg.backbone_norm)

    for f in cfg.in_features:
        t = f"backbone.fusion_{f}"
        if cfg.fusion_strategy == "concat":
            b.conv(["backbone", f"fusion_{f}_reduce"], f"{t}.conv", None, bias=True)
            b._insert(b.params, ["backbone", f"fusion_{f}_reduce", "GroupNorm_0"],
                      {"scale": b.sd[f"{t}.gn.weight"], "bias": b.sd[f"{t}.gn.bias"]})
        if f != "res5":
            for i in range(cfg.num_backbone_fusion_layers):
                b.conv(["backbone", f"fusion_{f}_conv{i}"], f"{t}.conv{i}", None, bias=True)
                b._insert(b.params, ["backbone", f"fusion_{f}_conv{i}", "GroupNorm_0"],
                          {"scale": b.sd[f"{t}.gn{i}.weight"], "bias": b.sd[f"{t}.gn{i}.bias"]})

    head = "ins_embed_head"
    norm = cfg.norm
    # decoder: ASPP on the deepest feature
    deep = cfg.in_features[-1]
    aspp_t = f"{head}.decoder.{deep}.project_conv"
    aspp_f = [head, "decoder", f"aspp_{deep}"]
    b.conv(aspp_f + ["conv1x1"], f"{aspp_t}.convs.0", norm)
    for i in range(len(cfg.aspp_dilations)):
        b.conv(aspp_f + [f"conv3x3_{i}"], f"{aspp_t}.convs.{i + 1}", norm)
    b.conv(aspp_f + ["pool_conv"], f"{aspp_t}.convs.4.1", None, bias=True)
    b.conv(aspp_f + ["project"], f"{aspp_t}.project", norm)
    # decoder: project + fuse for the shallower features
    for f in cfg.in_features[:-1]:
        b.conv([head, "decoder", f"project_{f}"], f"{head}.decoder.{f}.project_conv", norm)
        for j in (0, 1):
            b.conv([head, "decoder", f"fuse_{f}_{j}"], f"{head}.decoder.{f}.fuse_conv.{j}", norm)

    # prediction heads + predictors
    head_names = ["foreground", "center", "offset"]
    if cfg.eee_mask_on:
        head_names.append("eee_mask")
    if cfg.eee_boundary_on:
        head_names.append("eee_boundary")
    for name in head_names:
        if cfg.head_depthwise_separable:
            # detectron2 DepthwiseSeparableConv2d: head.depthwise (5x5
            # grouped) + head.pointwise (1x1), each with a fused norm
            # (reference model.py:372-383)
            for part in ("depthwise", "pointwise"):
                b.conv([head, f"{name}_head", "dws", part],
                       f"{head}.{name}_pred_head.head.{part}", norm)
        else:
            for j in (0, 1):
                b.conv([head, f"{name}_head", f"conv{j}"], f"{head}.{name}_pred_head.head.{j}", norm)
        b._insert(b.params, [head, f"{name}_predictor"], {
            "kernel": conv_kernel(b.sd[f"{head}.{name}_predictor.predictor.weight"]),
            "bias": b.sd[f"{head}.{name}_predictor.predictor.bias"],
        })

    # hierarchical fusion layers (BatchNorm)
    if cfg.hierarchical_fusion_on:
        for i in range(1, len(cfg.hierarchy)):
            t = f"{head}.fusion_layers_{i}.fusion_layers"
            b.conv([head, f"fusion_{i}", "reduce"], f"{t}.0", "BN", bias=True)
            for j in range(cfg.num_head_fusion_layers):
                b.conv([head, f"fusion_{i}", f"conv{j}"], f"{t}.{j + 1}", "BN", bias=True)

    return {"params": b.params, "batch_stats": b.batch_stats}


def export_mask_refiner(variables: dict, config=None) -> dict:
    """Inverse mapping: flax variables -> detectron2-layout state dict.

    Used for round-trip testing of the importer and for exporting trained
    TPU checkpoints back to the reference's format.
    """
    from quber_tpu.models.mask_refiner import MaskRefinerConfig

    cfg = config or MaskRefinerConfig()
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = {}

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    def put_conv(flax_path, torch_key, norm=None):
        mod = get(params, flax_path)
        sd[f"{torch_key}.weight"] = conv_kernel_inv(np.asarray(mod["conv"]["kernel"]))
        if "bias" in mod["conv"]:
            sd[f"{torch_key}.bias"] = np.asarray(mod["conv"]["bias"])
        if norm:
            nmod = mod[NORM_MODULE[norm]]
            if norm == "GN":
                sd[f"{torch_key}.norm.weight"] = np.asarray(nmod["scale"])
                sd[f"{torch_key}.norm.bias"] = np.asarray(nmod["bias"])
            elif norm == "FrozenBN":
                sd[f"{torch_key}.norm.weight"] = np.asarray(nmod["frozen_weight"])
                sd[f"{torch_key}.norm.bias"] = np.asarray(nmod["frozen_bias"])
                sd[f"{torch_key}.norm.running_mean"] = np.asarray(nmod["frozen_mean"])
                sd[f"{torch_key}.norm.running_var"] = np.asarray(nmod["frozen_var"])
            elif norm == "BN":
                sd[f"{torch_key}.norm.weight"] = np.asarray(nmod["scale"])
                sd[f"{torch_key}.norm.bias"] = np.asarray(nmod["bias"])
                st = get(stats, flax_path)[NORM_MODULE[norm]]
                sd[f"{torch_key}.norm.running_mean"] = np.asarray(st["mean"])
                sd[f"{torch_key}.norm.running_var"] = np.asarray(st["var"])

    norm = cfg.backbone_norm
    for flax_trunk, torch_trunk, sp in [
        ("rgb_trunk", "backbone.rgb_backbone", ""),
        ("depth_trunk", "backbone.depth_backbone", "depth_"),
    ]:
        for i in (1, 2, 3):
            put_conv(["backbone", flax_trunk, "stem", f"conv{i}"],
                     f"{torch_trunk}.stem.conv{i}", norm)
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[cfg.resnet_depth]
        for s, n in zip(range(2, 6), blocks):
            for blk in range(n):
                fb = ["backbone", flax_trunk, f"res{s}_{blk}"]
                tb = f"{torch_trunk}.{sp}res{s}.{blk}"
                for c in ("conv1", "conv2", "conv3"):
                    put_conv(fb + [c], f"{tb}.{c}", norm)
                if "shortcut" in get(params, fb):
                    put_conv(fb + ["shortcut"], f"{tb}.shortcut", norm)

    for f in cfg.in_features:
        t = f"backbone.fusion_{f}"
        if cfg.fusion_strategy == "concat":
            mod = get(params, ["backbone", f"fusion_{f}_reduce"])
            sd[f"{t}.conv.weight"] = conv_kernel_inv(np.asarray(mod["conv"]["kernel"]))
            sd[f"{t}.conv.bias"] = np.asarray(mod["conv"]["bias"])
            sd[f"{t}.gn.weight"] = np.asarray(mod["GroupNorm_0"]["scale"])
            sd[f"{t}.gn.bias"] = np.asarray(mod["GroupNorm_0"]["bias"])
        if f != "res5":
            for i in range(cfg.num_backbone_fusion_layers):
                mod = get(params, ["backbone", f"fusion_{f}_conv{i}"])
                sd[f"{t}.conv{i}.weight"] = conv_kernel_inv(np.asarray(mod["conv"]["kernel"]))
                sd[f"{t}.conv{i}.bias"] = np.asarray(mod["conv"]["bias"])
                sd[f"{t}.gn{i}.weight"] = np.asarray(mod["GroupNorm_0"]["scale"])
                sd[f"{t}.gn{i}.bias"] = np.asarray(mod["GroupNorm_0"]["bias"])

    head, hnorm = "ins_embed_head", cfg.norm
    deep = cfg.in_features[-1]
    aspp_t = f"{head}.decoder.{deep}.project_conv"
    aspp_f = [head, "decoder", f"aspp_{deep}"]
    put_conv(aspp_f + ["conv1x1"], f"{aspp_t}.convs.0", hnorm)
    for i in range(len(cfg.aspp_dilations)):
        put_conv(aspp_f + [f"conv3x3_{i}"], f"{aspp_t}.convs.{i + 1}", hnorm)
    put_conv(aspp_f + ["pool_conv"], f"{aspp_t}.convs.4.1")
    put_conv(aspp_f + ["project"], f"{aspp_t}.project", hnorm)
    for f in cfg.in_features[:-1]:
        put_conv([head, "decoder", f"project_{f}"], f"{head}.decoder.{f}.project_conv", hnorm)
        for j in (0, 1):
            put_conv([head, "decoder", f"fuse_{f}_{j}"], f"{head}.decoder.{f}.fuse_conv.{j}", hnorm)

    head_names = ["foreground", "center", "offset"]
    if cfg.eee_mask_on:
        head_names.append("eee_mask")
    if cfg.eee_boundary_on:
        head_names.append("eee_boundary")
    for name in head_names:
        if cfg.head_depthwise_separable:
            for part in ("depthwise", "pointwise"):
                put_conv([head, f"{name}_head", "dws", part],
                         f"{head}.{name}_pred_head.head.{part}", hnorm)
        else:
            for j in (0, 1):
                put_conv([head, f"{name}_head", f"conv{j}"], f"{head}.{name}_pred_head.head.{j}", hnorm)
        pred = get(params, [head, f"{name}_predictor"])
        sd[f"{head}.{name}_predictor.predictor.weight"] = conv_kernel_inv(np.asarray(pred["kernel"]))
        sd[f"{head}.{name}_predictor.predictor.bias"] = np.asarray(pred["bias"])

    if cfg.hierarchical_fusion_on:
        for i in range(1, len(cfg.hierarchy)):
            t = f"{head}.fusion_layers_{i}.fusion_layers"
            put_conv([head, f"fusion_{i}", "reduce"], f"{t}.0", "BN")
            for j in range(cfg.num_head_fusion_layers):
                put_conv([head, f"fusion_{i}", f"conv{j}"], f"{t}.{j + 1}", "BN")
    return sd


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth/.pkl into a flat {key: np.ndarray} dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj.get("state_dict", obj)) if isinstance(obj, dict) else obj
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
