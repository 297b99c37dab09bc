"""Configuration: native YAML configs + detectron2-YAML translation.

The reference drives everything through layered detectron2 CfgNode YAML with
`_BASE_` inheritance (/root/reference/maskrefiner/config.py, configs/ tree).
Here the single source of truth is the `MaskRefinerConfig` dataclass
(quber_tpu.models.mask_refiner); this module provides:

  * load_config(path): native flat YAML (dataclass field names) with _BASE_
    inheritance, mirroring the reference's config layering style.
  * from_detectron2_yaml(path): reads a reference-format config file (e.g.
    configs/uoais-sim/instance-segmentation/mask-refiner-*.yaml) and maps the
    detectron2 keys onto MaskRefinerConfig, so users can carry their existing
    ablation grid over unchanged.
  * TrainConfig: solver/schedule settings (Base-Mask-Refiner.yaml SOLVER).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import yaml

from quber_tpu.models.mask_refiner import MaskRefinerConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    optimizer: str = "adam"          # SOLVER.OPTIMIZER ADAM
    base_lr: float = 0.000125        # SOLVER.BASE_LR
    weight_decay: float = 0.0
    max_iter: int = 90000            # SOLVER.MAX_ITER
    lr_scheduler: str = "warmup_poly"  # WarmupPolyLR
    poly_power: float = 0.9          # detectron2 SOLVER.POLY_LR_POWER default
    warmup_iters: int = 1000         # detectron2 SOLVER.WARMUP_ITERS default
    warmup_factor: float = 1e-3      # detectron2 SOLVER.WARMUP_FACTOR default
    batch_size: int = 8              # SOLVER.IMS_PER_BATCH (flagship b8)
    checkpoint_period: int = 10000   # SOLVER.CHECKPOINT_PERIOD
    eval_period: int = 30000         # TEST.EVAL_PERIOD
    seed: int = 7                    # SEED
    freeze_backbone_stages: int = 0  # BACKBONE.FREEZE_AT
    # data
    gaussian_sigma: int = 10         # INPUT.GAUSSIAN_SIGMA
    small_instance_area: int = 4096
    small_instance_weight: int = 3
    depth_range: tuple = (2500, 15000)  # INPUT.DEPTH_RANGE (mm)
    perlin_distortion: bool = True   # INPUT.PERLIN_DISTORTION_ON
    color_aug_ssd: bool = True       # INPUT.COLOR_AUG_SSD
    copy_paste_prob: float = 0.0     # tools/ours copy-paste aug (opt-in)
    max_instances: int = 64
    # ResizeShortestEdge grid (INPUT.MIN_SIZE_TRAIN / MAX_SIZE_TRAIN);
    # multiple entries enable multi-scale training with bucketed shapes
    min_size_train: tuple = (480,)
    max_size_train: int = 640
    size_divisibility: int = 32


def _deep_update(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_update(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml_with_base(path: str) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    base = data.pop("_BASE_", None)
    if base:
        base_path = os.path.join(os.path.dirname(path), base)
        data = _deep_update(_load_yaml_with_base(base_path), data)
    return data


def load_config(path: str) -> tuple[MaskRefinerConfig, TrainConfig]:
    """Native flat YAML: top-level keys 'model' and 'train' with dataclass
    field names; supports _BASE_ inheritance.

    A path that does not exist on disk but reads as an ablation-grid name
    (mask_refiner_<modality>_<fusion>_l<N>_... — the reference's config
    naming scheme) is decoded by config_from_name, so the whole grid is
    addressable without per-point files."""
    if not os.path.exists(path):
        name = os.path.splitext(os.path.basename(path))[0].replace("-", "_")
        if name.startswith("mask_refiner"):
            return config_from_name(name)
        raise FileNotFoundError(path)
    data = _load_yaml_with_base(path)
    model_kwargs = _coerce(MaskRefinerConfig, data.get("model", {}))
    train_kwargs = _coerce(TrainConfig, data.get("train", {}))
    return MaskRefinerConfig(**model_kwargs), TrainConfig(**train_kwargs)


# the reference encodes its ablation grid in config-file NAMES
# (configs/uoais-sim/instance-segmentation/mask-refiner-*.yaml): modality /
# fusion strategy / backbone-fusion layers / norm / hierarchical fusion /
# hierarchy order (single letters, grouped = same level) / head-fusion
# layers / error type / batch
_HIER_LETTERS = {"m": "eee_mask", "b": "eee_boundary", "f": "foreground",
                 "c": "center", "o": "offset"}


def config_from_name(name: str) -> tuple[MaskRefinerConfig, TrainConfig]:
    """Decode a reference-style grid name into configs.

    Examples: mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8 (the
    flagship), mask_refiner_rgbd_add_l3, mask_refiner_rgb_only,
    mask_refiner_rgbd_concat_l2_gn_hf_fco_m_b_l3_e2_b8 (grouped level).
    Defaults for unnamed axes come from Base-Mask-Refiner.yaml (add/l3/
    GN/e2/b4, no hierarchical fusion).
    """
    tokens = name.replace("-", "_").split("_")
    if tokens[:2] == ["mask", "refiner"]:
        tokens = tokens[2:]
    # Base-Mask-Refiner.yaml defaults for axes the name leaves out
    model: dict[str, Any] = {
        "fusion_strategy": "add",
        "num_backbone_fusion_layers": 3,
        "hierarchical_fusion_on": False,
    }
    train: dict[str, Any] = {"batch_size": 4}
    hierarchy: list[tuple[str, ...]] = []
    seen_hf = False
    for tok in tokens:
        if not tok or tok in ("only", "augmented", "yaml"):
            continue  # "only" consumed with rgb/depth; augmented = dataset
        if tok == "rgbd":
            model["rgb_on"] = model["depth_on"] = True
        elif tok == "rgb":
            model["rgb_on"], model["depth_on"] = True, False
        elif tok == "depth":
            model["rgb_on"], model["depth_on"] = False, True
        elif tok in ("concat", "add"):
            model["fusion_strategy"] = tok
        elif tok in ("gn", "bn", "syncbn"):
            model["norm"] = {"gn": "GN", "bn": "BN", "syncbn": "SyncBN"}[tok]
        elif tok == "hf":
            model["hierarchical_fusion_on"] = True
            seen_hf = True
        elif tok[0] == "l" and tok[1:].isdigit():
            key = ("num_head_fusion_layers" if seen_hf
                   else "num_backbone_fusion_layers")
            model[key] = int(tok[1:])
        elif tok[0] == "e" and tok[1:].isdigit():
            model["error_type"] = tok
        elif tok[0] == "b" and tok[1:].isdigit():
            train["batch_size"] = int(tok[1:])
        elif all(c in _HIER_LETTERS for c in tok):
            hierarchy.append(tuple(_HIER_LETTERS[c] for c in tok))
        else:
            raise ValueError(f"unrecognized grid token {tok!r} in {name!r}")
    if hierarchy:
        model["hierarchy"] = tuple(hierarchy)
        letters = [h for level in hierarchy for h in level]
        model["eee_mask_on"] = "eee_mask" in letters
        model["eee_boundary_on"] = "eee_boundary" in letters
    return MaskRefinerConfig(**model), TrainConfig(**train)


def _coerce(cls, kwargs: dict) -> dict:
    fields = {f.name for f in dataclasses.fields(cls)}
    unknown = set(kwargs) - fields
    if unknown:
        raise ValueError(f"Unknown {cls.__name__} keys: {sorted(unknown)}")
    out = {}
    for k, v in kwargs.items():
        out[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v) if isinstance(v, list) else v
    return out


def _get(d: dict, dotted: str, default: Any = None) -> Any:
    cur = d
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return default
        cur = cur[part]
    return cur


def from_detectron2_yaml(path: str) -> tuple[MaskRefinerConfig, TrainConfig]:
    """Translate a reference-format (detectron2 CfgNode) YAML config.

    Maps the keys consumed by the reference MaskRefiner build path
    (maskrefiner/config.py:6-102, Base-Mask-Refiner.yaml) onto our
    dataclasses. Unknown keys are ignored (detectron2 configs carry many
    engine-only fields)."""
    d = _load_yaml_with_base(path)

    def g(key, default):
        v = _get(d, key, default)
        return v if v is not None else default

    mdefault = MaskRefinerConfig()
    tdefault = TrainConfig()
    hierarchy = g("MODEL.INS_EMBED_HEAD.HIERARCHY", [list(h) for h in mdefault.hierarchy])
    model = MaskRefinerConfig(
        rgb_on=g("INPUT.RGB_ON", True),
        depth_on=g("INPUT.DEPTH_ON", True),
        offset_input_on=g("INPUT.OFFSET_INPUT_ON", True),
        pixel_mean=tuple(g("MODEL.PIXEL_MEAN", list(mdefault.pixel_mean))),
        pixel_std=tuple(g("MODEL.PIXEL_STD", list(mdefault.pixel_std))),
        fusion_strategy=g("MODEL.BACKBONE.FUSION_STRATEGY", "concat"),
        num_backbone_fusion_layers=g("MODEL.BACKBONE.NUM_FUSION_LAYERS", 2),
        backbone_norm=g("MODEL.RESNETS.NORM", "FrozenBN"),
        in_features=tuple(g("MODEL.INS_EMBED_HEAD.IN_FEATURES", list(mdefault.in_features))),
        project_channels=tuple(g("MODEL.INS_EMBED_HEAD.PROJECT_CHANNELS", list(mdefault.project_channels))),
        aspp_channels=g("MODEL.INS_EMBED_HEAD.ASPP_CHANNELS", 256),
        aspp_dilations=tuple(g("MODEL.INS_EMBED_HEAD.ASPP_DILATIONS", [6, 12, 18])),
        aspp_dropout=g("MODEL.INS_EMBED_HEAD.ASPP_DROPOUT", 0.1),
        convs_dim=g("MODEL.INS_EMBED_HEAD.CONVS_DIM", 128),
        head_channels=g("MODEL.INS_EMBED_HEAD.HEAD_CHANNELS", 32),
        common_stride=g("MODEL.INS_EMBED_HEAD.COMMON_STRIDE", 4),
        norm=g("MODEL.INS_EMBED_HEAD.NORM", "GN"),
        use_depthwise_separable_conv=g("MODEL.SEM_SEG_HEAD.USE_DEPTHWISE_SEPARABLE_CONV", False),
        # heads follow the same SEM_SEG_HEAD flag (model.py:637 wires it
        # into the value used by the prediction heads at :515-561)
        head_depthwise_separable=g("MODEL.SEM_SEG_HEAD.USE_DEPTHWISE_SEPARABLE_CONV", False),
        eee_mask_on=g("MODEL.INS_EMBED_HEAD.EEE_MASK_ON", True),
        eee_boundary_on=g("MODEL.INS_EMBED_HEAD.EEE_BOUNDARY_ON", True),
        error_type=g("MODEL.INS_EMBED_HEAD.ERROR_TYPE", "e2"),
        hierarchical_fusion_on=g("MODEL.INS_EMBED_HEAD.HIERARCHICAL_FUSION_ON", True),
        hierarchy=tuple(tuple(h) for h in hierarchy),
        num_head_fusion_layers=g("MODEL.INS_EMBED_HEAD.NUM_FUSION_LAYERS", 3),
        fusion_target=tuple(g("MODEL.INS_EMBED_HEAD.FUSION_TARGET", ["feat", "pred"])),
        foreground_loss_type=g("MODEL.INS_EMBED_HEAD.FOREGROUND_LOSS_TYPE", "hard_pixel_mining"),
        foreground_loss_top_k=g("MODEL.INS_EMBED_HEAD.FOREGROUND_LOSS_TOP_K", 1.0),
        foreground_loss_weight=g("MODEL.INS_EMBED_HEAD.FOREGROUND_LOSS_WEIGHT", 1.0),
        center_loss_weight=g("MODEL.INS_EMBED_HEAD.CENTER_LOSS_WEIGHT", 200.0),
        offset_loss_weight=g("MODEL.INS_EMBED_HEAD.OFFSET_LOSS_WEIGHT", 0.01),
        eee_mask_loss_weight=g("MODEL.INS_EMBED_HEAD.EEE_MASK_LOSS_WEIGHT", 1.0),
        eee_boundary_loss_weight=g("MODEL.INS_EMBED_HEAD.EEE_BOUNDARY_LOSS_WEIGHT", 1.0),
        center_threshold=g("MODEL.PANOPTIC_DEEPLAB.CENTER_THRESHOLD", 0.3),
        nms_kernel=g("MODEL.PANOPTIC_DEEPLAB.NMS_KERNEL", 7),
        top_k_instances=g("MODEL.PANOPTIC_DEEPLAB.TOP_K_INSTANCE", 200),
        stuff_area=g("MODEL.PANOPTIC_DEEPLAB.STUFF_AREA", 2048),
    )
    train = TrainConfig(
        optimizer=g("SOLVER.OPTIMIZER", "ADAM").lower(),
        base_lr=g("SOLVER.BASE_LR", tdefault.base_lr),
        weight_decay=g("SOLVER.WEIGHT_DECAY", 0.0),
        max_iter=g("SOLVER.MAX_ITER", 90000),
        batch_size=g("SOLVER.IMS_PER_BATCH", 8),
        checkpoint_period=g("SOLVER.CHECKPOINT_PERIOD", 10000),
        eval_period=g("TEST.EVAL_PERIOD", 30000),
        seed=g("SEED", 7),
        freeze_backbone_stages=g("MODEL.BACKBONE.FREEZE_AT", 0),
        gaussian_sigma=g("INPUT.GAUSSIAN_SIGMA", 10),
        small_instance_area=g("INPUT.SMALL_INSTANCE_AREA", 4096),
        small_instance_weight=g("INPUT.SMALL_INSTANCE_WEIGHT", 3),
        depth_range=tuple(g("INPUT.DEPTH_RANGE", [2500, 15000])),
        perlin_distortion=g("INPUT.PERLIN_DISTORTION_ON", True),
        color_aug_ssd=g("INPUT.COLOR_AUG_SSD", True),
        min_size_train=tuple(np.atleast_1d(g("INPUT.MIN_SIZE_TRAIN", (480,))).tolist()),
        max_size_train=g("INPUT.MAX_SIZE_TRAIN", 640),
    )
    return model, train
