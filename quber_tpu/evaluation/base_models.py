"""Base (initial) segmenters for the eval harness.

The reference wraps a zoo of external repos (/root/reference/eval/
base_model.py); the injectable test doubles — GT / Empty / npy-replay — are
the metric-pipeline seam (SURVEY §4) and come first. Learned base segmenters
(UCN mean-shift embeddings, etc.) register into the same interface:

    predict(rgb_path, depth_path) -> (masks [N, H, W] bool, fg_mask | None, seconds)
"""

from __future__ import annotations

import os

import numpy as np

from quber_tpu.evaluation.datasets import BG_LABELS, EVAL_H, EVAL_W


def _restore_or_none(ckpt_dir: str):
    """Load an orbax param tree if the path is set and exists; else None
    (random init — perf smoke without a checkpoint)."""
    if not ckpt_dir:
        return None
    from quber_tpu.train.checkpoint import restore_params

    try:
        return restore_params(ckpt_dir)
    except FileNotFoundError:
        return None


class Empty:
    """No initial prediction (base_model.py:64-70)."""

    def predict(self, rgb_path, depth_path):
        return np.zeros((0, EVAL_H, EVAL_W), bool), None, 0.0


class GT:
    """Oracle initial masks from the annotation (base_model.py:72-100)."""

    def __init__(self, dataset: str = "OSD"):
        self.dataset = dataset

    def predict(self, rgb_path, depth_path):
        import cv2
        import imageio.v2 as imageio

        if self.dataset == "OSD":
            anno_path = rgb_path.replace("image_color", "annotation")
        elif self.dataset == "OCID":
            anno_path = rgb_path.replace("rgb", "label")
        elif self.dataset == "WISDOM":
            anno_path = rgb_path.replace("color_ims", "modal_segmasks")
        else:
            anno_path = rgb_path.replace("rgb", "annotation")
        anno = np.asarray(imageio.imread(anno_path))
        if anno.ndim == 3:
            # RGB-encoded label image (or a mis-derived annotation path that
            # resolved to the color image): collapse to a single channel so
            # downstream mask stacks stay [N, H, W]
            anno = anno[..., 0]
        anno = cv2.resize(anno, (EVAL_W, EVAL_H), interpolation=cv2.INTER_NEAREST)
        if self.dataset == "OCID":
            key = "floor" if "floor" in rgb_path else "table"
            for label in BG_LABELS[key]:
                anno[anno == label] = 0
        labels = np.unique(anno)
        labels = labels[labels != 0]
        masks = np.array([anno == l for l in labels]) if len(labels) else np.zeros((0, EVAL_H, EVAL_W), bool)
        return masks, None, 0.0


class LoadNpyBaseModel:
    """Replay pre-recorded initial masks (base_model.py:50-62) — the seam for
    golden-file parity runs against reference outputs."""

    def __init__(self, npy_folder: str = ""):
        self.npy_folder = npy_folder

    def predict(self, rgb_path, depth_path):
        npy_path = os.path.join(
            self.npy_folder, os.path.basename(rgb_path).replace(".png", ".npy")
        )
        masks = np.load(npy_path)
        return np.asarray(masks) > 0, None, 0.0


class PerturbedGT:
    """GT masks perturbed with the data-generation corruptions — exercises the
    refiner with controlled error injection without any learned base model."""

    def __init__(self, dataset: str = "OSD", seed: int = 0,
                 target_iou=(0.6, 0.9), ratios: dict | None = None):
        self.gt = GT(dataset)
        self.rng = np.random.RandomState(seed)
        self.target_iou = target_iou
        self.ratios = ratios

    def predict(self, rgb_path, depth_path):
        from quber_tpu.data.perturb import perturb_masks

        masks, fg, t = self.gt.predict(rgb_path, depth_path)
        masks = perturb_masks(masks, self.rng, target_iou=self.target_iou,
                              ratios=self.ratios)
        return masks, fg, t


# graph-structure corruptions only (guaranteed per-scene FP / split / merge,
# no boundary jitter): the error family RICE-class refiners repair — their
# ops edit the segmentation GRAPH, not mask boundaries
STRUCTURAL_RATIOS = {"fp": 1.0, "over": 1.0, "under": 1.0, "delete": 0.0,
                     "boundary": 0.0}


def build_base_model(name: str, dataset: str, npy_folder: str = ""):
    if name == "gt":
        return GT(dataset)
    if name == "empty":
        return Empty()
    if name == "npy":
        return LoadNpyBaseModel(npy_folder)
    if name == "perturbed-gt":
        return PerturbedGT(dataset)
    if name == "perturbed-gt-structural":
        return PerturbedGT(dataset, ratios=STRUCTURAL_RATIOS)
    if name in ("ucn", "ucn-zoomin"):
        from quber_tpu.models.ucn import UCNBaseModel

        # tools/train_zoo.py --model ucn checkpoint (random init without one)
        ckpt = os.environ.get("QUBER_UCN_CKPT", "")
        params = _restore_or_none(ckpt)
        return UCNBaseModel(params=params, dataset=dataset,
                            zoom_in=name.endswith("zoomin"))
    if name in ("msmformer", "msmformer-zoomin"):
        from quber_tpu.models.msmformer import MSMFormerBaseModel

        # tools/train_zoo.py --model msmformer checkpoint (native variant;
        # the imported reference checkpoint is `msmformer-pretrained`)
        ckpt = os.environ.get("QUBER_MSMFORMER_NATIVE_CKPT", "")
        params = _restore_or_none(ckpt)
        return MSMFormerBaseModel(params=params, dataset=dataset,
                                  zoom_in=name.endswith("zoomin"))
    if name == "msmformer-pretrained":
        # imported reference checkpoint (tools/import_checkpoint.py --model
        # msmformer); QUBER_MSMFORMER_CKPT points at the orbax dir
        from quber_tpu.models.msmformer_pretrained import (
            PretrainedMSMFormerBaseModel,
        )
        from quber_tpu.train.checkpoint import restore_params

        ckpt = os.environ.get("QUBER_MSMFORMER_CKPT", "output/msmformer/ckpt")
        return PretrainedMSMFormerBaseModel(restore_params(ckpt),
                                            dataset=dataset)
    if name == "uoaisnet-pretrained":
        # imported reference checkpoint (tools/import_checkpoint.py --model
        # uoais_net); QUBER_UOAIS_CKPT points at the orbax dir, and
        # QUBER_CGNET_CKPT (optional) enables the reference wrapper's
        # CGNet fg-overlap filter (base_model.py:188-218)
        from quber_tpu.models.uoais_net_pretrained import (
            UOAISNetPretrainedBaseModel,
        )
        from quber_tpu.train.checkpoint import restore_params

        ckpt = os.environ.get("QUBER_UOAIS_CKPT", "output/uoais_net/ckpt")
        fg_ckpt = os.environ.get("QUBER_CGNET_CKPT", "")
        fg_params = restore_params(fg_ckpt) if fg_ckpt else None
        try:
            params = restore_params(ckpt)["params"]
        except FileNotFoundError:
            params = None  # random init (perf smoke without a checkpoint)
        return UOAISNetPretrainedBaseModel(
            params, dataset=dataset, fg_params=fg_params)
    if name == "uoisnet3d":
        from quber_tpu.models.uois_net import UOISNet3DBaseModel

        # tools/train_zoo.py --model uoisnet3d checkpoints (ckpt_dsn/ +
        # ckpt_rrn/; random init without them)
        dsn = _restore_or_none(os.environ.get("QUBER_UOIS3D_DSN_CKPT", ""))
        rrn = _restore_or_none(os.environ.get("QUBER_UOIS3D_RRN_CKPT", ""))
        return UOISNet3DBaseModel(dsn_params=dsn, rrn_params=rrn,
                                  dataset=dataset)
    if name == "uoisnet3d-pretrained":
        # imported reference checkpoints (tools/import_checkpoint.py --model
        # uois_dsn / uois_rrn); env vars point at the two orbax dirs
        from quber_tpu.models.uois_net_pretrained import (
            UOISNet3DPretrainedBaseModel,
        )
        from quber_tpu.train.checkpoint import restore_params

        dsn_ckpt = os.environ.get("QUBER_UOIS_DSN_CKPT", "output/uois_dsn/ckpt")
        rrn_ckpt = os.environ.get("QUBER_UOIS_RRN_CKPT", "output/uois_rrn/ckpt")

        def _maybe(path):
            try:
                return restore_params(path)
            except FileNotFoundError:
                return None  # random init (perf smoke without a checkpoint)

        return UOISNet3DPretrainedBaseModel(
            _maybe(dsn_ckpt), _maybe(rrn_ckpt), dataset=dataset)
    if name in ("uoaisnet", "uoaisnet-amodal"):
        from quber_tpu.models.uoais_net import UOAISNetBaseModel
        from quber_tpu.train.checkpoint import restore_params

        # tools/train_zoo.py checkpoint (random init without one)
        ckpt = os.environ.get("QUBER_UOAISNET_CKPT", "")
        params = restore_params(ckpt) if ckpt else None
        thresh = float(os.environ.get("QUBER_UOAISNET_THRESH", "0.5"))
        return UOAISNetBaseModel(params=params, dataset=dataset,
                                 amodal=name.endswith("amodal"),
                                 score_threshold=thresh)
    if name in ("sam", "sam-depth"):
        from quber_tpu.models.sam_refiner import SAMAutomaticBaseModel

        return SAMAutomaticBaseModel(
            dataset=dataset, depth_input=name.endswith("depth")
        )
    if name == "detic":
        from quber_tpu.models.open_vocab import DeticBaseModel

        ckpt = os.environ.get("QUBER_DETIC_CKPT", "")
        if ckpt:
            # tools/train_zoo.py --model detic: checkpoint tree
            # {text, detector} + vocab.json beside the ckpt dir
            import json

            from quber_tpu.train.checkpoint import restore_params

            with open(os.path.join(os.path.dirname(os.path.abspath(ckpt)),
                                   "vocab.json")) as f:
                vocab = json.load(f)
            thr = float(os.environ.get("QUBER_DETIC_THRESH", "0.5"))
            return DeticBaseModel(params=restore_params(ckpt),
                                  dataset=dataset, vocabulary=vocab,
                                  confidence_threshold=thr)
        return DeticBaseModel(dataset=dataset)
    if name == "grounded-sam":
        from quber_tpu.models.open_vocab import GroundedSAMBaseModel

        ckpt = os.environ.get("QUBER_GSAM_CKPT", "")
        if ckpt:
            # tools/train_zoo.py --model gsam: {text, grounder, sam} tree
            # + arch.json (the trained SAM architecture)
            import json

            from quber_tpu.train.checkpoint import restore_params

            with open(os.path.join(os.path.dirname(os.path.abspath(ckpt)),
                                   "arch.json")) as f:
                arch = json.load(f)
            thr = float(os.environ.get("QUBER_GSAM_THRESH", "0.10"))
            return GroundedSAMBaseModel(params=restore_params(ckpt),
                                        dataset=dataset, sam_arch=arch,
                                        box_threshold=thr)
        return GroundedSAMBaseModel(dataset=dataset)
    raise NotImplementedError(
        f"base model {name}; available: gt, empty, npy, perturbed-gt, ucn, "
        "msmformer, msmformer-pretrained, uoisnet3d, uoisnet3d-pretrained, "
        "uoaisnet, "
        "uoaisnet-amodal, uoaisnet-pretrained, sam, detic, "
        "grounded-sam"
    )
