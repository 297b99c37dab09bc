"""Refiner wrappers for the eval harness.

Interface (mirroring /root/reference/eval/refiner_model.py):
    predict(rgb_path, depth_path, initial_masks, fg_mask)
        -> (refined_masks [N, H, W] bool, raw_output | None, seconds, fg_mask)

QuBERRefiner reproduces the reference MaskRefiner wrapper semantics
(refiner_model.py:214-297): resize to 640x480, normalize + Telea-inpaint
depth, refine, filter instances by foreground overlap > 0.3, and zero-depth
filtering on OCID — but the mask encoding / network / grouping / fg-filter
all run inside the predictor's single XLA program.
"""

from __future__ import annotations

import os
import time

import numpy as np

from quber_tpu.evaluation.datasets import EVAL_H, EVAL_W
from quber_tpu.ops.preprocess import inpaint_depth, normalize_depth


def _load_rgbd(rgb_path, depth_path):
    import cv2
    import imageio.v2 as imageio

    rgb = cv2.imread(rgb_path)
    rgb = cv2.resize(rgb, (EVAL_W, EVAL_H))
    if depth_path.endswith(".npy"):
        depth = np.load(depth_path)
        depth_n = normalize_depth(depth, 0.25, 1.5)
    else:
        depth = np.asarray(imageio.imread(depth_path))
        depth_n = normalize_depth(depth)
    zero_depth = depth == 0
    depth_n = cv2.resize(depth_n, (EVAL_W, EVAL_H), interpolation=cv2.INTER_NEAREST)
    depth_n = inpaint_depth(depth_n)
    return rgb, depth_n, zero_depth


class LoadNpyRefinerModel:
    """Replay pre-recorded refined masks (refiner_model.py:186-212)."""

    def __init__(self, npy_folder: str = "", dataset: str = "OSD"):
        self.npy_folder = npy_folder
        self.dataset = dataset

    def predict(self, rgb_path, depth_path, initial_masks, fg_mask):
        import imageio.v2 as imageio

        npy_path = os.path.join(
            self.npy_folder, os.path.basename(rgb_path).replace(".png", ".npy")
        )
        refined = np.load(npy_path) > 0
        if self.dataset == "OCID":
            depth_img = np.asarray(imageio.imread(depth_path))
            refined &= (depth_img != 0)[None]
        return refined, None, 0.0, None


class IdentityRefiner:
    """Pass-through (refiner baseline floor: refined == initial)."""

    def predict(self, rgb_path, depth_path, initial_masks, fg_mask):
        return np.asarray(initial_masks) > 0, None, 0.0, fg_mask


class QuBERRefiner:
    """The QuBER mask refiner + LMFFNet foreground filter."""

    def __init__(self, config=None, params=None, fg_params=None, dataset="OSD",
                 max_instances: int = 64, use_fg_filter: bool = True,
                 fg_model: str = "lmffnet"):
        from quber_tpu.predictor import MaskRefinerPredictor

        self.predictor = MaskRefinerPredictor(config, params, max_instances)
        self.dataset = dataset
        self.use_fg_filter = use_fg_filter
        self.fg_predictor = None
        if use_fg_filter:
            # the reference ships both fg segmenters (CGNet rgbd_fg.pth /
            # LMFFNet, foreground_segmentation/predictor.py:21-99); CGNet is
            # selected by checkpoint presence (QUBER_CGNET_CKPT) or fg_model
            if fg_model == "cgnet":
                from quber_tpu.models.fg_predictor import CGNetPredictor

                self.fg_predictor = CGNetPredictor(params=fg_params)
            else:
                from quber_tpu.models.fg_predictor import LMFFNetPredictor

                self.fg_predictor = LMFFNetPredictor(params=fg_params)

    def _to_model_frame(self, rgb, depth_n, initial_masks):
        """Adapt a harness-resolution (640x480) frame to the model's native
        config size. The harness frame is fixed by reference semantics
        (refiner_model.py:224 resize); a model config at another size (e.g.
        a small drill/test config) refines at its own resolution and the
        panoptic map is mapped back by _pan_to_eval."""
        import cv2

        ch, cw = self.predictor.config.height, self.predictor.config.width
        if (ch, cw) == (EVAL_H, EVAL_W):
            return rgb, depth_n, initial_masks
        rgb = cv2.resize(rgb, (cw, ch))
        depth_n = cv2.resize(depth_n, (cw, ch), interpolation=cv2.INTER_NEAREST)
        masks = [
            cv2.resize(np.asarray(m).astype(np.uint8), (cw, ch),
                       interpolation=cv2.INTER_NEAREST)
            for m in initial_masks
        ]
        return rgb, depth_n, masks

    def _pan_to_eval(self, pan):
        import cv2

        if pan.shape == (EVAL_H, EVAL_W):
            return pan
        return cv2.resize(np.asarray(pan).astype(np.int32), (EVAL_W, EVAL_H),
                          interpolation=cv2.INTER_NEAREST)

    def predict(self, rgb_path, depth_path, initial_masks, fg_mask):
        rgb, depth_n, zero_depth = _load_rgbd(rgb_path, depth_path)
        rgb_m, depth_m, masks_m = self._to_model_frame(rgb, depth_n, initial_masks)

        start = time.time()
        pan, count, scores = self.predictor.predict_packed(rgb_m, depth_m, masks_m)
        pan = self._pan_to_eval(pan)
        refined, fg = self._postprocess(
            pan, count, scores, rgb_path, depth_path, zero_depth
        )
        elapsed = time.time() - start
        return refined, {"panoptic": pan, "scores": scores}, elapsed, fg

    def _postprocess(self, pan, count, scores, rgb_path, depth_path, zero_depth):
        """Shared per-frame postprocessing: masks from the panoptic map, fg
        overlap filter (OCID zero-depth zeroing mirrors
        refiner_model.py:283-288)."""
        refined = (
            pan[None] == np.arange(1, count + 1)[:, None, None]
            if count
            else np.zeros((0, EVAL_H, EVAL_W), bool)
        )
        fg = None
        if self.fg_predictor is not None:
            fg = self.fg_predictor.predict(rgb_path, depth_path)
            keep = [
                m for m in refined
                if m.sum() and np.logical_and(m, fg).sum() / m.sum() > 0.3
            ]
            refined = (
                np.asarray(keep) if keep else np.zeros((0, EVAL_H, EVAL_W), bool)
            )
        if self.dataset == "OCID" and len(refined):
            import cv2

            zd = cv2.resize(
                zero_depth.astype(np.uint8), (EVAL_W, EVAL_H),
                interpolation=cv2.INTER_NEAREST,
            ).astype(bool)
            refined = refined & ~zd[None]
        return refined, fg

    def predict_stream(self, items, batch_size: int = 16):
        """Batched-throughput refinement over an iterable of
        (rgb_path, depth_path, initial_masks, fg_mask) items.

        Streams frames through the predictor's producer-thread pipeline
        (device batches, one packed transfer per direction) instead of one
        round-trip per image; yields (refined_masks, output, fg) per item in
        order. Note: the fg-overlap filter still runs one fg-net call per
        frame — use maskrefiner-nofilter for pure streaming throughput.
        """
        from collections import deque

        metas: deque = deque()  # filled by the stream's producer thread

        def frames():
            for rgb_path, depth_path, initial_masks, _fg in items:
                rgb, depth_n, zero_depth = _load_rgbd(rgb_path, depth_path)
                metas.append((rgb_path, depth_path, zero_depth))
                yield self._to_model_frame(rgb, depth_n, initial_masks)

        for pan, count, scores in self.predictor.predict_batch_stream(
            frames(), batch_size=batch_size
        ):
            rgb_path, depth_path, zero_depth = metas.popleft()
            pan = self._pan_to_eval(pan)
            refined, fg = self._postprocess(
                pan, count, scores, rgb_path, depth_path, zero_depth
            )
            yield refined, {"panoptic": pan, "scores": scores}, fg


def build_refiner_model(name: str, dataset: str, config=None, params=None,
                        npy_folder: str = ""):
    if name == "maskrefiner":
        fg_model = "lmffnet"
        fg_ckpt = os.environ.get("QUBER_LMFFNET_CKPT", "")
        if not fg_ckpt and os.environ.get("QUBER_CGNET_CKPT", ""):
            fg_model, fg_ckpt = "cgnet", os.environ["QUBER_CGNET_CKPT"]
        fg_params = None
        if fg_ckpt:
            from quber_tpu.train.checkpoint import restore_params

            fg_params = restore_params(fg_ckpt)
        return QuBERRefiner(config, params, fg_params=fg_params, dataset=dataset,
                            fg_model=fg_model)
    if name == "maskrefiner-nofilter":
        return QuBERRefiner(config, params, dataset=dataset, use_fg_filter=False)
    if name == "identity":
        return IdentityRefiner()
    if name == "npy":
        return LoadNpyRefinerModel(npy_folder, dataset)
    if name in ("cascadepsp", "cascadepsp-rgbd"):
        from quber_tpu.models.cascadepsp import CascadePSPRefiner

        if params is None:
            # tools/train_zoo.py --model cascadepsp checkpoint
            ckpt = os.environ.get("QUBER_CASCADEPSP_CKPT", "")
            if ckpt:
                from quber_tpu.train.checkpoint import restore_params

                params = restore_params(ckpt)
        return CascadePSPRefiner(params=params, dataset=dataset)
    if name == "rice":
        from quber_tpu.models.rice import RICERefiner

        if params is None:
            # tools/train_zoo.py --model rice NodeScorer checkpoint
            # (random init without one)
            ckpt = os.environ.get("QUBER_RICE_CKPT", "")
            if ckpt:
                from quber_tpu.train.checkpoint import restore_params

                try:
                    params = restore_params(ckpt)
                except FileNotFoundError:
                    params = None
        # QUBER_RICE_SEARCH=cem selects the sampling-tree; the greedy
        # hill-climb is the default because it accepts each op on its OWN
        # margin-gated score delta — CEM accepts whole trajectories, which
        # lets a clear repair carry collateral bad ops along (measured:
        # greedy preserves true objects better on the synthetic benchmark)
        search = os.environ.get("QUBER_RICE_SEARCH", "greedy")
        return RICERefiner(params=params, dataset=dataset, search=search)
    if name in ("sam", "hq-sam", "hq-sam-pretrained"):
        from quber_tpu.models.sam_refiner import SAMHQRefiner

        # hq-sam-pretrained = the reference's fine-tuned ViT-H HQ-SAM
        # (refiner_model.py:560-564); plain sam/hq-sam default to ViT-B
        # scale for perf smokes at random init
        ckpt = os.environ.get("QUBER_SAMHQ_CKPT", "")
        if name == "hq-sam" and params is None and ckpt:
            # tools/train_zoo.py --model samhq checkpoint: arch.json beside
            # the ckpt dir rebuilds the trained architecture
            import json

            from quber_tpu.train.checkpoint import restore_params

            with open(os.path.join(os.path.dirname(os.path.abspath(ckpt)),
                                   "arch.json")) as f:
                arch = json.load(f)
            return SAMHQRefiner(params=restore_params(ckpt), dataset=dataset,
                                hq=True, img_size=arch["img_size"],
                                embed_dim=arch["embed_dim"],
                                depth=arch["depth"],
                                num_heads=arch["num_heads"],
                                global_blocks=tuple(arch["global_blocks"]),
                                window_size=arch["window_size"])
        preset = "vit_h" if name == "hq-sam-pretrained" else None
        return SAMHQRefiner(params=params, dataset=dataset, hq=name != "sam",
                            preset=preset)
    if name is None or name in ("none", "save"):
        return None
    raise NotImplementedError(
        f"refiner model {name}; available: maskrefiner, maskrefiner-nofilter, "
        "identity, npy, rice, cascadepsp, cascadepsp-rgbd, sam, hq-sam"
    )
