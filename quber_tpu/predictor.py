"""MaskRefinerPredictor: the library-level inference API.

API-compatible rebuild of /root/reference/maskrefiner/predictor.py:207-359:
`predict(rgb, depth, initial_masks)` runs mask encoding -> dual-trunk
backbone -> hierarchical heads -> panoptic grouping, and returns foreground /
EEE maps plus refined instances.

TPU-first design: the ENTIRE hot path (Gaussian center/offset encoding,
network forward, center NMS, pixel grouping, instance extraction) is one
jitted XLA program at a fixed (height, width, MAX_INSTANCES); the host only
pads inputs and unpacks the fixed-shape result. The reference instead loops
on the host per mask (predictor.py:311-347) and per panoptic label with
device syncs (model.py:318-356).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from quber_tpu.models.mask_refiner import MaskRefiner, MaskRefinerConfig
from quber_tpu.ops.encoding import encode_initial_masks
from quber_tpu.ops.grouping import get_panoptic_segmentation


def masks_to_boxes(masks: np.ndarray) -> np.ndarray:
    """[N, H, W] bool -> XYXY boxes [N, 4] (detectron2 BitMasks convention)."""
    boxes = np.zeros((len(masks), 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.where(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return boxes


class MaskRefinerPredictor:
    """Single-image refinement predictor with a fused jit pipeline.

    Args:
      config: model + post-processing configuration.
      params: flax param pytree; if None, randomly initialized (useful for
        benchmarking and shape checks; real use loads a checkpoint via
        quber_tpu.train.checkpoint or models.import_torch).
      max_instances: padding bound for the initial mask stack.
    """

    def __init__(
        self,
        config: MaskRefinerConfig | None = None,
        params=None,
        max_instances: int = 64,
        seed: int = 0,
    ):
        self.config = config or MaskRefinerConfig()
        self.max_instances = max_instances
        self.model = MaskRefiner(self.config)
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 64, 64, self.config.num_input_channels - 3 * self.config.offset_input_on)),
                jnp.zeros((1, 64, 64, 3)) if self.config.offset_input_on else None,
            )
        self.params = params
        self._pipeline = jax.jit(self._pipeline_impl)

    def _pipeline_impl(self, params, image, masks, valid):
        """image [H, W, 6] f32, masks [N, H, W] bool, valid [N] bool."""
        cfg = self.config
        enc = encode_initial_masks(masks, valid, sigma=10, normalize=True)
        offset_enc = jnp.transpose(enc, (1, 2, 0))[None]
        out = self.model.apply(params, image[None], offset_enc)

        fg_logit = out["foreground"][0, ..., 0]
        fg_prob = jax.nn.sigmoid(fg_logit)
        fg_bin = jnp.round(fg_prob)
        center = out["center"][0, ..., 0]
        offsets = jnp.transpose(out["offset"][0], (2, 0, 1))

        pano = get_panoptic_segmentation(
            fg_bin,
            center,
            offsets,
            foreground_prob=fg_prob,
            threshold=cfg.center_threshold,
            nms_kernel=cfg.nms_kernel,
            top_k=cfg.top_k_instances,
            min_instance_area=cfg.min_instance_area,
            stuff_area=cfg.stuff_area,
        )
        result = {
            "sem_seg": fg_logit,
            "center": center,
            "offset": offsets,
            "panoptic_seg": pano["panoptic"],
            "num_instances": pano["num_instances"],
            "instance_scores": pano["scores"],
        }
        if cfg.eee_mask_on:
            result["eee_mask"] = jnp.transpose(out["eee_mask"][0], (2, 0, 1))
        if cfg.eee_boundary_on:
            result["eee_boundary"] = jnp.transpose(out["eee_boundary"][0], (2, 0, 1))
        return result

    def _assemble_image(self, rgb_img, depth_img):
        cfg = self.config
        chans = []
        if cfg.rgb_on:
            chans.append(np.asarray(rgb_img, np.float32))
        if cfg.depth_on:
            chans.append(np.asarray(depth_img, np.float32))
        return np.concatenate(chans, axis=-1)

    def predict_raw(self, rgb_img, depth_img, perturbed_masks):
        """Device-side result dict (jax arrays), fixed shapes. Inputs:
        rgb_img [H, W, 3] BGR uint8; depth_img [H, W, 3] normalized depth;
        perturbed_masks [N, H, W] (bool or uint8)."""
        cfg = self.config
        image = self._assemble_image(rgb_img, depth_img)
        h, w = image.shape[:2]
        assert (h, w) == (cfg.height, cfg.width), (
            f"predictor is compiled for {cfg.height}x{cfg.width}, got {h}x{w}"
        )
        n = self.max_instances
        masks = np.zeros((n, h, w), bool)
        count = min(len(perturbed_masks), n)
        for i in range(count):
            masks[i] = np.asarray(perturbed_masks[i]) > 0
        valid = np.zeros((n,), bool)
        valid[:count] = True
        return self._pipeline(
            self.params, jnp.asarray(image), jnp.asarray(masks), jnp.asarray(valid)
        )

    def predict(self, rgb_img, depth_img=None, perturbed_masks=None):
        """Reference-compatible predict: returns a list with one result dict
        holding 'sem_seg', 'eee_mask', 'eee_boundary', 'panoptic_seg' and an
        'instances' dict with pred_masks/scores/pred_classes/pred_boxes
        (predictor.py:287-359 / model.py:259-358)."""
        raw = self.predict_raw(rgb_img, depth_img, perturbed_masks or [])
        pan = np.asarray(raw["panoptic_seg"])
        n = int(raw["num_instances"])
        out = {
            "sem_seg": np.asarray(raw["sem_seg"]),
            "panoptic_seg": (pan, None),
        }
        if "eee_mask" in raw:
            out["eee_mask"] = np.asarray(raw["eee_mask"])
        if "eee_boundary" in raw:
            out["eee_boundary"] = np.asarray(raw["eee_boundary"])
        if n > 0:
            masks = pan[None] == np.arange(1, n + 1)[:, None, None]
            scores = np.asarray(raw["instance_scores"])[1 : n + 1]
            out["instances"] = {
                "pred_masks": masks,
                "scores": scores,
                "pred_classes": np.zeros((n,), np.int64),
                "pred_boxes": masks_to_boxes(masks),
            }
        return [out]
