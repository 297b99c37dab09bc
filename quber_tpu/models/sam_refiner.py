"""SAM / HQ-SAM refiner wrapper for the eval harness.

Mirrors /root/reference/eval/refiner_model.py:554-664 (SAMRefiner,
prompt_type='mask'): each initial mask becomes a mask prompt; the image is
encoded ONCE and the decoder runs per prompt (vmapped), returning the HQ
mask at the evaluation resolution.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from quber_tpu.models.sam_hq import SAMHQ

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SAMAutomaticBaseModel:
    """SAM automatic mask generation as a base segmenter.

    Mirrors the reference's SAM wrapper (eval/base_model.py:224-276,
    SamAutomaticMaskGenerator): a regular grid of foreground point prompts,
    one decode per point (vmapped into a single program), masks thresholded
    by predicted IoU and deduplicated with mask NMS (IoU > 0.7 suppressed).
    """

    def __init__(self, params=None, dataset="OSD", img_size=512, grid=8,
                 seed=0, embed_dim=256, depth=4, num_heads=4,
                 iou_threshold=0.5, dedup_iou=0.7, depth_input=False):
        from quber_tpu.models.sam_hq import SAMHQ

        self.model = SAMHQ(img_size=img_size, embed_dim=embed_dim, depth=depth,
                           num_heads=num_heads, dtype=jnp.bfloat16)
        self.img_size = img_size
        self.grid = grid
        self.dataset = dataset
        self.iou_threshold = iou_threshold
        self.dedup_iou = dedup_iou
        self.depth_input = depth_input
        if params is None:
            from quber_tpu.models.sam_hq import init_sam_variables

            params = jax.jit(lambda rng: init_sam_variables(self.model, rng))(
                jax.random.PRNGKey(seed)
            )
        self.params = params

        g = grid
        coords = (np.stack(np.meshgrid(np.arange(g), np.arange(g)), -1)
                  .reshape(-1, 2).astype(np.float32) + 0.5) / g  # (x, y)
        self._points = jnp.asarray(coords)

        from quber_tpu.models.sam_hq import SAMHQ as _S

        def generate(params, image):
            embed, interm = self.model.apply(params, image[None], method=_S.encode)

            def one(pt):
                masks, iou, _ = self.model.apply(
                    params, embed, interm, pt[None, None, :] * self.img_size,
                    jnp.ones((1, 1), jnp.int32), True, method=_S.decode_points,
                )
                return masks[0, 0], iou[0, 0]

            logits, ious = jax.vmap(one)(self._points)
            return logits, ious

        self._generate = jax.jit(generate)

    def predict(self, rgb_path, depth_path):
        import time

        import cv2

        h0, w0 = 480, 640
        if self.depth_input:
            # "sam-depth" mode (eval/base_model.py:256-259): prompt the mask
            # generator with the colorized depth image instead of RGB
            import imageio.v2 as imageio

            from quber_tpu.ops.preprocess import inpaint_depth, normalize_depth

            d = imageio.imread(depth_path)
            d = normalize_depth(d)
            d = cv2.resize(d, (w0, h0), interpolation=cv2.INTER_NEAREST)
            rgb = inpaint_depth(d)
        else:
            rgb = cv2.resize(cv2.imread(rgb_path), (w0, h0))
        s = self.img_size
        img = (cv2.resize(rgb[..., ::-1], (s, s)).astype(np.float32) - SAM_PIXEL_MEAN) / SAM_PIXEL_STD

        t0 = time.time()
        logits, ious = self._generate(self.params, jnp.asarray(img))
        logits, ious = np.asarray(logits), np.asarray(ious)
        elapsed = time.time() - t0

        masks = []
        for l, s_iou in sorted(zip(logits, ious), key=lambda t: -t[1]):
            if s_iou < self.iou_threshold:
                continue
            m = cv2.resize(l, (w0, h0)) > 0
            if m.sum() < 256:
                continue
            dup = False
            for kept in masks:
                inter = np.logical_and(m, kept).sum()
                union = np.logical_or(m, kept).sum()
                if inter / max(union, 1) > self.dedup_iou:
                    dup = True
                    break
            if not dup:
                masks.append(m)
        masks = np.asarray(masks) if masks else np.zeros((0, h0, w0), bool)
        return masks, None, elapsed


class SAMHQRefiner:
    MAX_INSTANCES = 16

    def __init__(self, params=None, dataset="OSD", img_size=1024, seed=0,
                 preset=None, embed_dim=768, depth=12, num_heads=12,
                 global_blocks=(2, 5, 8, 11), window_size=14, hq=True):
        if preset is not None:
            # "vit_h" matches the reference's fine-tuned HQ-SAM baseline
            # (refiner_model.py:560-564 loads a ViT-H checkpoint)
            self.model = SAMHQ.preset(preset, img_size=img_size, dtype=jnp.bfloat16)
        else:
            self.model = SAMHQ(img_size=img_size, embed_dim=embed_dim,
                               depth=depth, num_heads=num_heads,
                               global_blocks=global_blocks,
                               window_size=window_size, dtype=jnp.bfloat16)
        self.img_size = img_size
        self.hq = hq
        self.dataset = dataset
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, img_size, img_size, 3)),
                jnp.zeros((1, img_size // 4, img_size // 4, 1)),
            )
        self.params = params

        def refine(params, image, masks, valid):
            embed, interm = self.model.apply(params, image[None], method=SAMHQ.encode)

            def one(mask_prompt):
                masks_out, iou, all_masks = self.model.apply(
                    params, embed, interm, mask_prompt[None, ..., None],
                    False, self.hq, method=SAMHQ.decode,
                )
                # hq_token_only=True -> the HQ mask; else the pure SAM token
                logit = masks_out[0, 0] if self.hq else all_masks[0, 0]
                return logit, iou[0, 0]

            logits, ious = jax.vmap(one)(masks)
            return logits, ious

        self._refine = jax.jit(refine)

    def predict(self, rgb_path, depth_path, initial_masks, fg_mask):
        import time

        import cv2

        rgb = cv2.imread(rgb_path)
        h0, w0 = 480, 640
        rgb = cv2.resize(rgb, (w0, h0))
        s = self.img_size
        img = cv2.resize(rgb[..., ::-1], (s, s)).astype(np.float32)
        img = (img - SAM_PIXEL_MEAN) / SAM_PIXEL_STD

        n = self.MAX_INSTANCES
        q = s // 4
        prompts = np.zeros((n, q, q), np.float32)
        count = min(len(initial_masks), n)
        for i in range(count):
            m = np.asarray(initial_masks[i]).astype(np.uint8)
            prompts[i] = cv2.resize(m, (q, q), interpolation=cv2.INTER_NEAREST) * 20.0 - 10.0
        valid = np.zeros((n,), bool)
        valid[:count] = True

        t0 = time.time()
        logits, ious = self._refine(
            self.params, jnp.asarray(img), jnp.asarray(prompts), jnp.asarray(valid)
        )
        logits = np.asarray(logits)[:count]
        elapsed = time.time() - t0

        refined = []
        for l in logits:
            m = cv2.resize(l, (w0, h0)) > 0
            if m.sum():
                refined.append(m)
        refined = np.asarray(refined) if refined else np.zeros((0, h0, w0), bool)
        return refined, None, elapsed, fg_mask
