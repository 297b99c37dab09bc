"""CascadePSP-RGBD refiner baseline (PSPNet + cascade mask refinement).

TPU-native rebuild of the reference baseline
(/root/reference/eval/cascadepsp_rgbd.py:9-327, pspnet.py, extractors.py):
a PSPNet over a ResNet-50 trunk whose input is RGB(3) + depth(3) + the mask
to refine(1) + two previous-scale masks(2) = 9 channels, refining ONE mask
per forward. The reference's data-dependent high-res crop loop
(process_high_res_im) becomes a fixed two-pass cascade — a global pass at
224x224 followed by one fixed-size ROI zoom pass — vmapped over the
instance axis so all masks refine in a single XLA program.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import ConvNorm, upsample_bilinear
from quber_tpu.models.resnet import ResNetTrunk


class PyramidPooling(nn.Module):
    """PSP module: {1, 2, 3, 6}-bin average pools + 1x1 convs, concat."""

    features: int = 512
    bins: tuple = (1, 2, 3, 6)
    norm: str = "GN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        outs = [x]

        def adaptive_pool(x, out_h, out_w):
            # torch AdaptiveAvgPool2d semantics: cell (i, j) averages rows
            # [floor(i*h/oh), ceil((i+1)*h/oh)) — works for out > in too
            rows = []
            for i in range(out_h):
                r0, r1 = (i * h) // out_h, -(-((i + 1) * h) // out_h)
                cols = []
                for j in range(out_w):
                    c0, c1 = (j * w) // out_w, -(-((j + 1) * w) // out_w)
                    cols.append(x[:, r0:r1, c0:c1].mean(axis=(1, 2)))
                rows.append(jnp.stack(cols, axis=1))
            return jnp.stack(rows, axis=1)  # [B, oh, ow, C]

        for i, bin_size in enumerate(self.bins):
            pooled = adaptive_pool(x, bin_size, bin_size)
            pooled = ConvNorm(self.features // len(self.bins), 1, use_bias=False,
                              norm=self.norm, act=nn.relu, train=self.train,
                              dtype=self.dtype, name=f"branch_{i}")(pooled)
            outs.append(upsample_bilinear(pooled, size=(h, w)))
        return jnp.concatenate(outs, axis=-1)


class PSPNetRefiner(nn.Module):
    """PSPNet over 9-channel input; predicts the refined mask logit."""

    norm: str = "GN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        t, d = self.train, self.dtype
        h, w = x.shape[1], x.shape[2]
        feats = ResNetTrunk(
            depth=50, stem_type="basic", stem_out_channels=64,
            out_features=("res2", "res5"), norm=self.norm, train=t, dtype=d,
            name="trunk",
        )(x.astype(d))
        y = PyramidPooling(512, norm=self.norm, train=t, dtype=d, name="ppm")(feats["res5"])
        y = ConvNorm(512, 3, use_bias=False, norm=self.norm, act=nn.relu,
                     train=t, dtype=d, name="fuse")(y)
        # skip connection from res2 for boundary detail
        skip = ConvNorm(64, 1, use_bias=False, norm=self.norm, act=nn.relu,
                        train=t, dtype=d, name="skip")(feats["res2"])
        y = upsample_bilinear(y, size=(skip.shape[1], skip.shape[2]))
        y = jnp.concatenate([y, skip], axis=-1)
        y = ConvNorm(128, 3, use_bias=False, norm=self.norm, act=nn.relu,
                     train=t, dtype=d, name="refine")(y)
        logit = nn.Conv(1, (1, 1), dtype=d, name="predictor")(y)
        return upsample_bilinear(logit.astype(jnp.float32), size=(h, w))


class CascadePSPRefiner:
    """Eval-harness refiner: per-mask global + ROI-zoom cascade.

    predict(rgb_path, depth_path, initial_masks, fg_mask)
      -> (refined [N, H, W] bool, None, seconds, fg_mask)
    """

    GLOBAL = 224
    MAX_INSTANCES = 32

    def __init__(self, params=None, dataset="OSD", seed=0):
        self.model = PSPNetRefiner()
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, self.GLOBAL, self.GLOBAL, 9))
            )
        self.params = params
        self.dataset = dataset
        self._refine = jax.jit(self._refine_impl)

    def _refine_impl(self, params, image, masks, valid):
        """image [H, W, 6] f32 0..255; masks [N, H, W] f32.

        Cascade: global pass at GLOBAL^2 -> prediction-feedback pass -> a
        local ROI zoom pass cropped around each mask's (expanded) box, the
        fixed-shape counterpart of the reference's process_high_res_im crop
        loop (cascadepsp_rgbd.py:9-131)."""
        from quber_tpu.models.ucn import instance_boxes_from_labels
        from quber_tpu.ops.boxes import roi_align

        g = self.GLOBAL
        h, w = masks.shape[1], masks.shape[2]
        img_small = jax.image.resize(image, (g, g, 6), "bilinear") / 255.0
        img_norm = image / 255.0

        def global_pass(mask):
            m_small = jax.image.resize(mask, (g, g), "bilinear")
            inp = jnp.concatenate(
                [img_small, m_small[..., None], m_small[..., None], m_small[..., None]],
                axis=-1,
            )
            logit = self.model.apply(params, inp[None])[0, ..., 0]
            # second cascade pass: feed the first-pass prediction back in
            pred1 = jax.nn.sigmoid(logit)
            inp2 = jnp.concatenate(
                [img_small, m_small[..., None], pred1[..., None], pred1[..., None]],
                axis=-1,
            )
            logit2 = self.model.apply(params, inp2[None])[0, ..., 0]
            return jax.image.resize(logit2, mask.shape, "bilinear")

        logits = jax.vmap(global_pass)(masks.astype(jnp.float32))
        global_pred = jax.nn.sigmoid(logits)

        # local zoom: crop each mask's expanded box, refine at full detail,
        # paste the local logits over the global ones inside the box
        n = masks.shape[0]
        labels = jnp.max(
            (global_pred > 0.5).astype(jnp.int32)
            * jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None],
            axis=0,
        )
        boxes, bvalid = instance_boxes_from_labels(labels, n)

        def local_pass(box, gp, mask, ok):
            crop_img = roi_align(img_norm, box[None], out_size=g)[0]
            crop_gp = roi_align(gp[..., None], box[None], out_size=g)[0, ..., 0]
            crop_m = roi_align(mask[..., None].astype(jnp.float32), box[None], out_size=g)[0, ..., 0]
            inp = jnp.concatenate(
                [crop_img, crop_m[..., None], crop_gp[..., None], crop_gp[..., None]],
                axis=-1,
            )
            logit = self.model.apply(params, inp[None])[0, ..., 0]
            # paste back: inverse-map full-res pixels into the crop
            ys = jnp.arange(h, dtype=jnp.float32)[:, None]
            xs = jnp.arange(w, dtype=jnp.float32)[None, :]
            gy = (ys + 0.5 - box[1]) / jnp.maximum(box[3] - box[1], 1e-3) * g - 0.5
            gx = (xs + 0.5 - box[0]) / jnp.maximum(box[2] - box[0], 1e-3) * g - 0.5
            inside = (gy >= 0) & (gy < g) & (gx >= 0) & (gx < g) & ok
            val = logit[
                jnp.clip(jnp.round(gy), 0, g - 1).astype(jnp.int32),
                jnp.clip(jnp.round(gx), 0, g - 1).astype(jnp.int32),
            ]
            return jnp.where(inside, val, jax.scipy.special.logit(jnp.clip(gp, 1e-6, 1 - 1e-6)))

        logits = jax.vmap(local_pass)(boxes, global_pred, masks.astype(jnp.float32), bvalid)
        refined = (jax.nn.sigmoid(logits) > 0.5) & valid[:, None, None]
        return refined

    def predict(self, rgb_path, depth_path, initial_masks, fg_mask):
        import time

        from quber_tpu.evaluation.refiner_models import _load_rgbd

        rgb, depth_n, zero_depth = _load_rgbd(rgb_path, depth_path)
        h, w = rgb.shape[:2]
        n = self.MAX_INSTANCES
        masks = np.zeros((n, h, w), np.float32)
        count = min(len(initial_masks), n)
        for i in range(count):
            masks[i] = np.asarray(initial_masks[i]) > 0
        valid = np.zeros((n,), bool)
        valid[:count] = True
        image = np.concatenate([rgb.astype(np.float32), depth_n.astype(np.float32)], -1)
        t0 = time.time()
        refined = np.asarray(self._refine(
            self.params, jnp.asarray(image), jnp.asarray(masks), jnp.asarray(valid)
        ))[:count]
        elapsed = time.time() - t0
        if self.dataset == "OCID" and len(refined):
            import cv2

            zd = cv2.resize(zero_depth.astype(np.uint8), (w, h),
                            interpolation=cv2.INTER_NEAREST).astype(bool)
            refined = refined & ~zd[None]
        return refined, None, elapsed, fg_mask
