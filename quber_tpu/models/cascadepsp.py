"""CascadePSP-RGBD refiner baseline (PSPNet_UOAIS, weight-compatible port).

TPU-native rebuild of the reference baseline
(/root/reference/pspnet.py:9-293 PSPNet_UOAIS + PSPModule + PSPUpsample,
/root/reference/extractors.py:189-249 ResNet_UOAIS resnet50 extractor,
wrapper /root/reference/eval/refiner_model.py:300-404): a PSPNet over a
7-channel input (ImageNet-normalized RGB(3) + depth(1) + mask(1)x3 with the
[-1,1] seg normalization), whose forward internally runs the trunk three
times with tanh prediction feedback (s8 -> s4 -> s1 cascade).

The module tree mirrors the reference layer-for-layer so
import_zoo.import_cascadepsp can load the reference's trained
`model_40000` checkpoints; SynchronizedBatchNorm2d == BatchNorm in eval
mode. The reference's data-dependent high-res crop loop
(eval/cascadepsp_rgbd.py process_high_res_im_depth, L=900) becomes a
fixed-shape global + ROI-zoom cascade vmapped over the instance axis.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import upsample_bilinear


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class Bottleneck(nn.Module):
    """extractors.py:218-249 Bottleneck (torchvision naming)."""

    planes: int
    strides: int = 1
    dilation: int = 1
    has_downsample: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        p, dil = self.planes, self.dilation
        y = nn.Conv(p, (1, 1), use_bias=False, dtype=d, name="conv1")(x)
        y = _bn(self.train, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(p, (3, 3), strides=(self.strides, self.strides),
                    padding=[(dil, dil)] * 2, kernel_dilation=(dil, dil),
                    use_bias=False, dtype=d, name="conv2")(y)
        y = _bn(self.train, "bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(p * 4, (1, 1), use_bias=False, dtype=d, name="conv3")(y)
        y = _bn(self.train, "bn3")(y)
        if self.has_downsample:
            sc = nn.Conv(p * 4, (1, 1), strides=(self.strides, self.strides),
                         use_bias=False, dtype=d, name="downsample_conv")(x)
            sc = _bn(self.train, "downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(y + sc)


class ResNetPSP(nn.Module):
    """extractors.py ResNet_UOAIS: 7-ch stem, layer3/4 stride-1 dilated.

    Returns (layer4 /8 2048ch, conv1 /2 64ch, layer1 /4 256ch) matching the
    reference's (x, x_1, x_2)."""

    in_channels: int = 7
    layers: tuple = (3, 4, 6, 3)
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                     use_bias=False, dtype=d, name="conv1")(x)
        y = nn.relu(_bn(self.train, "bn1")(x1))
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))
        specs = [  # (planes, stride, dilation) per reference _make_layer
            (64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)
        ]
        feats = []
        for li, ((planes, stride, dil), n) in enumerate(zip(specs, self.layers)):
            for bi in range(n):
                # reference quirk (_make_layer): the FIRST block of each
                # layer gets dilation=1 (default arg), later blocks get the
                # layer dilation
                y = Bottleneck(
                    planes, strides=stride if bi == 0 else 1,
                    dilation=1 if bi == 0 else dil,
                    has_downsample=(bi == 0 and (stride != 1 or li != 0 or planes * 4 != 64)),
                    train=self.train, dtype=d, name=f"layer{li + 1}_{bi}",
                )(y)
            feats.append(y)
        return feats[3], x1, feats[0]


class PSPModule(nn.Module):
    """pspnet.py:9-27: adaptive-pool pyramid + 1x1 bottleneck."""

    out_features: int = 1024
    sizes: tuple = (1, 2, 3, 6)
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape

        def adaptive_pool(x, oh, ow):
            # torch AdaptiveAvgPool2d: cell (i,j) averages rows
            # [floor(i*h/oh), ceil((i+1)*h/oh))
            rows = []
            for i in range(oh):
                r0, r1 = (i * h) // oh, -(-((i + 1) * h) // oh)
                cols = []
                for j in range(ow):
                    c0, c1 = (j * w) // ow, -(-((j + 1) * w) // ow)
                    cols.append(x[:, r0:r1, c0:c1].mean(axis=(1, 2)))
                rows.append(jnp.stack(cols, axis=1))
            return jnp.stack(rows, axis=1)

        priors = []
        for i, size in enumerate(self.sizes):
            p = adaptive_pool(x, size, size)
            p = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"stage_{i}")(p)
            priors.append(upsample_bilinear(p, size=(h, w)))
        bottle = nn.Conv(self.out_features, (1, 1), dtype=self.dtype,
                         name="bottleneck")(jnp.concatenate(priors + [x], -1))
        return nn.relu(bottle)


class PSPUpsample(nn.Module):
    """pspnet.py:30-60: x2 upsample + double residual conv stack."""

    out_channels: int
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, up):
        t, d = self.train, self.dtype
        h, w = x.shape[1] * 2, x.shape[2] * 2
        x = upsample_bilinear(x, size=(h, w))
        cat = jnp.concatenate([x, up], axis=-1)

        def block(y, prefix):
            y = nn.relu(_bn(t, f"{prefix}_bn0")(y))
            y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=d,
                        name=f"{prefix}_conv0")(y)
            y = nn.relu(_bn(t, f"{prefix}_bn1")(y))
            return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=d,
                           name=f"{prefix}_conv1")(y)

        p = block(cat, "conv") + nn.Conv(self.out_channels, (1, 1), dtype=d,
                                         name="shortcut")(x)
        return p + block(p, "conv2")


class PSPNetUOAIS(nn.Module):
    """pspnet.py:175-293 PSPNet_UOAIS: the full 3-iteration cascade forward.

    Input (NHWC): rgb [B,H,W,3] ImageNet-normalized, depth [B,H,W,1] in
    [0,1], seg [B,H,W,1] in [-1,1]. Returns dict with out_224 (final
    logit), pred_224, and the intermediate s8/s56 outputs.
    """

    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth, seg):
        t, d = self.train, self.dtype
        h, w = rgb.shape[1], rgb.shape[2]
        feats = ResNetPSP(train=t, dtype=d, name="feats")
        psp = PSPModule(1024, (1, 2, 3, 6), t, d, name="psp")
        up_1 = PSPUpsample(512, t, d, name="up_1")
        up_2 = PSPUpsample(256, t, d, name="up_2")
        up_3 = PSPUpsample(32, t, d, name="up_3")

        f28_0 = nn.Conv(32, (1, 1), dtype=d, name="final_28_0")
        f28_2 = nn.Conv(1, (1, 1), dtype=d, name="final_28_2")
        f56_0 = nn.Conv(32, (1, 1), dtype=d, name="final_56_0")
        f56_2 = nn.Conv(1, (1, 1), dtype=d, name="final_56_2")

        def final_28(p):
            return f28_2(nn.relu(f28_0(p)))

        def final_56(p):
            return f56_2(nn.relu(f56_0(p)))

        images = {}
        # iteration 1: s8
        x = jnp.concatenate([rgb, depth, seg, seg, seg], axis=-1).astype(d)
        f, _, _ = feats(x)
        p = psp(f)
        inter_s8 = final_28(p)
        r_inter_s8 = upsample_bilinear(inter_s8, size=(h, w))
        r_inter_tanh_s8 = jnp.tanh(r_inter_s8)
        images["out_28"] = r_inter_s8.astype(jnp.float32)

        # iteration 2: s4
        x = jnp.concatenate([rgb, depth, seg, r_inter_tanh_s8,
                             r_inter_tanh_s8], axis=-1).astype(d)
        f, f_1, f_2 = feats(x)
        p = psp(f)
        inter_s8_2 = final_28(p)
        r_inter_s8_2 = upsample_bilinear(inter_s8_2, size=(h, w))
        r_inter_tanh_s8_2 = jnp.tanh(r_inter_s8_2)
        p = up_1(p, f_2)
        inter_s4 = final_56(p)
        r_inter_s4 = upsample_bilinear(inter_s4, size=(h, w))
        r_inter_tanh_s4 = jnp.tanh(r_inter_s4)
        images["out_28_2"] = r_inter_s8_2.astype(jnp.float32)
        images["out_56"] = r_inter_s4.astype(jnp.float32)

        # iteration 3: s1
        x = jnp.concatenate([rgb, depth, seg, r_inter_tanh_s8_2,
                             r_inter_tanh_s4], axis=-1).astype(d)
        f, f_1, f_2 = feats(x)
        p = psp(f)
        inter_s8_3 = final_28(p)
        images["out_28_3"] = upsample_bilinear(inter_s8_3, size=(h, w)).astype(jnp.float32)
        p = up_1(p, f_2)
        inter_s4_2 = final_56(p)
        images["out_56_2"] = upsample_bilinear(inter_s4_2, size=(h, w)).astype(jnp.float32)
        p = up_2(p, f_1)
        p = up_3(p, rgb.astype(d))

        p = nn.relu(nn.Conv(32, (1, 1), dtype=d, name="final_11")(
            jnp.concatenate([p, rgb.astype(d)], axis=-1)))
        p = nn.Conv(1, (1, 1), dtype=d, name="final_21")(p)
        images["out_224"] = p.astype(jnp.float32)
        images["pred_224"] = jax.nn.sigmoid(images["out_224"])
        return images


IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class CascadePSPRefiner:
    """Eval-harness refiner: per-mask global + ROI-zoom cascade.

    predict(rgb_path, depth_path, initial_masks, fg_mask)
      -> (refined [N, H, W] bool, None, seconds, fg_mask)
    """

    GLOBAL = 224
    MAX_INSTANCES = 32

    def __init__(self, params=None, dataset="OSD", seed=0):
        self.model = PSPNetUOAIS()
        if params is None:
            g = self.GLOBAL
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, g, g, 3)),
                jnp.zeros((1, g, g, 1)), jnp.zeros((1, g, g, 1)),
            )
        self.params = params
        self.dataset = dataset
        self._refine = jax.jit(self._refine_impl)

    def _apply(self, params, rgb, depth, seg):
        out = self.model.apply(params, rgb, depth, seg)
        return out["out_224"]

    def _refine_impl(self, params, image, masks, valid):
        """image [H, W, 6] f32 0..255 (rgb + 3ch depth); masks [N, H, W].

        Fixed-shape counterpart of the reference's process_high_res_im_depth
        crop loop (eval/cascadepsp_rgbd.py:9-131): a global pass at
        GLOBAL^2 (the network itself cascades s8->s4->s1 internally),
        followed by one ROI zoom pass around each mask's box."""
        from quber_tpu.models.ucn import instance_boxes_from_labels
        from quber_tpu.ops.boxes import roi_align

        g = self.GLOBAL
        h, w = masks.shape[1], masks.shape[2]
        rgb = (image[..., :3] / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        depth = image[..., 3:4] / 255.0
        rgb_small = jax.image.resize(rgb, (g, g, 3), "bilinear")
        depth_small = jax.image.resize(depth, (g, g, 1), "bilinear")

        def global_pass(mask):
            m = jax.image.resize(mask, (g, g), "bilinear")
            seg = (m[..., None] - 0.5) / 0.5
            logit = self._apply(params, rgb_small[None], depth_small[None],
                                seg[None])[0, ..., 0]
            return jax.image.resize(logit, mask.shape, "bilinear")

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
            crop_rgb = roi_align(rgb, box[None], out_size=g)[0]
            crop_depth = roi_align(depth, box[None], out_size=g)[0]
            crop_gp = roi_align(gp[..., None], box[None], out_size=g)[0, ..., 0]
            seg = (crop_gp[..., None] - 0.5) / 0.5
            logit = self._apply(params, crop_rgb[None], crop_depth[None],
                                seg[None])[0, ..., 0]
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


def cascadepsp_refine_loss(images, target):
    """CascadePSP training objective on one batch.

    The reference trains segmentation-refinement.PSPNet with per-stage
    supervision: cross-entropy on every cascade side output (the s8/s4
    intermediates at all three iterations) plus L1+L2 and an L1 gradient
    (edge) term on the final s1 prediction — the recipe the released
    `model_40000`-style checkpoints were produced with. `images` is the
    PSPNetUOAIS output dict; `target` is the GT mask [B, H, W] in {0, 1}.
    """
    def bce(logit):
        z, t = logit[..., 0], target
        # numerically-stable sigmoid BCE
        return jnp.mean(jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z))))

    losses = {f"bce_{k}": bce(images[k])
              for k in ("out_28", "out_28_2", "out_28_3", "out_56",
                        "out_56_2")}
    losses["bce_224"] = bce(images["out_224"])
    pred = images["pred_224"][..., 0]
    losses["l1_224"] = jnp.abs(pred - target).mean()
    losses["l2_224"] = jnp.square(pred - target).mean()
    # edge fidelity: first-difference gradients of pred vs target
    gy = jnp.abs(jnp.diff(pred, axis=1) - jnp.diff(target, axis=1)).mean()
    gx = jnp.abs(jnp.diff(pred, axis=2) - jnp.diff(target, axis=2)).mean()
    losses["grad_224"] = 5.0 * (gy + gx)
    return losses
