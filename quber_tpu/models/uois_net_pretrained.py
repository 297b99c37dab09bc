"""Weight-compatible UOIS-Net-3D port (DSN + RRN): the checkpoint seam.

The reference eval loads two trained torch checkpoints for UOIS-Net-3D —
`DepthSeedingNetwork_3D_TOD_checkpoint.pth` and `RRN_OID_checkpoint.pth`
(/root/reference/eval/base_model.py:441-455, config
ext_modules/uois/uoisnet3d.yaml: feature_dim 64 for both nets). This module
re-implements those exact architectures as NHWC flax modules whose
parameter tree maps 1:1 onto the torch state dicts:

  * DSN = UNetESP_Encoder(3ch XYZ) + UNetESP_Decoder + two bias-free 1x1
    heads (3-class bg/table/object logits, 3D center offsets)
    (/root/reference/uois/src/networks.py:281-369,
     segmentation.py:96-126)
  * RRN = UNet_Encoder(4ch RGB+mask) + UNet_Decoder(num_encoders=1) + one
    bias-free 1x1 foreground head
    (/root/reference/uois/src/networks.py:191-278,
     segmentation.py:268-293)

The TPU-first redesign (generic UNet, fused pipeline) lives in
quber_tpu/models/uois_net.py; this variant exists so the deployed
checkpoints can be imported (models/import_zoo.import_uois_dsn/_rrn via
tools/import_checkpoint.py) and run through the harness as base-model name
"uoisnet3d-pretrained".

Layer-semantics notes for parity:
  * torch GroupNorm(num_groups=feature_dim) with eps 1e-5 (flax default is
    1e-6 — overridden here).
  * nn.Upsample(scale_factor=2, mode="bilinear") is align_corners=False,
    i.e. half-pixel centers == jax.image.resize "bilinear".
  * every conv is bias-free except the decoders' last_conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from quber_tpu.models.layers import upsample_bilinear


class _ConvGNReLU(nn.Module):
    """Conv2d_GN_ReLU (networks.py:12-33): bias-free conv + GN + ReLU."""

    features: int
    num_groups: int
    ksize: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (self.ksize, self.ksize), use_bias=False,
                    padding="SAME", dtype=self.dtype, name="conv1")(x)
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                         dtype=self.dtype, name="gn1")(y)
        return nn.relu(y)


class _ConvGNReLUx2(nn.Module):
    """Conv2d_GN_ReLUx2 (networks.py:35-55)."""

    features: int
    num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = _ConvGNReLU(self.features, self.num_groups, dtype=self.dtype,
                        name="layer1")(x)
        return _ConvGNReLU(self.features, self.num_groups, dtype=self.dtype,
                           name="layer2")(y)


class _ESPModule(nn.Module):
    """ESP module, GN/ReLU variant (networks.py:58-129): reduce + dilated
    pyramid (1/2/4/8/16) + hierarchical feature fusion + residual add."""

    features: int
    num_groups: int
    ksize: int = 1
    add: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.features // 5
        n1 = self.features - 4 * n
        d = self.dtype
        r = nn.Conv(n, (self.ksize, self.ksize), use_bias=False,
                    padding="SAME", dtype=d, name="conv1")(x)

        def dil(feat, rate, name):
            return nn.Conv(feat, (3, 3), use_bias=False, padding="SAME",
                           kernel_dilation=(rate, rate), dtype=d, name=name)(r)

        d1 = dil(n1, 1, "dilated1")
        d2 = dil(n, 2, "dilated2")
        d4 = dil(n, 4, "dilated4")
        d8 = dil(n, 8, "dilated8")
        d16 = dil(n, 16, "dilated16")
        add1 = d2
        add2 = add1 + d4
        add3 = add2 + d8
        add4 = add3 + d16
        y = jnp.concatenate([d1, add1, add2, add3, add4], axis=-1)
        if self.add:
            y = x + y
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, dtype=d,
                         name="gn")(y)
        return nn.relu(y)


class _UpCatConvGNReLU(nn.Module):
    """Upsample_Concat_Conv2d_GN_ReLU (networks.py:131-184, both the single
    and the num_encoders=1 multi-branch variant share key names): channel
    halving conv + 2x bilinear upsample + skip concat + conv."""

    features: int
    num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        y = _ConvGNReLU(x.shape[-1] // 2, self.num_groups, dtype=self.dtype,
                        name="channel_reduction_layer")(x)
        y = upsample_bilinear(y.astype(jnp.float32), scale=2).astype(self.dtype)
        y = jnp.concatenate([y, skip.astype(self.dtype)], axis=-1)
        return _ConvGNReLU(self.features, self.num_groups, dtype=self.dtype,
                           name="conv_gn_relu")(y)


def _maxpool2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class _UNetESPEncoder(nn.Module):
    """UNetESP_Encoder (networks.py:281-318): the DSN trunk."""

    in_channels: int
    fd: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fd, d = self.fd, self.dtype
        x1 = _ConvGNReLUx2(fd, fd, dtype=d, name="layer1")(x.astype(d))
        x2 = _ConvGNReLUx2(fd * 2, fd, dtype=d, name="layer2")(_maxpool2x2(x1))
        x3 = _ConvGNReLU(fd * 4, fd, dtype=d, name="layer3a")(_maxpool2x2(x2))
        x3 = _ESPModule(fd * 4, fd, ksize=3, dtype=d, name="layer3b")(x3)
        x4 = _ConvGNReLU(fd * 8, fd, dtype=d, name="layer4a")(_maxpool2x2(x3))
        x4 = _ESPModule(fd * 8, fd, ksize=3, dtype=d, name="layer4b")(x4)
        x5 = _ConvGNReLU(fd * 16, fd, dtype=d, name="last_layer")(_maxpool2x2(x4))
        return x5, [x1, x2, x3, x4]


class _UNetESPDecoder(nn.Module):
    """UNetESP_Decoder (networks.py:321-369): ESP fuse + 4 up-concat stages."""

    fd: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips):
        fd, d = self.fd, self.dtype
        y = _ESPModule(fd * 16, fd, ksize=1, dtype=d, name="fuse_layer")(x)
        y = _UpCatConvGNReLU(fd * 8, fd, dtype=d, name="layer1")(y, skips[3])
        y = _UpCatConvGNReLU(fd * 4, fd, dtype=d, name="layer2")(y, skips[2])
        y = _UpCatConvGNReLU(fd * 2, fd, dtype=d, name="layer3")(y, skips[1])
        y = _UpCatConvGNReLU(fd, fd, dtype=d, name="layer4")(y, skips[0])
        y = _ConvGNReLU(fd, fd, dtype=d, name="layer5")(y)
        return nn.Conv(fd, (3, 3), use_bias=True, padding="SAME", dtype=d,
                       name="last_conv")(y)


class _UNetEncoder(nn.Module):
    """UNet_Encoder (networks.py:191-224): the RRN trunk."""

    in_channels: int
    fd: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fd, d = self.fd, self.dtype
        x1 = _ConvGNReLUx2(fd, fd, dtype=d, name="layer1")(x.astype(d))
        x2 = _ConvGNReLUx2(fd * 2, fd, dtype=d, name="layer2")(_maxpool2x2(x1))
        x3 = _ConvGNReLUx2(fd * 4, fd, dtype=d, name="layer3")(_maxpool2x2(x2))
        x4 = _ConvGNReLUx2(fd * 8, fd, dtype=d, name="layer4")(_maxpool2x2(x3))
        x5 = _ConvGNReLU(fd * 16, fd, dtype=d, name="last_layer")(_maxpool2x2(x4))
        return x5, [x1, x2, x3, x4]


class _UNetDecoder(nn.Module):
    """UNet_Decoder with num_encoders=1 (networks.py:227-278): 1x1 conv fuse
    + 4 multi-branch up-concat stages (identical keys to the single-branch
    variant when there is one encoder)."""

    fd: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips):
        fd, d = self.fd, self.dtype
        y = _ConvGNReLU(fd * 16, fd, ksize=1, dtype=d, name="fuse_layer")(x)
        y = _UpCatConvGNReLU(fd * 8, fd, dtype=d, name="layer1")(y, skips[3])
        y = _UpCatConvGNReLU(fd * 4, fd, dtype=d, name="layer2")(y, skips[2])
        y = _UpCatConvGNReLU(fd * 2, fd, dtype=d, name="layer3")(y, skips[1])
        y = _UpCatConvGNReLU(fd, fd, dtype=d, name="layer4")(y, skips[0])
        y = _ConvGNReLU(fd, fd, dtype=d, name="layer5")(y)
        return nn.Conv(fd, (3, 3), use_bias=True, padding="SAME", dtype=d,
                       name="last_conv")(y)


class PretrainedDSN(nn.Module):
    """DepthSeedingNetwork (segmentation.py:72-126): XYZ [B,H,W,3] ->
    (fg logits [B,H,W,3] bg/table/object, 3D center offsets [B,H,W,3])."""

    feature_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz):
        fd, d = self.feature_dim, self.dtype
        x5, skips = _UNetESPEncoder(3, fd, dtype=d, name="encoder")(xyz)
        feats = _UNetESPDecoder(fd, dtype=d, name="decoder")(x5, skips)
        fg = nn.Conv(3, (1, 1), use_bias=False, dtype=d, name="fg_module")(feats)
        cd = nn.Conv(3, (1, 1), use_bias=False, dtype=d, name="cd_module")(feats)
        return fg.astype(jnp.float32), cd.astype(jnp.float32)


class PretrainedRRN(nn.Module):
    """RegionRefinementNetwork (segmentation.py:248-293): RGB+mask
    [B,224,224,4] -> foreground logit [B,224,224]."""

    feature_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fd, d = self.feature_dim, self.dtype
        x5, skips = _UNetEncoder(4, fd, dtype=d, name="encoder")(x)
        feats = _UNetDecoder(fd, dtype=d, name="decoder")(x5, skips)
        fg = nn.Conv(1, (1, 1), use_bias=False, dtype=d, name="fg_module")(feats)
        return fg.astype(jnp.float32)[..., 0]


class UOISNet3DPretrainedBaseModel:
    """Eval-harness wrapper running the imported checkpoints end to end.

    Mirrors UOISNet3D.run_on_batch (/root/reference/uois/src/
    segmentation.py:315-520) as one fused XLA program: DSN on the organized
    XYZ cloud -> Euclidean mean-shift over (xyz + offsets) votes restricted
    to the object class (config: sigma 0.02, epsilon 0.05, min 300 px) ->
    IMP open/close morphology (9x9 kernel ~ 4 iterations of 3x3) -> RRN on
    224x224 crops padded 25% (uoisnet3d.yaml padding_percentage) with
    crop-paste via ops/zoom.zoom_refine_labels.
    """

    MAX_INSTANCES = 24
    ZOOM = 224

    def __init__(self, dsn_variables=None, rrn_variables=None, dataset="OSD",
                 seed=0, feature_dim=64):
        self.dsn = PretrainedDSN(feature_dim=feature_dim, dtype=jnp.bfloat16)
        self.rrn = PretrainedRRN(feature_dim=feature_dim, dtype=jnp.bfloat16)
        if dsn_variables is None:
            dsn_variables = jax.jit(self.dsn.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, 480, 640, 3)))
        if rrn_variables is None:
            rrn_variables = jax.jit(self.rrn.init)(
                jax.random.PRNGKey(seed + 1), jnp.zeros((1, 224, 224, 4)))
        self.dsn_variables = {"params": dsn_variables["params"]}
        self.rrn_variables = {"params": rrn_variables["params"]}
        self.dataset = dataset

        from quber_tpu.ops import morphology
        from quber_tpu.ops.boxes import roi_align
        from quber_tpu.ops.meanshift import cluster_points_euclidean
        from quber_tpu.ops.zoom import zoom_refine_labels

        n_inst, z = self.MAX_INSTANCES, self.ZOOM

        def pipeline(dsn_v, rrn_v, rgb, xyz):
            fg_logits, offsets = self.dsn.apply(dsn_v, xyz[None])
            fg_class = jnp.argmax(fg_logits[0], axis=-1)  # 0 bg / 1 table / 2 obj
            fg = (fg_class == 2).astype(jnp.float32)
            votes = xyz + offsets[0]
            clustered = cluster_points_euclidean(
                votes, fg, num_seeds=n_inst, bandwidth=0.02,
                merge_distance=0.05, min_pixels=300)
            labels = clustered["labels"]
            # IMP (segmentation.py:425-492): open then close each instance
            ids = jnp.arange(1, n_inst + 1)
            onehot = (labels[None] == ids[:, None, None]).astype(jnp.float32)
            opened = morphology.dilate(morphology.erode(onehot, 4), 4)
            closed = morphology.erode(morphology.dilate(opened, 4), 4)
            any_inst = jnp.any(closed > 0, axis=0)
            labels = jnp.where(
                any_inst, jnp.argmax(closed, axis=0).astype(jnp.int32) + 1, 0)

            def refine_one(box, ok, inst_id):
                crop_rgb = roi_align(rgb, box[None], out_size=z)[0]
                crop_mask = roi_align(
                    (labels == inst_id).astype(jnp.float32)[..., None],
                    box[None], out_size=z)[0]
                inp = jnp.concatenate(
                    [crop_rgb, (crop_mask > 0.5).astype(jnp.float32)], axis=-1)
                logit = self.rrn.apply(rrn_v, inp[None])[0]
                return (jax.nn.sigmoid(logit) > 0.5).astype(jnp.float32)

            full = zoom_refine_labels(labels, refine_one, n_inst, z,
                                      pad_ratio=0.25)
            return full, clustered["num_instances"], fg > 0

        self._pipeline = jax.jit(pipeline)

    def predict(self, rgb_path, depth_path):
        import time

        import cv2
        import imageio.v2 as imageio

        from quber_tpu.ops.preprocess import compute_xyz, standardize_image

        rgb = cv2.resize(cv2.imread(rgb_path), (640, 480))
        rgb_in = standardize_image(rgb[..., ::-1])
        if depth_path and depth_path.endswith(".npy"):
            depth_m = np.load(depth_path)
        elif depth_path:
            depth_m = np.asarray(imageio.imread(depth_path)).astype(np.float32) / 1000.0
        else:
            depth_m = np.zeros((480, 640), np.float32)
        depth_m = cv2.resize(depth_m, (640, 480), interpolation=cv2.INTER_NEAREST)
        xyz = compute_xyz(depth_m, {"fx": 550.0, "fy": 550.0, "x_offset": 320.0,
                                    "y_offset": 240.0, "img_width": 640,
                                    "img_height": 480})
        t0 = time.time()
        labels, n, fg = self._pipeline(
            self.dsn_variables, self.rrn_variables,
            jnp.asarray(rgb_in), jnp.asarray(xyz))
        labels, n, fg = np.asarray(labels), int(n), np.asarray(fg)
        elapsed = time.time() - t0
        masks = [labels == i for i in range(1, self.MAX_INSTANCES + 1)
                 if np.any(labels == i)]
        return np.asarray(masks, dtype=bool), fg, elapsed
