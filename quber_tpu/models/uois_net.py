"""UOIS-Net-3D base segmenter: Depth Seeding Network + Region Refinement.

TPU-native rebuild of the reference's UOIS-Net-3D
(/root/reference/uois/src/segmentation.py:72-520 — DepthSeedingNetwork, RRN,
UOISNet3D; wrapped at eval/base_model.py:441-520):

  * DSN: a U-Net over the organized XYZ point cloud predicting foreground
    logits and 3D center-offset votes; instances come from Euclidean
    mean-shift clustering of (xyz + offset) votes
    (quber_tpu.ops.meanshift.cluster_points_euclidean, replacing the
    reference's GPU mean-shift in uois/src/cluster.py)
  * initial mask processing: open/close morphology + small-component cull
  * RRN: a U-Net over RGB + initial mask refining each instance; crops are
    fixed-size (resize-to-224) and vmapped over instances
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import ConvNorm, upsample_bilinear
from quber_tpu.ops.meanshift import cluster_points_euclidean
from quber_tpu.ops import morphology


class UNet(nn.Module):
    """Small encoder-decoder with skip connections."""

    out_channels: int
    base: int = 32
    levels: int = 4
    norm: str = "GN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        t, d = self.train, self.dtype
        skips = []
        y = x.astype(d)
        for i in range(self.levels):
            ch = self.base * (2**i)
            y = ConvNorm(ch, 3, norm=self.norm, act=nn.relu, train=t, dtype=d,
                         name=f"down_{i}_a")(y)
            y = ConvNorm(ch, 3, norm=self.norm, act=nn.relu, train=t, dtype=d,
                         name=f"down_{i}_b")(y)
            skips.append(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = ConvNorm(self.base * (2**self.levels), 3, norm=self.norm, act=nn.relu,
                     train=t, dtype=d, name="bottleneck")(y)
        for i in reversed(range(self.levels)):
            ch = self.base * (2**i)
            y = upsample_bilinear(y.astype(jnp.float32),
                                  size=(skips[i].shape[1], skips[i].shape[2])).astype(d)
            y = jnp.concatenate([y, skips[i]], axis=-1)
            y = ConvNorm(ch, 3, norm=self.norm, act=nn.relu, train=t, dtype=d,
                         name=f"up_{i}")(y)
        return nn.Conv(self.out_channels, (1, 1), dtype=d, name="head")(y).astype(jnp.float32)


class DepthSeedingNetwork(nn.Module):
    """XYZ [B, H, W, 3] -> (fg_logits [B, H, W, 2], offsets [B, H, W, 3])."""

    norm: str = "GN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz):
        out = UNet(5, norm=self.norm, train=self.train, dtype=self.dtype,
                   name="unet")(xyz)
        return out[..., :2], out[..., 2:]


class RegionRefinementNetwork(nn.Module):
    """RGB + mask [B, H, W, 4] -> refined mask logit [B, H, W, 1]."""

    norm: str = "GN"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return UNet(1, norm=self.norm, train=self.train, dtype=self.dtype,
                    name="unet")(x)


class UOISNet3DBaseModel:
    """Eval-harness wrapper: DSN cluster -> morphology IMP -> RRN refine."""

    MAX_INSTANCES = 32

    def __init__(self, dsn_params=None, rrn_params=None, dataset="OSD", seed=0):
        self.dsn = DepthSeedingNetwork(dtype=jnp.bfloat16)
        self.rrn = RegionRefinementNetwork(dtype=jnp.bfloat16)
        if dsn_params is None:
            dsn_params = jax.jit(self.dsn.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, 480, 640, 3)))
        if rrn_params is None:
            rrn_params = jax.jit(self.rrn.init)(
                jax.random.PRNGKey(seed + 1), jnp.zeros((1, 480, 640, 4)))
        self.dsn_params = dsn_params
        self.rrn_params = rrn_params
        self.dataset = dataset

        def pipeline(dsn_params, rrn_params, rgb, xyz):
            fg_logits, offsets = self.dsn.apply(dsn_params, xyz[None])
            fg = jnp.argmax(fg_logits[0], axis=-1).astype(jnp.float32)
            votes = xyz + offsets[0]
            clustered = cluster_points_euclidean(votes, fg)
            labels = clustered["labels"]
            n = clustered["num_instances"]
            # IMP: open then close each instance region (3x3, 1 iter)
            onehot = labels[None] == (jnp.arange(self.MAX_INSTANCES) + 1)[:, None, None]
            opened = morphology.dilate(morphology.erode(onehot.astype(jnp.float32), 1), 1)
            closed = morphology.erode(morphology.dilate(opened, 1), 1)
            # RRN refine per instance (full-frame masks; masked input)
            def refine(mask):
                inp = jnp.concatenate([rgb, mask[..., None]], axis=-1)
                return self.rrn.apply(rrn_params, inp[None])[0, ..., 0]
            logits = jax.vmap(refine)(closed)
            refined = (jax.nn.sigmoid(logits) > 0.5) & (closed > 0.0)
            return refined, n

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
        refined, n = self._pipeline(
            self.dsn_params, self.rrn_params, jnp.asarray(rgb_in), jnp.asarray(xyz)
        )
        refined, n = np.asarray(refined), int(n)
        elapsed = time.time() - t0
        return refined[:n], None, elapsed


def dsn_losses(fg_logits, offsets, fg_target, offset_target, fg_weight=1.0,
               offset_weight=1.0):
    """DSN training losses: CE on foreground + smooth-L1 on offset votes
    restricted to foreground (uois training recipe)."""
    logp = jax.nn.log_softmax(fg_logits, axis=-1)
    t = fg_target.astype(jnp.int32)
    ce = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    fg_loss = jnp.mean(ce)
    diff = offsets - offset_target
    l1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2, jnp.abs(diff) - 0.5)
    m = (fg_target > 0).astype(jnp.float32)[..., None]
    off_loss = jnp.sum(l1 * m) / jnp.maximum(jnp.sum(m) * 3, 1.0)
    return {"loss_fg": fg_weight * fg_loss, "loss_offset": offset_weight * off_loss}
