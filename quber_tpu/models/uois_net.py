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


# ---------------------------------------------------------------------------
# Full training recipe: fixed-shape re-derivation of the reference DSNTrainer
# / RRNTrainer losses (/root/reference/uois/src/train.py:151-254,306-330 and
# losses.py:12-188). Every data-dependent host loop (unique-label scans,
# boolean-mask gathers) becomes a masked fixed-shape computation so the whole
# step jits.
# ---------------------------------------------------------------------------


def inverse_frequency_weights(labels, num_classes, ignore=(), image_axes=(-2, -1)):
    """Per-element weight = 1 / (pixel count of that element's class within
    its image); classes in `ignore` get weight 0.

    Rebuilds WeightedLoss.generate_weight_mask(weighted=True)
    (/root/reference/uois/src/losses.py:18-51) without the per-image
    unique-label Python loop: a one-hot count over `image_axes` followed by a
    gather-by-one-hot. labels: integer array; `image_axes` are the per-image
    reduction axes ((-2, -1) for [..., H, W] maps, (-1,) for label vectors).
    """
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    axes = tuple(a - 1 for a in image_axes)  # shift past the class axis
    counts = jnp.sum(onehot, axis=axes, keepdims=True)
    inv = jnp.where(counts > 0, 1.0 / jnp.maximum(counts, 1.0), 0.0)
    w = jnp.sum(onehot * inv, axis=-1)
    for c in ignore:
        w = jnp.where(labels == c, 0.0, w)
    return w


def _weighted_ce(logits, target, weights):
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                              axis=-1)[..., 0]
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1e-12)


def dsn_foreground_loss(fg_logits, fg_target):
    """Class-balanced CE on the foreground logits (CELossWeighted,
    losses.py:54-72): per-image inverse-pixel-count class weights."""
    w = inverse_frequency_weights(fg_target, fg_logits.shape[-1])
    return _weighted_ce(fg_logits, fg_target, w)


def dsn_offset_loss(offsets, offset_target, instance_labels, num_classes):
    """Smooth-L1 on center-offset votes, weighted by the inverse pixel count
    of each pixel's INSTANCE label (SmoothL1LossWeighted with
    mask=foreground_labels, losses.py:137-159 + train.py:209)."""
    diff = offsets - offset_target
    l1 = jnp.sum(jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2,
                           jnp.abs(diff) - 0.5), axis=-1)
    w = inverse_frequency_weights(instance_labels, num_classes)
    return jnp.sum(l1 * w) / jnp.maximum(jnp.sum(w), 1e-12)


def dsn_separation_loss(votes, gt_centers, centers_valid, instance_labels,
                        tau=15.0, object_label=2):
    """CE pushing each foreground pixel's 3D vote toward its OWN object
    center and away from the others (train.py:220-230 + create_M_GT,
    losses.py:97-115): logits = -tau * ||vote - center_k|| over the K GT
    centers (segmentation.py:189-204), target = compact object index.

    instance_labels must be compact: {0..object_label-1} = background
    classes, object_label + k = object k (create_M_GT's unique-scan reduces
    to a subtraction then). Invalid center slots are masked to -inf.
    """
    k = gt_centers.shape[0]
    d = jnp.linalg.norm(votes[..., None, :] - gt_centers, axis=-1)
    logits = jnp.where(centers_valid, -tau * d, -1e9)
    m_gt = jnp.clip(instance_labels - object_label, 0, k - 1)
    w = inverse_frequency_weights(
        instance_labels, k + object_label, ignore=tuple(range(object_label)))
    return _weighted_ce(logits, m_gt, w)


def _gaussian_mean_shift_iter(seeds, points, sigma):
    """One GBMS hill-climb step (train.py:49-63): seeds move to the
    Gaussian-KDE-weighted mean of the points. Two MXU matmuls."""
    d2 = jnp.sum((seeds[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    w = jnp.exp(-d2 / (2.0 * sigma**2))
    return (w @ points) / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)


def _cluster_pair_loss(x1, y1, w1, x2, y2, w2, delta):
    """ClusterLossWeighted (losses.py:161-188): pull same-label pairs
    together (d^2), push different-label pairs past `delta` (hinge^2),
    each pair weighted by the outer product of inverse label frequencies."""
    ind = (y1[:, None] == y2[None, :]).astype(jnp.float32)
    dist = jnp.sqrt(jnp.maximum(
        jnp.sum((x1[:, None, :] - x2[None, :, :]) ** 2, axis=-1), 1e-12))
    pos = ind * dist**2
    neg = (1.0 - ind) * jnp.maximum(delta - dist, 0.0) ** 2
    return jnp.sum(w1[:, None] * w2[None, :] * (pos + neg))


def dsn_cluster_loss(votes, instance_labels, key, *, num_classes,
                     object_label=2, num_samples=256, num_seeds=32,
                     sigma=0.02, delta=0.1, iters=5):
    """Mean-shift cluster loss (train.py:232-245): subsample foreground
    votes, hill-climb seed points through the vote KDE for `iters` GBMS
    steps, and after each step apply the pull/push pair loss between the
    seeds and the samples.

    Fixed-shape version of the reference's boolean-mask gathers: samples are
    drawn with probability proportional to the foreground mask (so padding
    never enters), seeds are drawn uniformly from those samples (the
    reference's per-object balancing is approximated by the inverse-frequency
    pair weights, which already equalize objects). Returns 0 when the frame
    has no foreground.
    """
    d = votes.shape[-1]
    flat_votes = votes.reshape(-1, d)
    flat_labels = instance_labels.reshape(-1)
    fg = (flat_labels >= object_label).astype(jnp.float32)
    total = jnp.sum(fg)
    p = jnp.where(total > 0, fg / jnp.maximum(total, 1.0),
                  jnp.full_like(fg, 1.0 / fg.shape[0]))
    k1, k2 = jax.random.split(key)
    idx = jax.random.choice(k1, fg.shape[0], (num_samples,), replace=True, p=p)
    x_fg, y_fg = flat_votes[idx], flat_labels[idx]
    sidx = jax.random.choice(k2, num_samples, (num_seeds,), replace=True)
    x_i, y_i = x_fg[sidx], y_fg[sidx]
    w_fg = inverse_frequency_weights(y_fg, num_classes + object_label,
                                     image_axes=(-1,))
    w_i = inverse_frequency_weights(y_i, num_classes + object_label,
                                    image_axes=(-1,))

    def body(x_i, _):
        x_i = _gaussian_mean_shift_iter(x_i, x_fg, sigma)
        return x_i, _cluster_pair_loss(x_i, y_i, w_i, x_fg, y_fg, w_fg, delta)

    _, losses = jax.lax.scan(body, x_i, None, length=iters)
    return jnp.where(total > 0, jnp.sum(losses) / iters, 0.0)


def dsn_train_losses(fg_logits, offsets, xyz, offset_target,
                     instance_labels, gt_centers, centers_valid, key, *,
                     object_label=2, tau=15.0, sigma=0.02, delta=0.1,
                     num_samples=256, num_seeds=32, gms_iters=5,
                     lambda_fg=3.0, lambda_co=5.0, lambda_sep=1.0,
                     lambda_cl=1.0):
    """The DSNTrainer objective (train.py:204-254) for ONE frame: weighted
    foreground CE + weighted offset smooth-L1 + separation CE + mean-shift
    cluster loss, with the reference's lambda weighting. The fg target is
    the clamp of the instance labels to the logit class count, exactly
    train.py:205's `foreground_labels.clamp(0, 2)`. `votes` = xyz +
    predicted offsets, as in train.py:221. vmap over frames and mean to get
    the batch loss."""
    votes = xyz + offsets
    k = gt_centers.shape[0]
    return {
        "loss_fg": lambda_fg * dsn_foreground_loss(
            fg_logits, jnp.clip(instance_labels, 0, fg_logits.shape[-1] - 1)),
        "loss_offset": lambda_co * dsn_offset_loss(
            offsets, offset_target, instance_labels, k + object_label),
        "loss_separation": lambda_sep * dsn_separation_loss(
            votes, gt_centers, centers_valid, instance_labels, tau=tau,
            object_label=object_label),
        "loss_cluster": lambda_cl * dsn_cluster_loss(
            votes, instance_labels, key, num_classes=k,
            object_label=object_label, num_samples=num_samples,
            num_seeds=num_seeds, sigma=sigma, delta=delta, iters=gms_iters),
    }


def rrn_loss(logits, target):
    """RRNTrainer objective (train.py:306-330): BCE-with-logits on the
    refined mask, weighted by inverse per-image class frequency
    (BCEWithLogitsLossWeighted, losses.py:118-135)."""
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    w = inverse_frequency_weights(target.astype(jnp.int32), 2)
    return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w), 1e-12)
