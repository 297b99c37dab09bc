"""UCN-class base segmenter: ResNet34-8s metric embeddings + mean-shift.

TPU-native equivalent of UnseenObjectClustering (the reference wraps it at
/root/reference/eval/base_model.py:522-961 with config
seg_resnet34_8s_embedding_cosine_rgbd_add): a stride-8 fully-convolutional
ResNet-34 producing unit-norm per-pixel embeddings, with RGB and depth(XYZ)
branches fused by addition ("rgbd_add"), clustered by the mean-shift ops in
quber_tpu.ops.meanshift. The optional zoom-in second stage re-runs the
network on per-instance crops and pastes refined labels back
(base_model.py:843-961), implemented with fixed-size crops via
jax.image resize so the whole refinement stays jittable.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import max_pool_same, upsample_bilinear
from quber_tpu.ops.meanshift import cluster_embeddings, l2_normalize


class BasicBlock(nn.Module):
    """torchvision-compatible BasicBlock (conv1/bn1/conv2/bn2/downsample)."""

    features: int
    stride: int = 1
    dilation: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, dil = self.dtype, self.dilation
        out = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      padding=[(dil, dil)] * 2, kernel_dilation=(dil, dil),
                      use_bias=False, dtype=d, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                           epsilon=1e-5, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=[(dil, dil)] * 2,
                      kernel_dilation=(dil, dil), use_bias=False, dtype=d,
                      name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                           epsilon=1e-5, name="bn2")(out)
        if x.shape[-1] != self.features or self.stride > 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=d, name="downsample_conv")(x)
            x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                             epsilon=1e-5, name="downsample_bn")(x)
        return nn.relu(out + x)


class ResNet34Trunk8s(nn.Module):
    """ResNet-34 at output stride 8, torchvision dilation semantics.

    Layer3/4 keep stride 1 with dilation doubled per replaced stride: the
    first block of a dilated layer uses the PREVIOUS dilation, later blocks
    the doubled one (torchvision resnet._make_layer(dilate=True) — the UCN
    checkpoint's Resnet34_8s derives from the same torchvision trunk; the
    lib/ submodule itself is absent from the reference snapshot).
    """

    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        t, d = self.train, self.dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=d, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not t, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_same(x, 3, 2)
        # (features, blocks, stride, first_dilation, rest_dilation)
        specs = [(64, 3, 1, 1, 1), (128, 4, 2, 1, 1),
                 (256, 6, 1, 1, 2), (512, 3, 1, 2, 4)]
        for s, (ch, n, stride, dil0, dil) in enumerate(specs):
            for b in range(n):
                x = BasicBlock(ch, stride if b == 0 else 1,
                               dil0 if b == 0 else dil, t, d,
                               name=f"layer{s + 1}_{b}")(x)
        return x  # stride 8, 512 ch


class UCNBranch(nn.Module):
    """One Resnet34_8s branch: trunk + 1x1 embedding conv (the fully-conv
    'fc' head of Resnet34_8s) at stride 8."""

    embed_dim: int = 64
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = ResNet34Trunk8s(self.train, self.dtype, name="trunk")(x)
        return nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="fc")(f)


class UCNEmbeddingNet(nn.Module):
    """Dual-branch (RGB + XYZ) stride-8 embedding network, 'add' fusion.

    Returns unit-norm [B, H, W, embed_dim] embeddings at full resolution
    (seg_resnet34_8s_embedding_cosine_rgbd_add: per-branch embeddings are
    summed, upsampled x8 and normalized).
    """

    embed_dim: int = 64
    norm: str = "BN"  # kept for config compatibility; trunk is BN
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, xyz):
        t, d = self.train, self.dtype
        e_rgb = UCNBranch(self.embed_dim, t, d, name="rgb_branch")(rgb.astype(d))
        e_xyz = UCNBranch(self.embed_dim, t, d, name="depth_branch")(xyz.astype(d))
        emb = e_rgb + e_xyz  # "rgbd_add" fusion
        emb = upsample_bilinear(emb.astype(jnp.float32), scale=8)
        return l2_normalize(emb)


# ---------------------------------------------------------------------------
# Metric-learning training loss (prototype/cosine loss per the UCN recipe)
# ---------------------------------------------------------------------------

def prototype_metric_loss(embeddings, labels, max_instances: int = 32,
                          margin_intra: float = 0.02, margin_inter: float = 0.5):
    """Cosine metric loss: pull pixels to their instance prototype, push
    prototypes apart. embeddings [B, H, W, D] unit-norm; labels [B, H, W]
    int (0 = background counts as its own cluster)."""
    b, h, w, d = embeddings.shape
    x = embeddings.reshape(b, h * w, d)
    lab = labels.reshape(b, h * w)
    onehot = jax.nn.one_hot(lab, max_instances, dtype=x.dtype)  # [B, N, K]
    counts = jnp.sum(onehot, axis=1)  # [B, K]
    protos = jnp.einsum("bnk,bnd->bkd", onehot, x) / jnp.maximum(counts[..., None], 1.0)
    protos = l2_normalize(protos)
    valid_k = counts > 0

    # intra: 1 - cos(x, proto_label), hinged
    sim_to_own = jnp.einsum("bnd,bkd->bnk", x, protos)
    own = jnp.sum(sim_to_own * onehot, axis=-1)
    intra = jnp.maximum(0.0, 1.0 - own - margin_intra)
    intra = jnp.mean(intra)

    # inter: hinge on pairwise prototype similarity
    psim = jnp.einsum("bkd,bjd->bkj", protos, protos)
    k = max_instances
    eye = jnp.eye(k, dtype=bool)[None]
    pair_valid = valid_k[:, :, None] & valid_k[:, None, :] & ~eye
    inter = jnp.maximum(0.0, psim - margin_inter) * pair_valid
    inter = jnp.sum(inter) / jnp.maximum(jnp.sum(pair_valid), 1.0)
    return intra + inter, {"loss_intra": intra, "loss_inter": inter}


# shared with the MSMFormer zoom-in stage; kept importable from here for
# backward compatibility (rice.py and tests import it from this module)
from quber_tpu.ops.zoom import instance_boxes_from_labels  # noqa: E402


class UCNBaseModel:
    """Eval-harness wrapper: predict(rgb_path, depth_path) -> (masks, fg, s).

    Mirrors the UCN wrapper flow (base_model.py:522-620): standardize RGB,
    depth -> XYZ point cloud, embed, mean-shift cluster; with zoom_in, a
    second stage re-embeds fixed-size crops around each instance,
    re-clusters the in-crop foreground, and keeps the largest refined
    component per instance (crop_rois / match_label_crop,
    base_model.py:843-961).
    """

    ZOOM = 224
    MAX_INST = 16

    def __init__(self, params=None, dataset="OSD", zoom_in=False, seed=0,
                 num_seeds=32, bandwidth=0.5):
        self.model = UCNEmbeddingNet()
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 480, 640, 3)),
                jnp.zeros((1, 480, 640, 3)),
            )
        self.params = params
        self.zoom_in = zoom_in
        self.dataset = dataset
        self.num_seeds = num_seeds
        self.bandwidth = bandwidth

        def pipeline(params, rgb, xyz):
            emb = self.model.apply(params, rgb[None], xyz[None])[0]
            out = cluster_embeddings(emb, num_seeds=num_seeds, bandwidth=bandwidth)
            if not zoom_in:
                return out

            from quber_tpu.ops.boxes import roi_align
            from quber_tpu.ops.zoom import zoom_refine_labels

            labels = out["labels"]
            z = self.ZOOM

            def refine_one(box, ok, inst_id):
                crop_rgb = roi_align(rgb, box[None], out_size=z)[0]
                crop_xyz = roi_align(xyz, box[None], out_size=z)[0]
                crop_lab = roi_align(
                    (labels == inst_id).astype(jnp.float32)[..., None],
                    box[None], out_size=z,
                )[0, ..., 0]
                emb2 = self.model.apply(params, crop_rgb[None], crop_xyz[None])[0]
                ref = cluster_embeddings(
                    emb2, fg_mask=(crop_lab > 0.5).astype(jnp.float32),
                    num_seeds=8, bandwidth=bandwidth, min_pixels=64,
                )
                # keep the largest refined component (match_label_crop)
                counts = jnp.bincount(ref["labels"].reshape(-1), length=9)
                counts = counts.at[0].set(0)
                main = jnp.argmax(counts)
                return ((ref["labels"] == main) & (main > 0) & ok).astype(jnp.float32)

            full = zoom_refine_labels(labels, refine_one, self.MAX_INST, z)
            return {"labels": full, "num_instances": out["num_instances"],
                    "seeds": out["seeds"]}

        self._pipeline = jax.jit(pipeline)

    def predict(self, rgb_path, depth_path):
        import time

        import cv2
        import imageio.v2 as imageio

        from quber_tpu.ops.preprocess import compute_xyz, standardize_image

        rgb = cv2.imread(rgb_path)
        rgb = cv2.resize(rgb, (640, 480))
        rgb_in = standardize_image(rgb[..., ::-1])
        if depth_path and depth_path.endswith(".npy"):
            depth_m = np.load(depth_path)
        elif depth_path:
            depth_m = np.asarray(imageio.imread(depth_path)).astype(np.float32) / 1000.0
        else:
            depth_m = np.zeros((480, 640), np.float32)
        depth_m = cv2.resize(depth_m, (640, 480), interpolation=cv2.INTER_NEAREST)
        xyz = compute_xyz(depth_m, {"fx": 550.0, "fy": 550.0,
                                    "x_offset": 320.0, "y_offset": 240.0,
                                    "img_width": 640, "img_height": 480})
        t0 = time.time()
        out = self._pipeline(self.params, jnp.asarray(rgb_in), jnp.asarray(xyz))
        labels = np.asarray(out["labels"])
        elapsed = time.time() - t0
        n = int(out["num_instances"])
        masks = labels[None] == np.arange(1, n + 1)[:, None, None]
        return masks, None, elapsed
