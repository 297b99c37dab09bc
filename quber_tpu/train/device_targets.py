"""Device-side training-target generation (SURVEY §7 step 4).

The host mapper spends ~44 ms/sample at 480x640 building Gaussian center
heatmaps, offset fields, the perturbed-input encoding, and the 8 TP/TN/FP/FN
error maps with numpy/cv2 — on a weak host this makes training input-bound
(device step: 0.28 s/batch-8). This module moves ALL target math into the
jitted train step: the host only packs
    [rgb+depth u8 image | bitpacked GT masks | bitpacked perturbed masks |
     validity bits]
(one uint8 buffer per sample, ~3 MB instead of ~18 MB of float targets) and
the device rebuilds every target with the existing fused ops
(ops.encoding.panoptic_train_targets, ops.encoding.encode_initial_masks,
ops.morphology.quadruple_error_maps).

Replaces the reference's multiprocess CPU dataloader hot loop
(perturbed_panoptic_dataset_mapper.py:131-241 + target_generator.py) with
TPU compute that runs concurrently with the host's image decode.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from quber_tpu.models.mask_refiner import (
    MaskRefiner, MaskRefinerConfig, assemble_eee_targets, compute_losses,
)
from quber_tpu.ops.encoding import encode_initial_masks, panoptic_train_targets
from quber_tpu.ops.morphology import quadruple_error_maps
from quber_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from quber_tpu.train.loop import TrainState


def sample_bytes(h: int, w: int, n_slots: int) -> int:
    return h * w * 4 + 2 * n_slots * (h * w // 8) + 2 * ((n_slots + 7) // 8)


def pack_train_sample(rgb, depth, gt_masks, pert_masks, n_slots: int) -> np.ndarray:
    """Host-side packing: rgb [H,W,3] u8-ish, depth [H,W] or [H,W,3]
    normalized 0-255, gt/pert mask stacks (any count; truncated to n_slots).
    """
    h, w = np.asarray(rgb).shape[:2]
    row = h * w // 8
    buf = np.zeros((sample_bytes(h, w, n_slots),), np.uint8)
    img = buf[: h * w * 4].reshape(h, w, 4)
    img[..., :3] = np.clip(np.round(np.asarray(rgb, np.float32)), 0, 255)
    d = np.asarray(depth)
    if d.ndim == 3:
        d = d[..., 0]
    img[..., 3] = np.clip(np.round(d.astype(np.float32)), 0, 255)
    off = h * w * 4
    for stack in (gt_masks, pert_masks):
        count = min(len(stack), n_slots)
        if count:
            used = np.asarray(stack[:count]) > 0
            buf[off : off + count * row] = np.packbits(
                used.reshape(count, -1), axis=1
            ).reshape(-1)
        off += n_slots * row
    vb = (n_slots + 7) // 8
    for stack in (gt_masks, pert_masks):
        valid = np.zeros((n_slots,), bool)
        valid[: min(len(stack), n_slots)] = True
        buf[off : off + vb] = np.packbits(valid)
        off += vb
    return buf


def _unpack_bits(packed, n_bits):
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :n_bits] > 0


def unpack_train_sample(buf, h: int, w: int, n_slots: int):
    """Device inverse of pack_train_sample -> (image [H,W,6] f32, gt, gv,
    pert, pv)."""
    row = h * w // 8
    img4 = buf[: h * w * 4].reshape(h, w, 4).astype(jnp.float32)
    image = jnp.concatenate(
        [img4[..., :3], jnp.repeat(img4[..., 3:4], 3, axis=-1)], axis=-1
    )
    off = h * w * 4
    gt = _unpack_bits(buf[off : off + n_slots * row].reshape(n_slots, row), h * w)
    off += n_slots * row
    pert = _unpack_bits(buf[off : off + n_slots * row].reshape(n_slots, row), h * w)
    off += n_slots * row
    vb = (n_slots + 7) // 8
    gv = _unpack_bits(buf[off : off + vb], n_slots)
    pv = _unpack_bits(buf[off + vb :], n_slots)
    return image, gt.reshape(n_slots, h, w), gv, pert.reshape(n_slots, h, w), pv


def build_targets(gt, gv, pert, pv, model_cfg: MaskRefinerConfig, train_cfg):
    """Per-sample device target dict matching the host mapper's fields
    (mappers.PerturbedPanopticMapper / train_net.SyntheticMapper)."""
    sigma = train_cfg.gaussian_sigma
    pd = panoptic_train_targets(
        gt, gv, sigma=sigma,
        small_instance_area=train_cfg.small_instance_area,
        small_instance_weight=train_cfg.small_instance_weight,
    )
    enc = encode_initial_masks(pert, pv, sigma=sigma, normalize=True)
    em = quadruple_error_maps(gt, pert, gv, pv)
    et = model_cfg.error_type
    loss_region = pd["sem_seg"]
    return {
        "offset_enc": jnp.transpose(enc, (1, 2, 0)),
        "sem_seg": pd["sem_seg"],
        "sem_seg_weights": pd["sem_seg_weights"],
        "center": pd["center"],
        "center_weights": loss_region,
        "offset": jnp.transpose(pd["offset"], (1, 2, 0)),
        "offset_weights": loss_region,
        "eee_mask": assemble_eee_targets(
            em["mask"][0], em["mask"][1], em["mask"][2], em["mask"][3], et
        ),
        "eee_boundary": assemble_eee_targets(
            em["boundary"][0], em["boundary"][1], em["boundary"][2],
            em["boundary"][3], et,
        ),
    }


def make_device_target_step(
    model_cfg: MaskRefinerConfig,
    train_cfg,
    tx: optax.GradientTransformation,
    mesh=None,
    n_slots: int = 32,
    donate: bool = True,
):
    """Jitted SPMD train step over PACKED samples: bufs u8 [B, sample_bytes].

    Same state/metrics contract as train.loop.make_train_step; the batch is
    one uint8 buffer per sample and every target is rebuilt on device.
    """
    mesh = mesh or make_mesh()
    model = MaskRefiner(model_cfg, train=True)
    h, w = model_cfg.height, model_cfg.width

    def step_fn(state: TrainState, bufs, rng):
        def per_sample(buf):
            image, gt, gv, pert, pv = unpack_train_sample(buf, h, w, n_slots)
            t = build_targets(gt, gv, pert, pv, model_cfg, train_cfg)
            t["image"] = image
            return t

        batch = jax.vmap(per_sample)(bufs)

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            outputs, updated = model.apply(
                variables, batch["image"], batch.get("offset_enc"),
                full_res=False, mutable=mutable, rngs={"dropout": rng},
            )
            losses = compute_losses(outputs, batch, model_cfg)
            total = sum(losses.values())
            return total, (losses, updated.get("batch_stats", state.batch_stats))

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, new_params, new_stats, new_opt)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    if len(mesh.devices.reshape(-1)) == 1 and jax.default_backend() != "cpu":
        # see train.loop.make_train_step: explicit 1-device NamedShardings
        # round-trip state on remote-TPU transports
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    state_sharding = replicate(mesh)
    batch_sharding = shard_batch(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sharding, batch_sharding, state_sharding),
        out_shardings=(state_sharding, state_sharding),
        donate_argnums=(0,) if donate else (),
    )


class PackedMapper:
    """Light host mapper for the device-target path: decode + augment the
    images, bitpack the mask stacks, and leave every target to the device.

    Handles both file-backed dataset records (the PerturbedPanopticMapper
    image pipeline: SSD color aug, Perlin depth distortion, mm-range depth
    normalization) and the in-memory synthetic records of train_net.py.
    """

    def __init__(self, train_cfg, model_cfg, n_slots: int = 32, is_train=True,
                 seed: int = 0):
        self.tc = train_cfg
        self.mc = model_cfg
        self.n_slots = n_slots
        self.is_train = is_train
        self.rng = np.random.RandomState(seed)

    def __call__(self, record: dict) -> dict:
        import cv2

        from quber_tpu.data import rle
        from quber_tpu.data.datasets import rgb2id
        from quber_tpu.data.mappers import normalize_depth_mm, ssd_color_aug
        from quber_tpu.data.perlin import perlin_distortion

        h, w = self.mc.height, self.mc.width
        if "rgb" in record:  # synthetic in-memory record
            rgb = np.asarray(record["rgb"])
            depth_n = normalize_depth_mm(record["depth_mm"], self.tc.depth_range)
            gt_masks = np.asarray(record["gt_masks"])
            pert = np.asarray(
                [rle.decode(r) for r in record["perturbed_segmentation"]]
            )
        else:
            import imageio.v2 as imageio

            rgb = cv2.resize(cv2.imread(record["file_name"]), (w, h))
            if self.is_train and self.tc.color_aug_ssd:
                rgb = ssd_color_aug(rgb, self.rng)
            if "depth_file_name" in record:
                depth = np.asarray(
                    imageio.imread(record["depth_file_name"])
                ).astype(np.float32)
                if self.is_train and self.tc.perlin_distortion:
                    depth = perlin_distortion(depth, self.rng)
                depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
                depth_n = normalize_depth_mm(depth, self.tc.depth_range)
            else:
                depth_n = np.zeros((h, w, 3), np.float32)
            pan_png = np.asarray(imageio.imread(record["pan_seg_file_name"]))
            panoptic = rgb2id(pan_png)
            panoptic = cv2.resize(
                panoptic.astype(np.float32), (w, h),
                interpolation=cv2.INTER_NEAREST,
            ).astype(np.int64)
            gt_masks = np.asarray([
                (panoptic == seg["id"]).astype(np.uint8)
                for seg in record["segments_info"]
            ])
            pert = np.asarray([
                cv2.resize(rle.decode(r), (w, h), interpolation=cv2.INTER_NEAREST)
                for r in record.get("perturbed_segmentation", [])
            ])
        return {
            "packed": pack_train_sample(rgb, depth_n, gt_masks, pert, self.n_slots)
        }
