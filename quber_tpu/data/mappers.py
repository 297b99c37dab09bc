"""Training input pipeline: perturbed-panoptic sample mapping + batching.

Re-creates PerturbedPanopticDatasetMapper
(/root/reference/maskrefiner/data/dataset_mappers/
perturbed_panoptic_dataset_mapper.py:26-241) as a host-side mapper producing
fixed-shape NHWC batches for the SPMD train step:

  per sample: read RGB + 16-bit depth -> Perlin depth distortion (train) ->
  clip to DEPTH_RANGE mm and scale to 0..255 x3ch -> SSD color aug -> decode
  the panoptic PNG + perturbed-mask / error-map RLEs -> Panoptic-DeepLab
  targets + initial-prediction offset encoding (our ops.encoding math, on
  host via numpy for the loader processes; identical semantics).

Batches are plain dicts of numpy arrays matching
quber_tpu.train.loop.make_train_step's expected fields.
"""

from __future__ import annotations

import numpy as np

from quber_tpu.data import rle
from quber_tpu.data.datasets import EEE_KEYS, get_dataset, rgb2id
from quber_tpu.data.perlin import perlin_distortion


def ssd_color_aug(rgb: np.ndarray, rng) -> np.ndarray:
    """SSD-style photometric distortion: brightness/contrast/saturation/hue
    (detectron2 ColorAugSSDTransform semantics, used by the mapper at
    perturbed_panoptic_dataset_mapper.py:84-92)."""
    import cv2

    img = rgb.astype(np.float32)
    if rng.rand() < 0.5:  # brightness
        img += rng.uniform(-32, 32)
    if rng.rand() < 0.5:  # contrast
        img *= rng.uniform(0.5, 1.5)
    img = np.clip(img, 0, 255).astype(np.uint8)
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    if rng.rand() < 0.5:  # saturation
        hsv[..., 1] *= rng.uniform(0.5, 1.5)
    if rng.rand() < 0.5:  # hue
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-18, 18)) % 180
    hsv = np.clip(hsv, 0, 255).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def normalize_depth_mm(depth_mm: np.ndarray, depth_range=(2500, 15000)) -> np.ndarray:
    """mm -> 0..255 x 3ch under the TRAINING depth range
    (perturbed_panoptic_dataset_mapper.py:147-156)."""
    lo, hi = depth_range
    d = np.clip(depth_mm.astype(np.float32), lo, hi)
    d = (d - lo) / (hi - lo) * 255.0
    return np.repeat(d[..., None], 3, axis=-1)


def numpy_center_offset(masks, h, w, sigma=10, normalize=False):
    """Host-side center/offset paint loop (ops.encoding semantics)."""
    size = 6 * sigma + 3
    x = np.arange(0, size, 1, float)
    y = x[:, None]
    g = np.exp(-((x - (3 * sigma + 1)) ** 2 + (y - (3 * sigma + 1)) ** 2) / (2 * sigma**2))
    center = np.zeros((h, w), np.float32)
    offset = np.zeros((2, h, w), np.float32)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    centers = []
    for mask in masks:
        idx = np.where(mask != 0)
        if len(idx[0]) == 0:
            centers.append(None)
            continue
        cy, cx = float(np.mean(idx[0])), float(np.mean(idx[1]))
        centers.append((cy, cx))
        ry, rx = int(round(cy)), int(round(cx))
        ul = rx - 3 * sigma - 1, ry - 3 * sigma - 1
        br = rx + 3 * sigma + 2, ry + 3 * sigma + 2
        gx0, gx1 = max(0, -ul[0]), min(br[0], w) - ul[0]
        gy0, gy1 = max(0, -ul[1]), min(br[1], h) - ul[1]
        cx0, cx1 = max(0, ul[0]), min(br[0], w)
        cy0, cy1 = max(0, ul[1]), min(br[1], h)
        center[cy0:cy1, cx0:cx1] = np.maximum(center[cy0:cy1, cx0:cx1], g[gy0:gy1, gx0:gx1])
        sy, sx = (h, w) if normalize else (1.0, 1.0)
        offset[0][idx] = (cy - yy[idx]) / sy
        offset[1][idx] = (cx - xx[idx]) / sx
    return center, offset, centers


def resize_shortest_edge(h0: int, w0: int, short: int, max_size: int):
    """detectron2 ResizeShortestEdge output size (the reference mapper's
    train-time augmentation, perturbed_panoptic_dataset_mapper.py:84-92):
    scale so the shorter side hits `short`, capped so the longer side stays
    <= max_size."""
    scale = short / min(h0, w0)
    if max(h0, w0) * scale > max_size:
        scale = max_size / max(h0, w0)
    return int(h0 * scale + 0.5), int(w0 * scale + 0.5)


def bucket_shape(h: int, w: int, divisor: int = 32):
    """Pad a resized shape up to the next divisor multiple: with a finite
    MIN_SIZE_TRAIN grid this yields a FIXED set of padded shapes, so XLA
    compiles one program per bucket instead of one per image (SURVEY §7
    hard part 2)."""
    pad = lambda v: ((v + divisor - 1) // divisor) * divisor
    return pad(h), pad(w)


class PerturbedPanopticMapper:
    """dataset record -> training sample dict.

    Fixed-shape by default (model height x width); with `multiscale=True`
    (or when train_cfg.min_size_train has several entries) applies
    ResizeShortestEdge with a per-sample sampled shorter side, then pads to
    a size-divisible bucket; the padded margin gets zero loss weights, and
    samples carry their bucket shape for shape-grouped batching.
    """

    def __init__(self, train_cfg, model_cfg, is_train: bool = True, seed: int = 0,
                 multiscale: bool | None = None):
        self.tc = train_cfg
        self.mc = model_cfg
        self.is_train = is_train
        self.rng = np.random.RandomState(seed)
        sizes = tuple(getattr(train_cfg, "min_size_train", ()) or ())
        if multiscale is None:
            multiscale = is_train and len(sizes) > 1
        self.multiscale = multiscale
        self.min_sizes = sizes or (model_cfg.height,)
        self.max_size = getattr(train_cfg, "max_size_train", model_cfg.width)
        self.divisor = getattr(train_cfg, "size_divisibility", 32)
        self._donor = None  # previous sample, reservoir for copy-paste aug

    def _target_shape(self, h0: int, w0: int):
        """(resized_h, resized_w, padded_h, padded_w) for this sample."""
        if not self.multiscale:
            h, w = self.mc.height, self.mc.width
            return h, w, h, w
        short = int(self.min_sizes[self.rng.randint(len(self.min_sizes))])
        rh, rw = resize_shortest_edge(h0, w0, short, self.max_size)
        ph, pw = bucket_shape(rh, rw, self.divisor)
        return rh, rw, ph, pw

    def __call__(self, record: dict) -> dict:
        import cv2
        import imageio.v2 as imageio

        rgb = cv2.imread(record["file_name"])
        h0, w0 = rgb.shape[:2]
        h, w, ph, pw = self._target_shape(h0, w0)
        rgb = cv2.resize(rgb, (w, h))
        if self.is_train and self.tc.color_aug_ssd:
            rgb = ssd_color_aug(rgb, self.rng)

        if "depth_file_name" in record:
            depth = np.asarray(imageio.imread(record["depth_file_name"])).astype(np.float32)
            if self.is_train and self.tc.perlin_distortion:
                depth = perlin_distortion(depth, self.rng)
            depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
            depth = normalize_depth_mm(depth, self.tc.depth_range)
        else:
            depth = np.zeros((h, w, 3), np.float32)

        pan_png = np.asarray(imageio.imread(record["pan_seg_file_name"]))
        panoptic = rgb2id(pan_png)
        panoptic = cv2.resize(
            panoptic.astype(np.float32), (w, h), interpolation=cv2.INTER_NEAREST
        ).astype(np.int64)

        gt_masks = [
            (panoptic == seg["id"]).astype(np.uint8) for seg in record["segments_info"]
        ]

        # perturbed initial masks, decoded early: copy-paste edits BOTH the
        # gt and the perturbed stacks so encoding/error targets stay coherent
        pert = [
            cv2.resize(rle.decode(r), (w, h), interpolation=cv2.INTER_NEAREST)
            for r in record.get("perturbed_segmentation", [])
        ]
        use_stored_eee = all(k in record for k in EEE_KEYS)
        cp_prob = getattr(self.tc, "copy_paste_prob", 0.0)
        if self.is_train and cp_prob > 0:
            donor = self._donor
            if (donor is not None and donor[0].shape[:2] == (h, w)
                    and self.rng.rand() < cp_prob):
                from quber_tpu.data.augmentation import copy_paste

                rgb, depth, gt_masks, pert = copy_paste(
                    rgb, depth, gt_masks, donor[0], donor[1], donor[2],
                    self.rng, paired_masks=pert, donor_paired=donor[3])
                use_stored_eee = False  # masks changed; re-derive error maps
            self._donor = (
                rgb.copy(), depth.copy(),
                np.asarray(list(gt_masks), np.uint8),
                np.asarray(list(pert), np.uint8),
            )

        sem_seg = (np.sum(gt_masks, axis=0) > 0).astype(np.float32) if len(gt_masks) else np.zeros((h, w), np.float32)
        center, offset, _ = numpy_center_offset(gt_masks, h, w, self.tc.gaussian_sigma)

        sem_weights = np.ones((h, w), np.float32)
        for m in gt_masks:
            if m.sum() < self.tc.small_instance_area:
                sem_weights[m > 0] = self.tc.small_instance_weight
        loss_region = sem_seg

        # perturbed initial masks -> offset encoding input
        p_center, p_offset, _ = numpy_center_offset(pert, h, w, self.tc.gaussian_sigma, normalize=True)
        offset_enc = np.stack([p_center, p_offset[0], p_offset[1]], axis=-1)

        sample = {
            "image": np.concatenate([rgb.astype(np.float32), depth], axis=-1),
            "offset_enc": offset_enc.astype(np.float32),
            "sem_seg": sem_seg,
            "sem_seg_weights": sem_weights,
            "center": center,
            "center_weights": loss_region,
            "offset": np.stack([offset[0], offset[1]], axis=-1),
            "offset_weights": loss_region,
        }

        # error-map targets: decode stored RLEs, or derive on the fly
        if use_stored_eee:
            maps = {k: rle.decode(record[k]).astype(np.float32) for k in EEE_KEYS}
            maps = {
                k: cv2.resize(v, (w, h), interpolation=cv2.INTER_NEAREST)
                for k, v in maps.items()
            }
        else:
            from quber_tpu.data.eee import compute_eee_maps

            maps = compute_eee_maps(np.asarray(gt_masks, np.uint8) if len(gt_masks) else np.zeros((0, h, w), np.uint8),
                                    np.asarray(pert, np.uint8) if len(pert) else np.zeros((0, h, w), np.uint8))
        from quber_tpu.models.mask_refiner import assemble_eee_targets

        et = self.mc.error_type
        sample["eee_mask"] = np.asarray(assemble_eee_targets(
            maps["tp_mask"], maps["tn_mask"], maps["fp_mask"], maps["fn_mask"], et))
        sample["eee_boundary"] = np.asarray(assemble_eee_targets(
            maps["tp_boundary"], maps["tn_boundary"], maps["fp_boundary"], maps["fn_boundary"], et))
        if (ph, pw) != (h, w):
            sample = {k: _pad_to(v, ph, pw) for k, v in sample.items()}
        return sample


def _pad_to(arr: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Zero-pad the leading two (spatial) axes up to (ph, pw). Loss-weight
    arrays are zero in the margin, so padded pixels carry no gradient."""
    pads = [(0, ph - arr.shape[0]), (0, pw - arr.shape[1])]
    pads += [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pads)


def batch_iterator(dataset_name_or_records, mapper, batch_size: int, shuffle=True, seed=0):
    """Endless iterator of stacked batches."""
    records = (
        get_dataset(dataset_name_or_records)
        if isinstance(dataset_name_or_records, str)
        else dataset_name_or_records
    )
    rng = np.random.RandomState(seed)
    order = np.arange(len(records))
    # multi-scale mappers emit several padded bucket shapes; group pending
    # samples by shape so each batch is stackable (and hits one compiled
    # program per bucket)
    pending: dict = {}
    while True:
        if shuffle:
            rng.shuffle(order)
        for i in order:
            s = mapper(records[i])
            # key on every array's shape (packed mappers have no "image")
            key = tuple((k, np.shape(v)) for k, v in sorted(s.items()))
            batch = pending.setdefault(key, [])
            batch.append(s)
            if len(batch) == batch_size:
                yield {k: np.stack([x[k] for x in batch]) for k in batch[0]}
                pending[key] = []
