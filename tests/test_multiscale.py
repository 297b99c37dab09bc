"""Multi-scale training / bucketed-shape tests (SURVEY §7 hard part 2).

The reference mapper applies detectron2 ResizeShortestEdge with a
MIN_SIZE_TRAIN grid (perturbed_panoptic_dataset_mapper.py:84-92); under XLA
every distinct padded shape is one compiled program, so the mapper buckets
resized shapes to /32 multiples and the batcher groups samples per bucket.
These tests pin the resize semantics, the bucket invariants, the
recompile count, and the MultiScalePredictor dispatch.
"""

import numpy as np
import pytest

from quber_tpu.config import TrainConfig
from quber_tpu.data.mappers import (
    PerturbedPanopticMapper,
    batch_iterator,
    bucket_shape,
    resize_shortest_edge,
)
from quber_tpu.models.mask_refiner import MaskRefinerConfig

pytestmark = pytest.mark.quick


def test_resize_shortest_edge_matches_detectron2():
    # detectron2 ResizeShortestEdge.get_output_shape semantics:
    # scale = short / min(h, w); if the long side would exceed max_size,
    # rescale so it equals max_size; round with int(x + 0.5).
    cases = [
        # (h0, w0, short, max_size)
        (480, 640, 480, 640),
        (480, 640, 416, 640),
        (720, 1280, 480, 640),
        (1024, 768, 333, 512),
        (100, 400, 200, 300),
    ]
    for h0, w0, short, mx in cases:
        scale = short / min(h0, w0)
        if max(h0, w0) * scale > mx:
            scale = mx / max(h0, w0)
        expect = (int(h0 * scale + 0.5), int(w0 * scale + 0.5))
        assert resize_shortest_edge(h0, w0, short, mx) == expect


def test_bucket_shape_rounds_up_to_divisor():
    assert bucket_shape(416, 555) == (416, 576)
    assert bucket_shape(480, 640) == (480, 640)
    assert bucket_shape(1, 1, divisor=32) == (32, 32)


@pytest.fixture
def panoptic_records(tmp_path, rng, blobs):
    """File-backed records at two native sizes, as the loader emits them."""
    import cv2

    from quber_tpu.data import rle

    records = []
    for i, (h, w) in enumerate([(96, 128), (120, 160)]):
        rgb_p = tmp_path / f"rgb{i}.png"
        pan_p = tmp_path / f"pan{i}.png"
        cv2.imwrite(str(rgb_p), (rng.rand(h, w, 3) * 255).astype(np.uint8))
        masks = blobs(rng, 3, h, w, min_r=10, max_r=20)
        pan_rgb = np.zeros((h, w, 3), np.uint8)
        for k, m in enumerate(masks):
            pan_rgb[m > 0, 0] = k + 1  # rgb2id: id = R + 256 G + 65536 B
        import imageio.v2 as imageio

        imageio.imwrite(str(pan_p), pan_rgb)
        records.append({
            "file_name": str(rgb_p),
            "pan_seg_file_name": str(pan_p),
            "segments_info": [{"id": k + 1} for k in range(len(masks))],
            "perturbed_segmentation": [rle.encode(m) for m in masks],
        })
    return records


def _ms_cfgs():
    model_cfg = MaskRefinerConfig(height=96, width=128)
    train_cfg = TrainConfig(
        perlin_distortion=False, color_aug_ssd=False,
        min_size_train=(64, 96), max_size_train=128, size_divisibility=32,
    )
    return model_cfg, train_cfg


def test_mapper_emits_bucketed_shapes_with_zero_weight_margins(panoptic_records):
    model_cfg, train_cfg = _ms_cfgs()
    mapper = PerturbedPanopticMapper(train_cfg, model_cfg, is_train=True, seed=3)
    assert mapper.multiscale
    allowed = set()
    for short in train_cfg.min_size_train:
        for h0, w0 in [(96, 128), (120, 160)]:
            rh, rw = resize_shortest_edge(h0, w0, short, train_cfg.max_size_train)
            allowed.add(bucket_shape(rh, rw))
    seen = set()
    for rec in panoptic_records * 4:
        s = mapper(rec)
        ph, pw = s["image"].shape[:2]
        seen.add((ph, pw))
        assert (ph, pw) in allowed
        assert ph % 32 == 0 and pw % 32 == 0
        # every per-sample array shares the padded spatial shape
        for k, v in s.items():
            assert v.shape[:2] == (ph, pw), k
    assert len(seen) > 1  # the grid actually produces several buckets


def test_padded_margin_zero_weights(panoptic_records):
    model_cfg, train_cfg = _ms_cfgs()
    mapper = PerturbedPanopticMapper(train_cfg, model_cfg, is_train=True, seed=0)
    # force a known padded bucket: short=64 on a 120x160 image -> 64x85 -> 64x96
    mapper.min_sizes = (64,)
    s = mapper(panoptic_records[1])
    ph, pw = s["image"].shape[:2]
    rh, rw = resize_shortest_edge(120, 160, 64, train_cfg.max_size_train)
    assert (ph, pw) == bucket_shape(rh, rw)
    assert (ph, pw) != (rh, rw)  # there IS a margin
    assert s["sem_seg_weights"][:, rw:].max() == 0
    assert s["center_weights"][:, rw:].max() == 0
    assert s["offset_weights"][:, rw:].max() == 0
    assert np.abs(s["image"][:, rw:]).max() == 0


def test_batch_iterator_groups_by_bucket_and_recompile_count(panoptic_records):
    import jax

    model_cfg, train_cfg = _ms_cfgs()
    mapper = PerturbedPanopticMapper(train_cfg, model_cfg, is_train=True, seed=1)
    it = batch_iterator(panoptic_records, mapper, batch_size=2, seed=5)

    traces = []

    @jax.jit
    def consume(x):
        traces.append(x.shape)
        return x.sum()

    shapes = set()
    for _ in range(12):
        batch = next(it)
        img = batch["image"]
        assert img.ndim == 4 and img.shape[0] == 2
        shapes.add(img.shape)
        consume(img)
    # one compiled program per bucket, NOT one per batch
    assert len(traces) == len(shapes)
    assert len(shapes) <= len(train_cfg.min_size_train) * 2  # grid x native sizes


def test_multiscale_predictor_buckets_and_output_shapes(rng, blobs):
    from quber_tpu.predictor import MultiScalePredictor

    base = MaskRefinerConfig(height=64, width=96, resnet_depth=14)
    pred = MultiScalePredictor(base, short=64, max_size=96, max_instances=8)
    start_buckets = pred.num_buckets
    for h0, w0 in [(64, 96), (80, 120)]:  # both resize into the same bucket
        rgb = (rng.rand(h0, w0, 3) * 255).astype(np.uint8)
        depth = np.zeros((h0, w0, 3), np.float32)
        masks = blobs(rng, 2, h0, w0, min_r=8, max_r=14)
        out = pred.predict(rgb, depth, masks)[0]
        pan, _ = out["panoptic_seg"]
        assert pan.shape == (h0, w0)
        assert out["sem_seg"].shape[:2] == (h0, w0)
        if "instances" in out:
            assert out["instances"]["pred_masks"].shape[1:] == (h0, w0)
    assert pred.num_buckets == start_buckets  # shared bucket, no new compile
