"""Data-layer tests: RLE codec, perturbation, Perlin distortion."""

import numpy as np
import pytest

from quber_tpu.data import perlin, perturb, rle


def test_rle_roundtrip(rng, blobs):
    for mask in blobs(rng, 4, 97, 131):  # odd sizes on purpose
        enc = rle.encode(mask)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(dec, mask)


def test_rle_roundtrip_edge_cases():
    for mask in [np.zeros((16, 16), np.uint8),
                 np.ones((16, 16), np.uint8),
                 np.eye(32, dtype=np.uint8)]:
        np.testing.assert_array_equal(rle.decode(rle.encode(mask)), mask)


def test_rle_native_matches_fallback(rng, blobs):
    lib = rle._load_lib()
    if not lib:
        pytest.skip("native RLE lib not built")
    for mask in blobs(rng, 3, 64, 80, min_r=6, max_r=16):
        native = rle.encode(mask)
        fallback = {
            "size": [64, 80],
            "counts": rle._string_from_counts(rle._counts_from_mask(mask)),
        }
        assert native["counts"] == fallback["counts"]
        np.testing.assert_array_equal(
            rle._mask_from_counts(rle._counts_from_string(native["counts"]), 64, 80),
            mask,
        )


def test_rle_counts_structure():
    # a known tiny mask: 3x3, single pixel at (1,1) -> column-major runs
    mask = np.zeros((3, 3), np.uint8)
    mask[1, 1] = 1
    counts = rle._counts_from_mask(mask)
    np.testing.assert_array_equal(counts, [4, 1, 4])


def test_perturb_masks_iou_target(rng, blobs):
    masks = blobs(rng, 4, 240, 320, min_r=20, max_r=45)
    out = perturb.perturb_masks(
        masks, rng, target_iou=(0.6, 0.9),
        ratios={"fp": 0, "over": 0, "under": 0, "delete": 0, "boundary": 1.0},
    )
    assert len(out) == len(masks)
    ious = [perturb.mask_iou(o, m) for o, m in zip(out, masks)]
    # jitter must corrupt but not destroy
    assert all(i < 1.0 for i in ious)
    assert all(i > 0.2 for i in ious)


def test_perturb_masks_operations(rng, blobs):
    masks = blobs(rng, 3, 240, 320)
    # force each structural op
    out = perturb.perturb_masks(masks, np.random.RandomState(1),
                                ratios={"fp": 1.0, "over": 0, "under": 0, "delete": 0, "boundary": 0})
    assert len(out) == 4  # fp added
    out = perturb.perturb_masks(masks, np.random.RandomState(2),
                                ratios={"fp": 0, "over": 1.0, "under": 0, "delete": 0, "boundary": 0})
    assert len(out) >= 3  # split may add one
    out = perturb.perturb_masks(masks, np.random.RandomState(3),
                                ratios={"fp": 0, "over": 0, "under": 1.0, "delete": 0, "boundary": 0})
    assert len(out) == 2  # merged two
    out = perturb.perturb_masks(masks, np.random.RandomState(4),
                                ratios={"fp": 0, "over": 0, "under": 0, "delete": 1.0, "boundary": 0})
    assert len(out) == 2  # deleted one


def test_perlin_distortion(rng):
    depth = rng.uniform(500, 1500, (120, 160)).astype(np.float32)
    depth[10:20, 10:20] = 0
    out = perlin.perlin_distortion(depth, rng)
    assert out.shape == depth.shape
    # invalid pixels stay invalid
    assert np.all(out[10:20, 10:20] == 0)
    # distortion changed something but stayed in a sane range (valid pixels
    # near holes may warp-sample the hole and go to ~0; the mapper clips to
    # the configured depth range afterwards, as the reference does)
    valid = depth > 0
    assert not np.allclose(out[valid], depth[valid])
    assert np.percentile(out[valid], 5) > 300 and out[valid].max() < 1700


def test_grain_pipeline(rng, blobs):
    from quber_tpu.data.pipeline import make_dataloader

    records = [{"idx": i} for i in range(5)]

    class ToySampleMapper:
        def __call__(self, record):
            r = np.random.RandomState(record["idx"])
            return {"x": r.rand(4, 4).astype(np.float32),
                    "idx": np.int32(record["idx"])}

    it = make_dataloader(records, ToySampleMapper(), batch_size=2, seed=1)
    batch = next(it)
    assert batch["x"].shape == (2, 4, 4)
    assert batch["idx"].shape == (2,)
    # endless: pull through more than one epoch
    seen = set()
    for _ in range(6):
        b = next(it)
        seen.update(int(i) for i in b["idx"])
    assert seen == {0, 1, 2, 3, 4}


def test_config_from_name_grid():
    from quber_tpu.config import config_from_name, load_config

    # flagship name == flagship YAML
    m1, t1 = config_from_name("mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8")
    m2, t2 = load_config("configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml")
    assert m1.fusion_strategy == m2.fusion_strategy == "concat"
    assert m1.num_backbone_fusion_layers == m2.num_backbone_fusion_layers == 2
    assert m1.hierarchical_fusion_on and m2.hierarchical_fusion_on
    assert m1.hierarchy == m2.hierarchy
    assert m1.num_head_fusion_layers == m2.num_head_fusion_layers == 3
    assert m1.error_type == m2.error_type == "e2"
    assert t1.batch_size == t2.batch_size == 8

    # grouped hierarchy level: fco together, then m, then b
    m, _ = config_from_name("mask-refiner-rgbd-concat-l2-gn-hf-fco-m-b-l3-e2-b8")
    assert m.hierarchy == (("foreground", "center", "offset"),
                           ("eee_mask",), ("eee_boundary",))

    # no-EEE variant: heads limited to the named letters
    m, _ = config_from_name("mask-refiner-rgbd-concat-l2-gn-hf-f-c-o-l3-e2-b8")
    assert not m.eee_mask_on and not m.eee_boundary_on

    # unnamed axes fall back to Base defaults (add/l3/no-hf/b4)
    m, t = config_from_name("mask_refiner_rgbd_concat_l2_b2")
    assert not m.hierarchical_fusion_on and t.batch_size == 2
    m, t = config_from_name("mask_refiner_rgbd_add_l3")
    assert m.fusion_strategy == "add" and m.num_backbone_fusion_layers == 3
    assert t.batch_size == 4

    # modality ablations
    m, _ = config_from_name("mask_refiner_rgb_only")
    assert m.rgb_on and not m.depth_on
    m, _ = config_from_name("mask_refiner_depth_only")
    assert m.depth_on and not m.rgb_on

    # load_config falls through to the name decoder for nonexistent paths
    m, _ = load_config("mask-refiner-rgbd-add-l3-b2.yaml")
    assert m.fusion_strategy == "add" and m.num_backbone_fusion_layers == 3


def test_instance_registrations_and_loader(tmp_path):
    """COCO-instance-format variants (register_uoais_sim_instance.py) are
    registered and the loader joins annotations + perturbed RLEs."""
    import json

    from quber_tpu.data.datasets import (
        DATASET_REGISTRY,
        load_perturbed_instance_json,
        register_standard_datasets,
    )

    register_standard_datasets("datasets")
    for name in ("uoais_sim_train", "uoais_sim_val", "armbench_train",
                 "armbench_test", "uoais_sim_train_panoptic_augmented",
                 "uoais_sim_val_panoptic_augmented",
                 "uoais_sim_train_panoptic_is", "tod_v2_val_panoptic"):
        assert name in DATASET_REGISTRY, name

    coco = {
        "categories": [{"id": 2, "name": "object"}],
        "images": [{
            "id": 1, "file_name": "a.png", "height": 8, "width": 8,
            "perturbed_segmentation": [{"size": [8, 8], "counts": "08"}],
            "tp_mask": {"size": [8, 8], "counts": "44"},
        }],
        "annotations": [
            {"image_id": 1, "id": 10, "category_id": 2,
             "bbox": [1, 1, 3, 3], "segmentation": [[1, 1, 4, 1, 4, 4]],
             "iscrowd": 0},
        ],
    }
    jf = tmp_path / "inst.json"
    jf.write_text(json.dumps(coco))
    recs = load_perturbed_instance_json(str(jf), str(tmp_path))
    assert len(recs) == 1
    r = recs[0]
    assert r["annotations"][0]["category_id"] == 0  # remapped contiguous
    assert r["annotations"][0]["bbox"] == [1, 1, 3, 3]
    assert r["perturbed_segmentation"] and r["tp_mask"]["counts"] == "44"


def test_quantized_checkpoint_roundtrip(tmp_path):
    # int8 release artifact (tools/quantize_checkpoint.py): large floating
    # leaves survive per-channel quantization within 1/127 of their channel
    # max; small leaves and non-float leaves pass through bit-exact
    import numpy as np

    from quber_tpu.train.checkpoint import (
        load_quantized_params,
        save_quantized_params,
    )

    rng = np.random.RandomState(0)
    variables = {
        "params": {
            "conv": {"kernel": rng.randn(3, 3, 64, 32).astype(np.float32),
                     "bias": rng.randn(32).astype(np.float32)},
            "norm": {"scale": rng.rand(8).astype(np.float32)},
        },
        "batch_stats": {"mean": rng.randn(70, 70).astype(np.float32)},
        "meta": {"step": np.int32(7)},
    }
    path = str(tmp_path / "q.npz")
    save_quantized_params(path, variables)
    re = load_quantized_params(path)

    k, k2 = variables["params"]["conv"]["kernel"], re["params"]["conv"]["kernel"]
    cmax = np.abs(k).max(axis=(0, 1, 2))
    assert np.all(np.abs(k - k2) <= cmax / 127 * 0.5 + 1e-7)
    # small/non-float leaves are exact
    np.testing.assert_array_equal(variables["params"]["conv"]["bias"],
                                  re["params"]["conv"]["bias"])
    np.testing.assert_array_equal(variables["params"]["norm"]["scale"],
                                  re["params"]["norm"]["scale"])
    assert re["meta"]["step"] == 7
    # the big 2-D leaf was actually quantized (4x smaller than f32)
    m, m2 = variables["batch_stats"]["mean"], re["batch_stats"]["mean"]
    assert not np.array_equal(m, m2)
    col_max = np.abs(m).max(axis=0)
    assert np.all(np.abs(m - m2) <= col_max / 127 * 0.5 + 1e-7)
