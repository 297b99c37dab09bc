"""Training-loop tests: freeze semantics, convergence, checkpoint roundtrip,
and the 8-device data-parallel step on the virtual CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quber_tpu.config import TrainConfig
from quber_tpu.models.mask_refiner import MaskRefinerConfig
from quber_tpu.parallel.mesh import make_mesh, put_batch
from quber_tpu.train.loop import create_train_state, make_train_step
from quber_tpu.train.optim import make_freeze_mask, warmup_poly_schedule


def tiny_cfgs(batch=2, warmup=5, lr=1e-3):
    model_cfg = MaskRefinerConfig(height=32, width=32)
    train_cfg = TrainConfig(batch_size=batch, max_iter=200, base_lr=lr,
                            warmup_iters=warmup)
    return model_cfg, train_cfg


def tiny_batch(rng, b, h, w):
    return {
        "image": rng.rand(b, h, w, 6).astype(np.float32) * 255,
        "offset_enc": rng.rand(b, h, w, 3).astype(np.float32),
        "sem_seg": (rng.rand(b, h, w) > 0.5).astype(np.float32),
        "sem_seg_weights": np.ones((b, h, w), np.float32),
        "center": rng.rand(b, h, w).astype(np.float32),
        "center_weights": np.ones((b, h, w), np.float32),
        "offset": rng.randn(b, h, w, 2).astype(np.float32),
        "offset_weights": np.ones((b, h, w), np.float32),
        "eee_mask": (rng.rand(b, h, w, 2) > 0.5).astype(np.float32),
        "eee_boundary": (rng.rand(b, h, w, 2) > 0.5).astype(np.float32),
    }


def test_warmup_poly_schedule():
    s = warmup_poly_schedule(1e-3, 1000, warmup_iters=100, warmup_factor=1e-3)
    assert float(s(0)) == pytest.approx(1e-6)
    assert float(s(100)) == pytest.approx(1e-3 * 0.9**0.9, rel=1e-2)
    assert float(s(999)) < float(s(500)) < float(s(100))


def test_frozen_params_stay_fixed(rng):
    model_cfg, train_cfg = tiny_cfgs()
    state, tx = create_train_state(model_cfg, train_cfg)
    mesh = make_mesh(jax.devices()[:1])
    step = make_train_step(model_cfg, train_cfg, tx, mesh, donate=False)
    batch = put_batch(tiny_batch(rng, 2, 32, 32), mesh)

    frozen_before = jax.tree_util.tree_leaves_with_path(state.params)
    frozen_before = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in frozen_before
        if "frozen" in jax.tree_util.keystr(p)
    }
    assert frozen_before, "expected FrozenBN params in the tree"

    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert all(np.isfinite(float(v)) for v in metrics.values())

    changed_trainable = 0
    for p, v in jax.tree_util.tree_leaves_with_path(new_state.params):
        key = jax.tree_util.keystr(p)
        if "frozen" in key:
            np.testing.assert_array_equal(np.asarray(v), frozen_before[key], key)
        elif not np.array_equal(np.asarray(v), 0):
            changed_trainable += 1
    assert changed_trainable > 0


def test_loss_decreases(rng):
    model_cfg, train_cfg = tiny_cfgs(warmup=2, lr=5e-4)
    state, tx = create_train_state(model_cfg, train_cfg)
    mesh = make_mesh(jax.devices()[:1])
    step = make_train_step(model_cfg, train_cfg, tx, mesh)
    batch = put_batch(tiny_batch(rng, 2, 32, 32), mesh)
    first = None
    rng_key = jax.random.PRNGKey(0)
    for i in range(25):
        rng_key, k = jax.random.split(rng_key)
        state, metrics = step(state, batch, k)
        total = float(metrics["total_loss"])
        assert np.isfinite(total), f"nan at step {i}"
        if first is None:
            first = total
    assert total < first, (first, total)


def test_multichip_dp_step(rng):
    # 8-way data parallelism on the virtual CPU mesh (conftest forces 8 devs).
    # resnet_depth=14 keeps per-device-thread compute small: XLA:CPU kills
    # the process when collective participants arrive >40s apart, which the
    # full-depth model can trigger on a single-core host (8 threads, 1 core).
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model_cfg, train_cfg = tiny_cfgs(batch=8)
    model_cfg = dataclasses.replace(model_cfg, resnet_depth=14)
    state, tx = create_train_state(model_cfg, train_cfg)
    mesh = make_mesh(jax.devices()[:8])
    step = make_train_step(model_cfg, train_cfg, tx, mesh, donate=False)
    batch = put_batch(tiny_batch(rng, 8, 32, 32), mesh)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert all(np.isfinite(float(v)) for v in metrics.values())

    # gradient all-reduce correctness: the same batch on a 1-device mesh must
    # produce identical updates (up to float noise)
    mesh1 = make_mesh(jax.devices()[:1])
    step1 = make_train_step(model_cfg, train_cfg, tx, mesh1, donate=False)
    state1, _ = create_train_state(model_cfg, train_cfg)
    new_state1, metrics1 = step1(state1, put_batch(batch, mesh1), jax.random.PRNGKey(0))
    for k in metrics:
        assert float(metrics[k]) == pytest.approx(float(metrics1[k]), rel=1e-3), k


def test_multichip_spatial_step(rng):
    # 4x2 data x space mesh: batch over "data", image HEIGHT over "space".
    # XLA's SPMD partitioner splits every conv spatially and inserts the halo
    # exchanges itself — the step function is identical to the DP one, only
    # the PartitionSpecs differ (parallel/mesh.py make_mesh_2d). Correctness
    # bar: same metrics as the unsharded 1-device step on the same batch.
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from quber_tpu.parallel.mesh import make_mesh_2d

    model_cfg, train_cfg = tiny_cfgs(batch=4)
    model_cfg = dataclasses.replace(model_cfg, resnet_depth=14)
    state, tx = create_train_state(model_cfg, train_cfg)
    mesh = make_mesh_2d(jax.devices()[:8], space=2)
    assert mesh.shape == {"data": 4, "space": 2}
    step = make_train_step(model_cfg, train_cfg, tx, mesh, donate=False)
    host_batch = tiny_batch(rng, 4, 32, 32)
    batch = put_batch(host_batch, mesh)
    # every rank>=2 leaf really is split over both axes
    assert batch["image"].sharding.spec == ("data", "space")
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))

    mesh1 = make_mesh(jax.devices()[:1])
    step1 = make_train_step(model_cfg, train_cfg, tx, mesh1, donate=False)
    state1, _ = create_train_state(model_cfg, train_cfg)
    _, metrics1 = step1(state1, put_batch(host_batch, mesh1), jax.random.PRNGKey(0))
    for k in metrics:
        assert float(metrics[k]) == pytest.approx(float(metrics1[k]), rel=1e-3), k


def test_checkpoint_roundtrip(tmp_path, rng):
    from quber_tpu.train.checkpoint import restore_state, save_state

    model_cfg, train_cfg = tiny_cfgs()
    state, tx = create_train_state(model_cfg, train_cfg)
    save_state(str(tmp_path / "ckpt"), state)
    restored = restore_state(str(tmp_path / "ckpt"), state)
    assert restored is not None
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(state.params),
        jax.tree_util.tree_leaves_with_path(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_freeze_backbone_stages(rng):
    # FREEZE_AT=2: stem + res2 of both trunks must receive zero updates
    model_cfg = MaskRefinerConfig(height=32, width=32)
    train_cfg = TrainConfig(batch_size=2, max_iter=100, base_lr=1e-2,
                            warmup_iters=1, freeze_backbone_stages=2)
    state, tx = create_train_state(model_cfg, train_cfg)
    mesh = make_mesh(jax.devices()[:1])
    step = make_train_step(model_cfg, train_cfg, tx, mesh, donate=False)
    batch = put_batch(tiny_batch(rng, 2, 32, 32), mesh)
    before = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(state.params)
    }
    new_state, _ = step(state, batch, jax.random.PRNGKey(0))
    changed_res3 = 0
    for p, v in jax.tree_util.tree_leaves_with_path(new_state.params):
        key = jax.tree_util.keystr(p)
        frozen = ("['stem']" in key or "['res2_" in key) and "backbone" in key
        if frozen:
            np.testing.assert_array_equal(np.asarray(v), before[key], key)
        elif "['res3_" in key and "frozen" not in key:
            if not np.array_equal(np.asarray(v), before[key]):
                changed_res3 += 1
    assert changed_res3 > 0


def test_device_targets_match_host_mapper(rng):
    # the on-device target builder must reproduce the host mapper's targets
    # (same ops, different backends: numpy/cv2 vs fused XLA)
    import sys

    sys.path.insert(0, ".")
    from train_net import SyntheticMapper, synthetic_records

    from quber_tpu.train.device_targets import (
        build_targets, pack_train_sample, unpack_train_sample,
    )

    h = w = 64
    model_cfg = MaskRefinerConfig(height=h, width=w)
    train_cfg = TrainConfig(batch_size=2)
    rec = synthetic_records(1, h, w, seed=5)[0]
    host = SyntheticMapper(train_cfg, model_cfg)(rec)

    from quber_tpu.data import rle
    from quber_tpu.data.mappers import normalize_depth_mm

    pert = np.asarray([rle.decode(r) for r in rec["perturbed_segmentation"]])
    depth_n = normalize_depth_mm(rec["depth_mm"], train_cfg.depth_range)
    buf = pack_train_sample(rec["rgb"], depth_n, rec["gt_masks"], pert, n_slots=8)
    image, gt, gv, pt, pv = unpack_train_sample(jnp.asarray(buf), h, w, 8)
    dev = build_targets(gt, gv, pt, pv, model_cfg, train_cfg)

    # image: u8-rounded on the packed path
    np.testing.assert_allclose(np.asarray(image), np.round(host["image"]), atol=0.5)
    for key, tol in [
        ("sem_seg", 0), ("sem_seg_weights", 0), ("center", 1e-5),
        ("offset", 1e-4), ("offset_enc", 1e-5),
        ("eee_mask", 0), ("eee_boundary", 0),
        ("center_weights", 0), ("offset_weights", 0),
    ]:
        got, want = np.asarray(dev[key]), np.asarray(host[key])
        assert got.shape == want.shape, (key, got.shape, want.shape)
        if tol:
            np.testing.assert_allclose(got, want, atol=tol, err_msg=key)
        else:
            np.testing.assert_array_equal(got, want, err_msg=key)


def test_device_target_step_runs(rng):
    from quber_tpu.train.device_targets import (
        make_device_target_step, pack_train_sample, sample_bytes,
    )
    import sys

    sys.path.insert(0, ".")
    from train_net import synthetic_records

    from quber_tpu.data import rle
    from quber_tpu.data.mappers import normalize_depth_mm

    h = w = 32
    model_cfg = MaskRefinerConfig(height=h, width=w)
    train_cfg = TrainConfig(batch_size=2, max_iter=100)
    state, tx = create_train_state(model_cfg, train_cfg)
    mesh = make_mesh(jax.devices()[:1])
    step = make_device_target_step(model_cfg, train_cfg, tx, mesh,
                                   n_slots=8, donate=False)
    recs = synthetic_records(2, h, w, seed=1)
    bufs = []
    for rec in recs:
        pert = np.asarray([rle.decode(r) for r in rec["perturbed_segmentation"]])
        depth_n = normalize_depth_mm(rec["depth_mm"], train_cfg.depth_range)
        bufs.append(pack_train_sample(rec["rgb"], depth_n, rec["gt_masks"],
                                      pert, n_slots=8))
    bufs = jnp.asarray(np.stack(bufs))
    assert bufs.shape[1] == sample_bytes(h, w, 8)
    new_state, metrics = step(state, bufs, jax.random.PRNGKey(0))
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    assert int(new_state.step) == 1


def test_checkpoint_same_step_overwrites(tmp_path):
    """Retrain-into-same-dir regression: orbax skips (or raises on) an
    existing step, so a retrained model would silently keep serving the old
    weights; save_params/save_state must overwrite."""
    import jax.numpy as jnp

    from quber_tpu.train.checkpoint import restore_params, save_params

    d = str(tmp_path / "ckpt")
    save_params(d, {"w": jnp.asarray([1.0, 2.0])}, step=100)
    save_params(d, {"w": jnp.asarray([9.0, 9.0])}, step=100)
    out = restore_params(d)
    np.testing.assert_allclose(np.asarray(out["w"]), [9.0, 9.0])


def test_restore_skips_unfinalized_step(tmp_path):
    """Kill-resilience regression (round-4 weak #3): a trainer killed
    mid-save leaves step artifacts whose _CHECKPOINT_METADATA (written LAST
    by orbax) is missing. mgr.latest_step() returns such a bare step dir and
    restore then crashes (FileNotFoundError: _METADATA) instead of serving
    the previous good checkpoint. All restore entry points must select the
    newest FINALIZED step."""
    import os

    import jax.numpy as jnp

    from quber_tpu.train.checkpoint import (
        load_eval_params,
        restore_params,
        save_params,
    )

    d = str(tmp_path / "ckpt")
    save_params(d, {"w": jnp.asarray([1.0, 2.0])}, step=100)
    save_params(d, {"w": jnp.asarray([3.0, 4.0])}, step=200)
    # kill-during-save artifacts: (a) an orbax atomic-rename tmp dir,
    # (b) a step dir that never got its step-level metadata finalized
    os.makedirs(os.path.join(d, "300.orbax-checkpoint-tmp-1755760000"))
    os.makedirs(os.path.join(d, "400", "default"))

    out = restore_params(d)
    np.testing.assert_allclose(np.asarray(out["w"]), [3.0, 4.0])
    out = load_eval_params(d)
    np.testing.assert_allclose(np.asarray(out["w"]), [3.0, 4.0])


def test_restore_empty_dir_raises(tmp_path):
    import pytest as _pytest

    from quber_tpu.train.checkpoint import restore_params

    with _pytest.raises(FileNotFoundError):
        restore_params(str(tmp_path / "nothing_here"))


@pytest.mark.quick
def test_put_batch_local_shard_matches_put_batch(rng):
    # single-process equivalence of the multi-host batch feed: with one
    # process, every shard is local, so put_batch_local_shard must assemble
    # exactly the array device_put produces (train_net.py --multihost path)
    from quber_tpu.parallel.mesh import put_batch_local_shard

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8])
    batch = {
        "image": rng.rand(8, 16, 16, 6).astype(np.float32),
        "flat": rng.rand(8).astype(np.float32),
    }
    a = put_batch(batch, mesh)
    b = put_batch_local_shard(batch, mesh)
    for k in batch:
        assert a[k].sharding == b[k].sharding, k
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
