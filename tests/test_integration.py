"""End-to-end integration: train -> checkpoint -> restore -> refine -> metrics."""

import numpy as np
import jax
import jax.numpy as jnp

from quber_tpu.config import TrainConfig
from quber_tpu.models.mask_refiner import MaskRefinerConfig
from quber_tpu.parallel.mesh import make_mesh, put_batch
from quber_tpu.predictor import MaskRefinerPredictor
from quber_tpu.train.checkpoint import restore_state, save_state
from quber_tpu.train.loop import create_train_state, make_train_step


def test_train_checkpoint_refine_cycle(tmp_path, rng, blobs):
    h = w = 32
    model_cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    train_cfg = TrainConfig(batch_size=2, max_iter=10, base_lr=1e-4, warmup_iters=2)
    mesh = make_mesh(jax.devices()[:1])
    state, tx = create_train_state(model_cfg, train_cfg)
    step = make_train_step(model_cfg, train_cfg, tx, mesh, donate=False)

    batch = put_batch({
        "image": rng.rand(2, h, w, 6).astype(np.float32) * 255,
        "offset_enc": rng.rand(2, h, w, 3).astype(np.float32),
        "sem_seg": (rng.rand(2, h, w) > 0.5).astype(np.float32),
        "sem_seg_weights": np.ones((2, h, w), np.float32),
        "center": rng.rand(2, h, w).astype(np.float32),
        "center_weights": np.ones((2, h, w), np.float32),
        "offset": rng.randn(2, h, w, 2).astype(np.float32),
        "offset_weights": np.ones((2, h, w), np.float32),
        "eee_mask": (rng.rand(2, h, w, 2) > 0.5).astype(np.float32),
        "eee_boundary": (rng.rand(2, h, w, 2) > 0.5).astype(np.float32),
    }, mesh)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["total_loss"]))

    # checkpoint round-trip
    save_state(str(tmp_path / "ckpt"), state)
    restored = restore_state(str(tmp_path / "ckpt"), state)
    assert int(restored.step) == 3

    # refine with the trained weights through the public predictor
    predictor = MaskRefinerPredictor(
        model_cfg,
        params={"params": restored.params, "batch_stats": restored.batch_stats},
        max_instances=8,
    )
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    depth = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    masks = blobs(rng, 2, h, w, min_r=4, max_r=7)
    pan, count, scores = predictor.predict_packed(rgb, depth, list(masks))
    assert pan.shape == (h, w)
    assert 0 <= count <= 8
    assert np.isfinite(scores).all()

    # reference-compatible predict() output contract
    out = predictor.predict(rgb, depth, list(masks))[0]
    assert "sem_seg" in out and "panoptic_seg" in out
    assert out["eee_mask"].shape == (2, h, w)
