import numpy as np
import jax
import jax.numpy as jnp

from quber_tpu.models.late_fusion import (
    LateFusionEncoderDecoder,
    dice_ce_loss,
    focal_loss,
)


def test_late_fusion_forward(rng):
    model = LateFusionEncoderDecoder(levels=3)
    inputs = {
        "rgb": jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)),
        "depth": jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)),
        "fg_mask": jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32)),
        "boundary": jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32)),
        "offset": jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)),
    }
    v = model.init(jax.random.PRNGKey(0), inputs)
    out = model.apply(v, inputs)
    assert out["mask"].shape == (1, 64, 64, 3)
    assert out["boundary"].shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out["mask"])).all()


def test_losses(rng):
    logits = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    targets = jax.nn.one_hot(jnp.asarray(rng.randint(0, 3, (1, 16, 16))), 3)
    for loss in [focal_loss(logits, targets), dice_ce_loss(logits, targets)]:
        assert np.isfinite(float(loss))
    # perfect prediction drives both near their floor
    perfect = targets * 30.0 - 15.0
    assert float(focal_loss(perfect, targets)) < 1e-4
    assert float(dice_ce_loss(perfect, targets)) < 0.02


def test_eee_train_step_learns(rng):
    import jax
    from quber_tpu.models.late_fusion import LateFusionEncoderDecoder
    from quber_tpu.train.eee_train import make_eee_train_step, create_eee_state

    model = LateFusionEncoderDecoder(
        modalities=(("rgb", 3), ("fg_mask", 1)), num_classes=3, levels=2)
    h = w = 32
    batch = {
        "rgb": rng.rand(2, h, w, 3).astype(np.float32),
        "fg_mask": (rng.rand(2, h, w, 1) > 0.5).astype(np.float32),
        "mask_target": (rng.rand(2, h, w, 3) > 0.7).astype(np.float32),
        "boundary_target": (rng.rand(2, h, w, 3) > 0.9).astype(np.float32),
    }
    example = {k: batch[k][:1] for k in ("rgb", "fg_mask")}
    params, tx, opt_state = create_eee_state(model, example, lr=1e-3)
    step = make_eee_train_step(model, tx, "focal")
    losses = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizes the fixed batch


def test_eee_train_driver_and_losses(rng):
    from quber_tpu.models.late_fusion import LateFusionEncoderDecoder
    from quber_tpu.train.eee_train import train_eee, make_loss

    for name in ("focal", "dice", "dicece"):
        assert callable(make_loss(name))

    model = LateFusionEncoderDecoder(
        modalities=(("rgb", 3), ("fg_mask", 1)), num_classes=3, levels=2)
    h = w = 16

    def batches():
        r = np.random.RandomState(0)
        while True:
            yield {
                "rgb": r.rand(2, h, w, 3).astype(np.float32),
                "fg_mask": (r.rand(2, h, w, 1) > 0.5).astype(np.float32),
                "mask_target": (r.rand(2, h, w, 3) > 0.7).astype(np.float32),
                "boundary_target": (r.rand(2, h, w, 3) > 0.9).astype(np.float32),
            }

    params, metrics = train_eee(model, batches(), steps=3, loss_name="dicece",
                                log_every=0)
    assert np.isfinite(float(metrics["total_loss"]))
