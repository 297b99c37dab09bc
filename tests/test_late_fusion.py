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
