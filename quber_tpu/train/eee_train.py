"""Training for the explicit-error-estimation side project (late fusion).

JAX rebuild of the reference's standalone EEE trainer
(/root/reference/explicit_error_estimation/train_net.py:17-171): Adam with
weight decay, selectable loss (focal / dice / dice-CE), mask + boundary
heads supervised with tp/fp/fn error-map targets. nn.DataParallel becomes
jit over a data-parallel mesh (batch sharded, grads all-reduced by XLA).
"""

from __future__ import annotations

from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import optax

from quber_tpu.models.late_fusion import (
    LateFusionEncoderDecoder,
    dice_ce_loss,
    focal_loss,
)


def make_loss(name: str) -> Callable:
    if name == "focal":
        return focal_loss
    if name == "dicece":
        return dice_ce_loss
    if name == "dice":
        from quber_tpu.models.mask_refiner import dice_loss

        return dice_loss
    raise ValueError(f"unknown EEE loss {name!r}; use focal | dice | dicece")


def create_eee_state(model: LateFusionEncoderDecoder, example: dict,
                     lr: float = 1e-4, weight_decay: float = 0.0, seed: int = 7):
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), example)
    tx = optax.adamw(lr, weight_decay=weight_decay) if weight_decay else optax.adam(lr)
    return params, tx, tx.init(params)


def make_eee_train_step(model: LateFusionEncoderDecoder, tx,
                        loss_name: str = "focal", mesh=None):
    """(params, opt_state, batch) -> (params, opt_state, metrics).

    batch: modality inputs (model.modalities keys) + 'mask_target' /
    'boundary_target' [B, H, W, num_classes] error maps.
    """
    loss_fn = make_loss(loss_name)

    def step(params, opt_state, batch):
        inputs = {k: batch[k] for k, _ in model.modalities}

        def total(p):
            out = model.apply(p, inputs)
            l_mask = loss_fn(out["mask"], batch["mask_target"])
            l_boundary = loss_fn(out["boundary"], batch["boundary_target"])
            return l_mask + l_boundary, {"loss_mask": l_mask,
                                         "loss_boundary": l_boundary}

        (loss, metrics), grads = jax.value_and_grad(total, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total_loss"] = loss
        return params, opt_state, metrics

    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, repl, data),
            out_shardings=(repl, repl, repl),
        )
    return jax.jit(step)


def train_eee(model: LateFusionEncoderDecoder, batches: Iterator[dict],
              steps: int, lr: float = 1e-4, weight_decay: float = 0.0,
              loss_name: str = "focal", mesh=None, log_every: int = 50):
    """Reference-recipe driver: returns (params, last_metrics)."""
    first = next(batches)
    example = {k: first[k][:1] for k, _ in model.modalities}
    params, tx, opt_state = create_eee_state(model, example, lr, weight_decay)
    step = make_eee_train_step(model, tx, loss_name, mesh)
    metrics = {}
    for it in range(steps):
        batch = first if it == 0 else next(batches)
        params, opt_state, metrics = step(params, opt_state, batch)
        if log_every and ((it + 1) % log_every == 0 or it + 1 == steps):
            print(f"eee iter {it + 1}/{steps} "
                  + " ".join(f"{k}={float(v):.4f}"
                             for k, v in sorted(metrics.items())), flush=True)
    return params, metrics
