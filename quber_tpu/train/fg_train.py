"""Foreground-segmenter training (CGNet / LMFFNet).

Rebuild of /root/reference/foreground_segmentation/train.py:25-86 with the
class-balanced weighted cross-entropy of loss.py:9-66 (per-image weights =
inverse class pixel fraction) and RAdam, as a jitted SPMD step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


def class_balanced_weights(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Per-pixel weights: w_c = total / (num_classes * count_c) per image
    (the inverse-pixel-count scheme of foreground_segmentation/loss.py:9-46).
    labels: [B, H, W] int. Returns [B, H, W] float32.
    """
    b, h, w = labels.shape
    onehot = jax.nn.one_hot(labels, num_classes)  # [B,H,W,C]
    counts = jnp.sum(onehot, axis=(1, 2))  # [B,C]
    total = float(h * w)
    w_c = total / (num_classes * jnp.maximum(counts, 1.0))
    w_c = jnp.where(counts > 0, w_c, 0.0)
    return jnp.take_along_axis(
        w_c[:, None, None, :], labels[..., None], axis=-1
    )[..., 0]


def weighted_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Class-balanced weighted CE (loss.py:49-66): mean over pixels of
    CE * class weight."""
    num_classes = logits.shape[-1]
    weights = class_balanced_weights(labels, num_classes)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(ce * weights)


@flax.struct.dataclass
class FgTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_fg_train_state(model, input_shape, lr: float = 1e-3, seed: int = 7):
    """model: CGNet or LMFFNet flax module (train=True variant built here)."""
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), jnp.zeros(input_shape))
    tx = optax.radam(lr)
    params = variables["params"]
    return (
        FgTrainState(
            jnp.zeros((), jnp.int32),
            params,
            variables.get("batch_stats", {}),
            tx.init(params),
        ),
        tx,
    )


def make_fg_train_step(model_train, tx):
    """model_train: the module with train=True (BatchNorm batch stats)."""

    @jax.jit
    def step(state: FgTrainState, images, labels):
        def loss_fn(params):
            out, upd = model_train.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                mutable=["batch_stats"],
            )
            return weighted_ce_loss(out, labels), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            FgTrainState(state.step + 1, new_params, new_stats, new_opt),
            {"loss": loss},
        )

    return step
