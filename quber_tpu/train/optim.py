"""Optimizers and LR schedules (optax).

Mirrors the reference solver: Adam + WarmupPolyLR
(/root/reference/train_net.py:83-139, Base-Mask-Refiner.yaml SOLVER block;
detectron2 WarmupPolyLR: lr = base * (1 - t/T)^0.9 with a linear warmup of
1000 iters from factor 1e-3). Layer freezing (train_net.py:141-168 copies
model-zoo weights and freezes backbone layers) maps to `optax.masked`
zero-updates over param-path predicates — FrozenBN stats are always frozen.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def warmup_poly_schedule(
    base_lr: float,
    max_iter: int,
    power: float = 0.9,
    warmup_iters: int = 1000,
    warmup_factor: float = 1e-3,
    constant_ending: float = 0.0,
) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        t = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            t < warmup_iters,
            warmup_factor + (1.0 - warmup_factor) * (t / max(warmup_iters, 1)),
            1.0,
        )
        poly = jnp.maximum(0.0, 1.0 - t / max_iter) ** power
        poly = jnp.maximum(poly, constant_ending)
        return base_lr * warm * poly

    return schedule


def is_frozen_path(path) -> bool:
    """FrozenBN params (frozen_weight/bias/mean/var) never receive updates."""
    return any("frozen" in str(getattr(k, "key", k)) for k in path)


def make_freeze_mask(params, extra_predicate: Callable | None = None):
    """True = trainable. extra_predicate(path)->bool marks additional frozen
    subtrees (e.g. backbone stages when freeze_backbone_stages > 0)."""

    def mask_fn(path, _):
        if is_frozen_path(path):
            return False
        if extra_predicate is not None and extra_predicate(path):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_optimizer(
    train_cfg,
    params,
    extra_freeze: Callable | None = None,
) -> optax.GradientTransformation:
    """Adam/SGD + WarmupPolyLR + freeze masking, from a TrainConfig."""
    schedule = warmup_poly_schedule(
        train_cfg.base_lr,
        train_cfg.max_iter,
        power=train_cfg.poly_power,
        warmup_iters=train_cfg.warmup_iters,
        warmup_factor=train_cfg.warmup_factor,
    )
    if train_cfg.optimizer.lower() == "adam":
        tx = optax.adam(schedule)
    elif train_cfg.optimizer.lower() == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(train_cfg.optimizer)
    if train_cfg.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(train_cfg.weight_decay), tx)
    # NOTE: optax.masked passes raw gradients through for mask=False leaves —
    # frozen params must get ZERO updates, so use multi_transform instead.
    mask = make_freeze_mask(params, extra_freeze)
    labels = jax.tree.map(lambda trainable: "train" if trainable else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )
