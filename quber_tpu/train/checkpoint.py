"""Checkpointing (orbax): save/restore TrainState or bare params.

Replaces detectron2's DetectionCheckpointer + periodic .pth saves
(/root/reference/train_net.py:191-198, Base yaml CHECKPOINT_PERIOD): a
step-indexed orbax CheckpointManager with keep-policy and resume-latest,
storing the flat param/opt pytrees.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_state(directory: str, state, step: int | None = None, max_to_keep: int = 5):
    mgr = _manager(directory, max_to_keep)
    step = int(state.step) if step is None else step
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_state(directory: str, template, step: int | None = None):
    """Restore a TrainState; `template` provides the pytree structure/shapes
    (the --resume flow: create_train_state then restore-latest)."""
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        mgr.close()
        return None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored


def save_params(directory: str, params: Any, step: int = 0):
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave({"params": params}))
    mgr.wait_until_finished()
    mgr.close()


def restore_params(directory: str, template: Any | None = None):
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    args = (
        ocp.args.StandardRestore({"params": template})
        if template is not None
        else ocp.args.StandardRestore()
    )
    restored = mgr.restore(step, args=args)
    mgr.close()
    return restored["params"]


def load_eval_params(directory: str):
    """Load predictor-ready variables from EITHER checkpoint flavor.

    Training checkpoints (save_state: TrainState with step/params/
    batch_stats/opt_state) and imported/param-only checkpoints
    (save_params: {"params": variables}) both restore to the
    {"params": ..., ["batch_stats": ...]} dict the predictor applies —
    the reference's DetectionCheckpointer accepts both .pth flavors the
    same way (train_net.py:191-198).
    """
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    if "opt_state" in restored or "step" in restored:  # TrainState flavor
        out = {"params": restored["params"]}
        if restored.get("batch_stats"):
            out["batch_stats"] = restored["batch_stats"]
        return out
    return restored["params"]
