"""QuBER-TPU: TPU-native unknown-object instance segmentation mask refinement.

A ground-up JAX/XLA/Pallas re-design of the capabilities of gist-ailab/QuBER
("Quadruple Boundary Error Refinement"): RGB-D mask refinement for
unknown-object instance segmentation (UOIS) on tabletop scenes.

Layering (TPU-first):
  ops/        pure jit-safe array ops: morphology, encodings, grouping, resize
  models/     flax modules: RGB-D fusion backbone, DeepLabV3+ refiner head,
              CGNet / LMFFNet foreground segmenters, Panoptic-DeepLab baseline
  parallel/   jax.sharding mesh utilities (data-parallel over ICI)
  train/      optax optimizers / LR schedules, orbax checkpointing, train loop
  data/       dataset registration, perturbation tools, target generation
  evaluation/ Overlap/Boundary P/R/F metrics with Hungarian matching, harness

Everything in the refine hot path (mask encoding -> dual-trunk backbone ->
hierarchical error heads -> center grouping) compiles into a single XLA
program at a fixed 480x640 resolution with MAX_INSTANCES padding.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the flagship model takes minutes to
# compile at 480x640 over the remote-TPU tunnel; cache compiled executables
# across processes. TPU-only: XLA:CPU AOT cache entries reload with
# machine-feature mismatches ("could lead to SIGILL") and have been observed
# to wedge eager dispatch. Opt out with QUBER_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("QUBER_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/quber_jax")
    )
    try:
        if _jax.config.jax_platforms != "cpu":
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
