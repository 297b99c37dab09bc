"""Profiling / analysis tools.

Equivalents of the reference tooling (SURVEY §5): fvcore param/FLOP tables
(/root/reference/tools/analyze_model.py, maskrefiner/predictor.py:32-142) via
XLA cost analysis; the BENCHMARK_NETWORK_SPEED network-only timing flag
(maskrefiner/config.py:101-102, model.py:256-257); and jax.profiler trace
capture for TensorBoard.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

import jax


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (verified to work through
    the axon remote-compile transport: entries are written and hit across
    processes). Call before the first jit execution; the big refine/train
    pipelines take 30-60 s each to compile cold, ~0 s warm.
    """
    import os

    path = path or os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def parameter_count_table(params, depth: int = 2) -> str:
    """Hierarchical parameter-count table (predictor.py:55-142 equivalent)."""
    rows: dict[str, int] = {}
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        keys = [str(getattr(k, "key", k)) for k in path]
        for d in range(1, depth + 1):
            prefix = ".".join(keys[:d])
            rows[prefix] = rows.get(prefix, 0) + n

    def fmt(n):
        return f"{n / 1e6:.2f}M" if n >= 1e6 else f"{n / 1e3:.1f}K"

    lines = [f"{'module':60s} params", "-" * 70]
    for key in sorted(rows):
        indent = "  " * key.count(".")
        lines.append(f"{indent}{key:58s} {fmt(rows[key])}"[:80])
    lines.append("-" * 70)
    lines.append(f"{'TOTAL':60s} {fmt(total)}")
    return "\n".join(lines)


def cost_analysis(fn: Callable, *example_args) -> dict:
    """XLA cost analysis of a jitted function: FLOPs, bytes accessed
    (fvcore FlopCountAnalysis equivalent via compiled.cost_analysis())."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    return {
        "flops": costs.get("flops"),
        "bytes_accessed": costs.get("bytes accessed"),
        "gflops": (costs.get("flops") or 0) / 1e9,
    }


def benchmark_network_speed(fn: Callable, *example_args, iters: int = 20,
                            warmup: int = 2) -> dict:
    """Network-only timing, skipping all post-processing and transfers
    beyond a forced checksum sync (BENCHMARK_NETWORK_SPEED equivalent).

    Note: on remote-TPU transports, per-array block_until_ready may not
    actually synchronize; this forces a small device->host readback of a
    checksum, which is the only reliable fence.
    """
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    pad = jnp.zeros((307200,), jnp.uint8)  # keep the readback on the bulk path

    def fenced(*a):
        flat, _ = ravel_pytree(jax.tree.map(lambda x: x.astype(jnp.float32), fn(*a)))
        return jnp.concatenate([jnp.sum(flat).astype(jnp.uint8).reshape(1), pad])

    g = jax.jit(fenced)
    for _ in range(warmup):
        np.asarray(g(*example_args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(g(*example_args))
        times.append(time.time() - t0)
    times = np.asarray(times)
    return {
        "mean_ms": float(times.mean() * 1000),
        "std_ms": float(times.std() * 1000),
        "fps": float(1.0 / times.mean()),
    }


def trace(log_dir: str = "/tmp/quber_trace"):
    """Context manager: capture a jax.profiler trace viewable in TensorBoard."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        jax.profiler.start_trace(log_dir)
        try:
            yield log_dir
        finally:
            jax.profiler.stop_trace()

    return ctx()
