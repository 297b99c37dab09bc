import os

# Tests run on a virtual multi-device CPU mesh; must be configured before the
# JAX backend initializes. The axon TPU plugin registers itself regardless of
# JAX_PLATFORMS, so we also force the platform through jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual device threads share this host's ONE core; XLA:CPU aborts the
    # whole process when collective participants arrive > 40 s apart, which
    # scheduler stagger alone can trigger here. Give the rendezvous room.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by XLA:CPU compiles of
# the large models (a cold run takes ~1 h on this single-core host); warm
# reruns drop to minutes. Safe to share across processes; keyed by HLO hash.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def random_blobs(rng, n, h, w, min_r=8, max_r=40):
    """Generate n random filled-circle masks [n, h, w] uint8."""
    ys, xs = np.mgrid[:h, :w]
    masks = []
    for _ in range(n):
        cy = rng.randint(max_r, h - max_r)
        cx = rng.randint(max_r, w - max_r)
        r = rng.randint(min_r, max_r)
        masks.append(((ys - cy) ** 2 + (xs - cx) ** 2 <= r * r).astype(np.uint8))
    return np.stack(masks) if masks else np.zeros((0, h, w), np.uint8)


@pytest.fixture
def blobs():
    return random_blobs


# ---------------------------------------------------------------------------
# Test tiers: `pytest -m quick` runs the op-level/pure-function subset
# (< ~1 min warm); the remaining model/train tests are marked slow (the
# suite is compile-bound on XLA:CPU — see tests/.jax_cache note above).
# ---------------------------------------------------------------------------

_QUICK_FILES = {
    "test_augmentation.py", "test_boxes.py", "test_clip_text.py",
    "test_data.py", "test_device_metrics.py", "test_encoding.py",
    "test_grouping.py", "test_metrics.py", "test_morphology.py",
    "test_pallas_kernels.py", "test_preprocess.py", "test_zoom.py",
    "test_tools_pipeline.py", "test_meanshift.py", "test_eval_tools.py",
    "test_aug_tools.py", "test_transport_native.py", "test_synthetic.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.fspath.basename
        item.add_marker(
            pytest.mark.quick if name in _QUICK_FILES else pytest.mark.slow
        )
