"""Mean-shift clustering in embedding space, fixed-shape and MXU-friendly.

TPU-native reformulation of the UCN clustering pipeline that the reference
carries inside its eval wrapper (/root/reference/eval/base_model.py:622-961:
`clustering_features`, `select_smart_seeds`, `mean_shift_smart_init`,
ball-kernel hill-climbing, connected components): every data-dependent host
loop becomes a fixed-iteration masked computation:

  * seed selection: farthest-point sampling under cosine distance — a
    K-step lax.scan of argmin-of-max-similarity (instead of the reference's
    similarity-threshold "smart" sampling with data-dependent counts)
  * mean-shift: T iterations of X^T-weighted ball means — two [N, K] / [K, D]
    matmuls per iteration on the MXU
  * seed merging: connected components over the K x K similarity graph via
    min-label propagation (K parallel steps), replacing the reference's
    scipy connected_components
  * assignment: argmax cosine similarity with a background threshold

All arrays are unit-normalized embeddings; similarity = dot product.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def l2_normalize(x, axis=-1, eps=1e-12):
    return x * lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def farthest_point_seeds(x: jnp.ndarray, num_seeds: int, first: int = 0):
    """Cosine farthest-point sampling. x: [N, D] unit-norm. Returns indices
    [num_seeds]."""
    n = x.shape[0]

    def body(carry, _):
        max_sim, idx_list, i = carry
        # next seed = point least similar to all chosen seeds
        nxt = jnp.argmin(max_sim)
        sims = x @ x[nxt]
        max_sim = jnp.maximum(max_sim, sims)
        idx_list = idx_list.at[i].set(nxt)
        return (max_sim, idx_list, i + 1), None

    init_sims = x @ x[first]
    idx0 = jnp.zeros((num_seeds,), jnp.int32).at[0].set(first)
    (_, idx, _), _ = lax.scan(
        body, (init_sims, idx0, jnp.int32(1)), None, length=num_seeds - 1
    )
    return idx


def mean_shift(
    x: jnp.ndarray,
    seeds: jnp.ndarray,
    num_iters: int = 10,
    bandwidth: float = 0.5,
):
    """Ball-kernel mean-shift on the unit sphere.

    x: [N, D] unit-norm; seeds: [K, D]. Ball = {cos sim > 1 - bandwidth}.
    Returns converged seeds [K, D].
    """
    thresh = 1.0 - bandwidth

    def body(seeds, _):
        sim = x @ seeds.T  # [N, K] — MXU
        w = (sim > thresh).astype(x.dtype)
        num = w.T @ x  # [K, D] — MXU
        cnt = jnp.sum(w, axis=0)[:, None]
        new = jnp.where(cnt > 0, num / jnp.maximum(cnt, 1.0), seeds)
        return l2_normalize(new), None

    seeds, _ = lax.scan(body, l2_normalize(seeds), None, length=num_iters)
    return seeds


def merge_seeds(seeds: jnp.ndarray, merge_threshold: float = 0.9):
    """Connected components over the seed similarity graph.

    Returns (labels [K] int32 in 0..K-1 with representative = min index,
    representative mask [K] bool).
    """
    k = seeds.shape[0]
    adj = (seeds @ seeds.T) > merge_threshold  # [K, K] bool, includes self

    def body(labels, _):
        # propagate the minimum label across edges
        lab_matrix = jnp.where(adj, labels[None, :], k)
        return jnp.min(lab_matrix, axis=1), None

    labels0 = jnp.arange(k, dtype=jnp.int32)
    labels, _ = lax.scan(body, labels0, None, length=k)
    reps = labels == jnp.arange(k)
    return labels, reps


@partial(jax.jit, static_argnames=("num_seeds", "num_iters", "min_pixels"))
def cluster_embeddings(
    embeddings: jnp.ndarray,
    fg_mask: jnp.ndarray | None = None,
    num_seeds: int = 32,
    num_iters: int = 10,
    bandwidth: float = 0.5,
    merge_threshold: float = 0.9,
    assign_threshold: float = 0.6,
    min_pixels: int = 256,
):
    """Full pipeline: [H, W, D] embeddings -> instance label map [H, W].

    fg_mask optionally restricts clustering to foreground (background label
    0); labels are compacted to 1..M in seed order. Mirrors the behavior of
    mean_shift_smart_init + the pixel assignment in base_model.py:639-771.
    """
    h, w, d = embeddings.shape
    x = l2_normalize(embeddings.reshape(-1, d))
    n = x.shape[0]
    if fg_mask is None:
        fg = jnp.ones((n,), bool)
    else:
        fg = fg_mask.reshape(-1) > 0

    # bias seed sampling to foreground: background points are collapsed onto
    # the first background direction so FPS picks foreground structure
    first = jnp.argmax(fg.astype(jnp.int32))
    x_fps = jnp.where(fg[:, None], x, 0.0)
    seed_idx = farthest_point_seeds(x_fps, num_seeds, first=first)
    seeds = x[seed_idx]

    seeds = mean_shift(x * fg[:, None].astype(x.dtype), seeds, num_iters, bandwidth)
    labels_k, reps = merge_seeds(seeds, merge_threshold)

    sim = x @ seeds.T  # [N, K]
    # collapse merged seeds: route each column's similarity to its representative
    rep_sim = jnp.full_like(sim, -jnp.inf)
    rep_sim = jnp.where(reps[None, :], sim, -jnp.inf)
    best = jnp.argmax(rep_sim, axis=1)
    best_sim = jnp.max(rep_sim, axis=1)
    assigned = fg & (best_sim > assign_threshold)
    raw = jnp.where(assigned, best + 1, 0)  # 0 = background

    # cull tiny clusters, compact ids
    counts = jnp.bincount(raw, length=num_seeds + 1)
    ok = (counts >= min_pixels) & (jnp.arange(num_seeds + 1) > 0)
    new_ids = jnp.where(ok, jnp.cumsum(ok.astype(jnp.int32)), 0)
    labels = new_ids[raw].reshape(h, w)
    return {
        "labels": labels.astype(jnp.int32),
        "num_instances": jnp.sum(ok.astype(jnp.int32)),
        "seeds": seeds,
    }
