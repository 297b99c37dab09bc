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


def farthest_point_seeds_euclidean(x: jnp.ndarray, num_seeds: int, first: int = 0):
    """Euclidean farthest-point sampling. x: [N, D]."""

    def body(carry, _):
        min_d2, idx_list, i = carry
        nxt = jnp.argmax(min_d2)
        d2 = jnp.sum((x - x[nxt]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        idx_list = idx_list.at[i].set(nxt)
        return (min_d2, idx_list, i + 1), None

    init = jnp.sum((x - x[first]) ** 2, axis=-1)
    idx0 = jnp.zeros((num_seeds,), jnp.int32).at[0].set(first)
    (_, idx, _), _ = lax.scan(body, (init, idx0, jnp.int32(1)), None, length=num_seeds - 1)
    return idx


def mean_shift_euclidean(x, seeds, num_iters: int = 10, bandwidth: float = 0.05):
    """Flat-ball mean-shift in Euclidean space (UOIS-Net-3D clusters center
    votes xyz+offset in metric 3D space, uois/src/cluster.py flavor)."""
    bw2 = bandwidth * bandwidth

    def body(seeds, _):
        d2 = jnp.sum((x[:, None, :] - seeds[None, :, :]) ** 2, axis=-1)  # [N, K]
        w = (d2 < bw2).astype(x.dtype)
        num = w.T @ x
        cnt = jnp.sum(w, axis=0)[:, None]
        return jnp.where(cnt > 0, num / jnp.maximum(cnt, 1.0), seeds), None

    seeds, _ = lax.scan(body, seeds, None, length=num_iters)
    return seeds


@partial(jax.jit, static_argnames=("num_seeds", "num_iters", "min_pixels"))
def cluster_points_euclidean(
    points: jnp.ndarray,
    fg_mask: jnp.ndarray,
    num_seeds: int = 32,
    num_iters: int = 10,
    bandwidth: float = 0.06,
    merge_distance: float = 0.04,
    min_pixels: int = 256,
):
    """[H, W, 3] center votes + fg mask -> instance label map [H, W].

    Euclidean twin of cluster_embeddings for the UOIS-Net-3D pipeline:
    FPS seeds on foreground votes, flat-ball mean-shift, distance-based seed
    merging, nearest-center assignment within the foreground.
    """
    h, w, d = points.shape
    x = points.reshape(-1, d)
    fg = fg_mask.reshape(-1) > 0

    first = jnp.argmax(fg.astype(jnp.int32))
    far = x + (~fg[:, None]) * 1e6  # push background out of FPS's way
    seed_idx = farthest_point_seeds_euclidean(far, num_seeds, first=first)
    seeds = x[seed_idx]

    xin = jnp.where(fg[:, None], x, 1e6)
    seeds = mean_shift_euclidean(xin, seeds, num_iters, bandwidth)

    # merge close seeds via min-label propagation
    k = seeds.shape[0]
    d2 = jnp.sum((seeds[:, None] - seeds[None, :]) ** 2, axis=-1)
    adj = d2 < merge_distance**2

    def prop(labels, _):
        lab = jnp.where(adj, labels[None, :], k)
        return jnp.min(lab, axis=1), None

    labels_k, _ = lax.scan(prop, jnp.arange(k, dtype=jnp.int32), None, length=k)
    reps = labels_k == jnp.arange(k)

    dist = jnp.sum((x[:, None] - seeds[None]) ** 2, axis=-1)
    dist = jnp.where(reps[None, :], dist, jnp.inf)
    best = jnp.argmin(dist, axis=1)
    best_d = jnp.min(dist, axis=1)
    assigned = fg & (best_d < bandwidth**2 * 4)
    raw = jnp.where(assigned, best + 1, 0)
    counts = jnp.bincount(raw, length=num_seeds + 1)
    ok = (counts >= min_pixels) & (jnp.arange(num_seeds + 1) > 0)
    new_ids = jnp.where(ok, jnp.cumsum(ok.astype(jnp.int32)), 0)
    return {
        "labels": new_ids[raw].reshape(h, w).astype(jnp.int32),
        "num_instances": jnp.sum(ok.astype(jnp.int32)),
        "seeds": seeds,
    }


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
