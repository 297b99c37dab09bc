"""RICE-class refiner: candidate graph operations + learned scorer + search.

The reference wraps RICE (graph-based refinement: SplitNet / MergeNet /
DeleteNet candidate operations, an SGS-Net hypothesis scorer, and CEM
sampling over a perturbation tree) at /root/reference/eval/
refiner_model.py:405-523; the RICE submodule itself is EMPTY in the
reference snapshot (SURVEY §2c), so this is a functional TPU-native
equivalent of the published method rather than a port:

  * candidate ops on fixed-shape mask stacks: pairwise merge (adjacency-
    gated), geometric split (2-means on pixel coordinates), delete
  * scorer: a small CNN over [rgb, depth-gray, mask, neighborhood-union]
    crops producing a per-node plausibility; hypothesis score = mean over
    valid nodes (the SGS-Net role)
  * search: two modes, both fully inside XLA with fixed budgets —
    "cem" (default): cross-entropy-method sampling over op sequences, the
    published RICE search. Each CEM round rolls out SAMPLES random
    trajectories of DEPTH ops (op and node drawn from learned categorical
    parameters), scores every hypothesis in one vmapped batch, picks the
    ELITES best, and refits the op distribution to the elite op
    frequencies; the best hypothesis ever seen wins.
    "greedy": one-step hill-climbing over all candidate modifications
    (the CEM tree collapsed to its greedy spine) — cheaper, deterministic.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from quber_tpu.models.layers import ConvNorm
from quber_tpu.ops.boxes import roi_align


class NodeScorer(nn.Module):
    """Per-mask plausibility from a 64x64 [rgb|depth|mask|context] crop."""

    norm: str = "GN"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [N, 64, 64, 6]
        d = self.dtype
        y = x.astype(d)
        for i, ch in enumerate([32, 64, 128]):
            y = ConvNorm(ch, 3, strides=2, norm=self.norm, act=nn.relu,
                         dtype=d, name=f"conv{i}")(y)
        y = jnp.mean(y, axis=(1, 2))
        y = nn.relu(nn.Dense(64, dtype=d, name="fc1")(y))
        return nn.Dense(1, dtype=d, name="fc2")(y)[..., 0].astype(jnp.float32)


def node_scorer_loss(good_scores, good_valid, bad_scores, bad_valid,
                     margin: float = 0.3):
    """Training recipe for the NodeScorer (the SGS-Net role).

    The RICE submodule is empty in the reference snapshot (SURVEY §2c), so
    this follows the published SGS-Net objective: rank ground-truth
    segmentation graphs above perturbed ones. Per-node BCE (nodes of the GT
    hypothesis -> 1, nodes of a perturbed hypothesis -> 0) plus a
    hypothesis-level hinge that the mean GT score exceeds the mean perturbed
    score by `margin`. Scores are NodeScorer logits; `*_valid` mask padded
    node slots.
    """
    def _mean(x, v):
        v = v.astype(jnp.float32)
        return jnp.sum(x * v) / jnp.maximum(jnp.sum(v), 1.0)

    sp = jax.nn.softplus
    bce = _mean(sp(-good_scores), good_valid) + _mean(sp(bad_scores), bad_valid)
    rank = jnp.maximum(
        0.0, margin - (_mean(good_scores, good_valid) - _mean(bad_scores, bad_valid)))
    return {"loss_node_bce": bce, "loss_rank": rank}


def hypothesis_node_crops(image6, masks, valid, crop: int = 64):
    """NodeScorer input crops for one hypothesis: per-mask 6-channel
    [rgb | depth-gray | mask | neighborhood-union] ROI crops plus the
    effective validity (valid slot AND non-empty box). Shared between the
    scorer's hypothesis scoring and the SGS-Net-style trainer so training
    crops match inference crops exactly. masks [N, H, W], image6 [H, W, 6]
    in [0, 1]; returns (crops [N, crop, crop, 6], ok [N] bool)."""
    from quber_tpu.models.ucn import instance_boxes_from_labels

    n = masks.shape[0]
    labels = jnp.max(
        masks.astype(jnp.int32) * jnp.arange(1, n + 1)[:, None, None], axis=0
    )
    boxes, bvalid = instance_boxes_from_labels(labels, n)
    union = (jnp.sum(masks, axis=0) > 0).astype(jnp.float32)

    def crop_one(box, mask):
        rgbd = roi_align(image6[..., :4], box[None], out_size=crop)[0]
        mm = roi_align(mask.astype(jnp.float32)[..., None], box[None], out_size=crop)[0]
        uu = roi_align(union[..., None], box[None], out_size=crop)[0]
        return jnp.concatenate([rgbd, mm, uu], axis=-1)

    return jax.vmap(crop_one)(boxes, masks), valid & bvalid


def split_mask_2means(mask: jnp.ndarray, iters: int = 8):
    """Geometric split: 2-means on the mask's pixel coordinates (the
    SplitNet role). Returns two disjoint masks covering the input."""
    h, w = mask.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    m = mask.astype(jnp.float32)
    area = jnp.maximum(m.sum(), 1.0)
    cy = (m * ys).sum() / area
    cx = (m * xs).sum() / area
    # init centers offset along the principal axis (approximated by the
    # larger coordinate variance)
    vy = (m * (ys - cy) ** 2).sum() / area
    vx = (m * (xs - cx) ** 2).sum() / area
    dy = jnp.sqrt(jnp.maximum(vy, 1.0))
    dx = jnp.sqrt(jnp.maximum(vx, 1.0))
    use_y = vy > vx
    c0 = jnp.where(use_y, jnp.array([cy - dy, cx]).T, jnp.array([cy, cx - dx]).T)
    c1 = jnp.where(use_y, jnp.array([cy + dy, cx]).T, jnp.array([cy, cx + dx]).T)

    def body(carry, _):
        c0, c1 = carry
        d0 = (ys - c0[0]) ** 2 + (xs - c0[1]) ** 2
        d1 = (ys - c1[0]) ** 2 + (xs - c1[1]) ** 2
        a0 = m * (d0 <= d1)
        a1 = m * (d0 > d1)
        s0 = jnp.maximum(a0.sum(), 1.0)
        s1 = jnp.maximum(a1.sum(), 1.0)
        c0 = jnp.array([(a0 * ys).sum() / s0, (a0 * xs).sum() / s0])
        c1 = jnp.array([(a1 * ys).sum() / s1, (a1 * xs).sum() / s1])
        return (c0, c1), None

    (c0, c1), _ = jax.lax.scan(body, (c0, c1), None, length=iters)
    d0 = (ys - c0[0]) ** 2 + (xs - c0[1]) ** 2
    d1 = (ys - c1[0]) ** 2 + (xs - c1[1]) ** 2
    return m * (d0 <= d1), m * (d0 > d1)


def masks_adjacent(masks: jnp.ndarray, dilate_px: int = 5) -> jnp.ndarray:
    """[N, H, W] -> [N, N] bool adjacency (dilated overlap)."""
    from quber_tpu.ops.morphology import dilate

    d = dilate(masks.astype(jnp.float32), dilate_px)
    inter = jnp.einsum("ahw,bhw->ab", d, masks.astype(jnp.float32))
    adj = inter > 0
    return adj & ~jnp.eye(masks.shape[0], dtype=bool)


class RICERefiner:
    """Eval-harness refiner: greedy graph search over merge/split/delete.

    predict(rgb_path, depth_path, initial_masks, fg_mask) ->
      (refined [N, H, W] bool, None, seconds, fg_mask)
    """

    MAX_INST = 16
    CROP = 64
    ROUNDS = 3       # greedy rounds
    CEM_ROUNDS = 2   # CEM distribution-refit iterations
    SAMPLES = 8      # trajectories per CEM round
    DEPTH = 3        # ops per trajectory
    ELITES = 3       # elite set size for the refit
    # accept an op sequence only when it beats the incumbent by this much.
    # Genuine structural repairs move the summed node score by ~+4 to +6
    # (fragment merge: two ~-1.4 nodes -> one ~+2.4; merged-object split:
    # ~-1.7 -> two ~+2.4), while the typical damage mode — deleting a true
    # object the scorer is mildly unsure about — gains < 2. Measured on the
    # synthetic benchmark: margin 0 loses 8 Objects-F points to such
    # borderline ops; the margin keeps only clear wins.
    MARGIN = 2.0

    def __init__(self, params=None, dataset="OSD", seed=0, search="cem"):
        self.scorer = NodeScorer()
        if params is None:
            params = jax.jit(self.scorer.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, self.CROP, self.CROP, 6))
            )
        self.params = params
        self.dataset = dataset
        self.search_mode = search
        self._seed = seed
        self._search = jax.jit(
            self._cem_search_impl if search == "cem" else self._search_impl
        )

    def _score_hypothesis(self, params, image6, masks, valid):
        """SUMMED per-node score over valid masks (the SGS role).

        Sum, not mean: the NodeScorer is trained to give plausible nodes
        positive logits and implausible ones negative (node_scorer_loss),
        so the hypothesis total rises exactly when an op removes/creates
        net-implausible structure. A mean is exploitable — deleting ANY
        below-average node raises it, so the search learns to cull true
        objects (measured: perturbed-GT Objects F 93 -> 76 on the synthetic
        benchmark under mean scoring; the sum restores monotone-repair)."""
        crops, ok = hypothesis_node_crops(image6, masks, valid, crop=self.CROP)
        node_scores = self.scorer.apply(params, crops)
        return jnp.sum(node_scores * ok)

    # ---- candidate graph operations (fixed-shape) ----

    @staticmethod
    def _apply_merge(masks, valid, i, j):
        merged = jnp.maximum(masks[i], masks[j])
        masks = masks.at[i].set(merged).at[j].set(0)
        valid = valid.at[j].set(False)
        return masks, valid

    @staticmethod
    def _apply_split(masks, valid, i):
        a, b = split_mask_2means(masks[i])
        slot = jnp.argmin(valid)  # first free slot
        free = ~valid[slot]
        masks = masks.at[i].set(jnp.where(free, a, masks[i]))
        masks = masks.at[slot].set(jnp.where(free, b, masks[slot]))
        valid = valid.at[slot].set(valid[slot] | free)
        return masks, valid

    @staticmethod
    def _apply_delete(masks, valid, i):
        return masks.at[i].set(0), valid.at[i].set(False)

    def _search_impl(self, params, image6, masks, valid, key):
        # greedy mode ignores the PRNG key (deterministic hill-climb)
        del key
        n = self.MAX_INST
        apply_merge = self._apply_merge
        apply_split = self._apply_split
        apply_delete = self._apply_delete

        def round_fn(state, _):
            masks, valid = state
            base = self._score_hypothesis(params, image6, masks, valid)
            adj = masks_adjacent(masks)

            # candidates: delete(i), split(i), merge(i, i+1 ring neighbor)
            def cand_delete(i):
                m2, v2 = apply_delete(masks, valid, i)
                s = self._score_hypothesis(params, image6, m2, v2)
                return jnp.where(valid[i] & (jnp.sum(valid) > 1), s, -jnp.inf)

            def cand_split(i):
                m2, v2 = apply_split(masks, valid, i)
                s = self._score_hypothesis(params, image6, m2, v2)
                big = jnp.sum(masks[i]) > 512
                return jnp.where(valid[i] & big & ~jnp.all(valid), s, -jnp.inf)

            def cand_merge(i):
                j = (i + 1) % n
                m2, v2 = apply_merge(masks, valid, i, j)
                s = self._score_hypothesis(params, image6, m2, v2)
                ok = valid[i] & valid[j] & adj[i, j]
                return jnp.where(ok, s, -jnp.inf)

            ids = jnp.arange(n)
            s_del = jax.vmap(cand_delete)(ids)
            s_spl = jax.vmap(cand_split)(ids)
            s_mrg = jax.vmap(cand_merge)(ids)
            all_scores = jnp.stack([s_del, s_spl, s_mrg])  # [3, N]
            best = jnp.unravel_index(jnp.argmax(all_scores), all_scores.shape)
            best_score = all_scores[best]
            op, i = best[0], best[1]

            def do_best(args):
                masks, valid = args
                m_d, v_d = apply_delete(masks, valid, i)
                m_s, v_s = apply_split(masks, valid, i)
                m_m, v_m = apply_merge(masks, valid, i, (i + 1) % n)
                masks = jnp.where(op == 0, m_d, jnp.where(op == 1, m_s, m_m))
                valid = jnp.where(op == 0, v_d, jnp.where(op == 1, v_s, v_m))
                return masks, valid

            improved = best_score > base + self.MARGIN
            masks, valid = jax.lax.cond(improved, do_best, lambda a: a, (masks, valid))
            return (masks, valid), best_score

        (masks, valid), _ = jax.lax.scan(
            round_fn, (masks, valid), None, length=self.ROUNDS
        )
        return masks, valid

    def _cem_search_impl(self, params, image6, masks, valid, key):
        """CEM sampling-tree search (the published RICE procedure).

        Rolls out SAMPLES op sequences of length DEPTH from categorical
        distributions over (op, node), scores all resulting hypotheses in
        one vmapped batch, refits the op distribution to the ELITES best,
        and repeats CEM_ROUNDS times. Fixed shapes throughout: invalid op
        draws degrade to no-ops instead of changing trajectory length.
        """
        n, b = self.MAX_INST, self.SAMPLES
        t, e = self.DEPTH, self.ELITES

        def rollout(key, theta_op, masks, valid):
            def step(state, key):
                masks, valid = state
                k_op, k_i, k_j = jax.random.split(key, 3)
                op = jax.random.categorical(k_op, theta_op)  # 0..3
                node_logits = jnp.where(valid, 0.0, -jnp.inf)
                i = jax.random.categorical(k_i, node_logits)
                adj = masks_adjacent(masks)
                j_logits = jnp.where(adj[i] & valid, 0.0, -jnp.inf)
                has_partner = jnp.any(adj[i] & valid)
                j = jnp.where(
                    has_partner, jax.random.categorical(k_j, j_logits), i
                )
                # validity gates: an illegal draw becomes a no-op
                can_delete = valid[i] & (jnp.sum(valid) > 1)
                can_split = valid[i] & (jnp.sum(masks[i]) > 512) & ~jnp.all(valid)
                can_merge = valid[i] & has_partner
                op = jnp.where(
                    ((op == 1) & ~can_delete)
                    | ((op == 2) & ~can_split)
                    | ((op == 3) & ~can_merge),
                    0,
                    op,
                )
                masks, valid = jax.lax.switch(
                    op,
                    [
                        lambda m, v, i, j: (m, v),
                        lambda m, v, i, j: self._apply_delete(m, v, i),
                        lambda m, v, i, j: self._apply_split(m, v, i),
                        lambda m, v, i, j: self._apply_merge(m, v, i, j),
                    ],
                    masks, valid, i, j,
                )
                return (masks, valid), op

            (masks, valid), ops = jax.lax.scan(
                step, (masks, valid), jax.random.split(key, t)
            )
            return masks, valid, ops

        base_score = self._score_hypothesis(params, image6, masks, valid)
        # op prior: mostly small edits — favor no-op least, real ops evenly
        theta_op = jnp.log(jnp.asarray([0.1, 0.3, 0.3, 0.3]))
        best = (base_score, masks, valid)

        def cem_round(carry, key):
            theta_op, best = carry
            keys = jax.random.split(key, b)
            h_masks, h_valid, h_ops = jax.vmap(
                lambda k: rollout(k, theta_op, masks, valid)
            )(keys)
            scores = jax.vmap(
                lambda m, v: self._score_hypothesis(params, image6, m, v)
            )(h_masks, h_valid)
            # elite refit: op frequencies of the top-e trajectories
            _, elite_idx = jax.lax.top_k(scores, e)
            elite_ops = h_ops[elite_idx]  # [e, t]
            freq = jnp.mean(jax.nn.one_hot(elite_ops, 4), axis=(0, 1))
            theta_op = jnp.log(freq + 0.05)
            # track the best hypothesis ever seen (margin-gated)
            r_best = jnp.argmax(scores)
            better = scores[r_best] > best[0] + self.MARGIN
            best = (
                jnp.where(better, scores[r_best], best[0]),
                jnp.where(better, h_masks[r_best], best[1]),
                jnp.where(better, h_valid[r_best], best[2]),
            )
            return (theta_op, best), scores[r_best]

        (_, best), _ = jax.lax.scan(
            cem_round, (theta_op, best), jax.random.split(key, self.CEM_ROUNDS)
        )
        return best[1], best[2]

    def predict(self, rgb_path, depth_path, initial_masks, fg_mask):
        import time

        from quber_tpu.evaluation.refiner_models import _load_rgbd

        rgb, depth_n, zero_depth = _load_rgbd(rgb_path, depth_path)
        h, w = rgb.shape[:2]
        image6 = np.concatenate(
            [rgb.astype(np.float32) / 255.0, depth_n.astype(np.float32) / 255.0], -1
        )
        n = self.MAX_INST
        masks = np.zeros((n, h, w), np.float32)
        count = min(len(initial_masks), n)
        for i in range(count):
            masks[i] = np.asarray(initial_masks[i]) > 0
        valid = np.zeros((n,), bool)
        valid[:count] = True

        t0 = time.time()
        out_masks, out_valid = self._search(
            self.params, jnp.asarray(image6), jnp.asarray(masks),
            jnp.asarray(valid), jax.random.PRNGKey(self._seed),
        )
        out_masks = np.asarray(out_masks) > 0.5
        out_valid = np.asarray(out_valid) & (out_masks.sum((1, 2)) > 0)
        elapsed = time.time() - t0
        return out_masks[out_valid], None, elapsed, fg_mask
