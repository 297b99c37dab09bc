#!/usr/bin/env python
"""Zoo base-segmenter training CLI on the in-repo synthetic scenes.

The reference trains each base segmenter in its own vendored repo; this
driver is the TPU-native equivalent, one fixed-shape jitted step per model:

  uoaisnet   adet RPN/ROI/mask losses (ext_modules/uoais rcnn_heads.py:62-381)
             -> quber_tpu/models/uoais_net.uoais_losses
  uoisnet3d  DSN fg CE + offset smooth-L1 + separation + cluster losses and
             RRN weighted BCE (uois/src/train.py:151-330)
             -> quber_tpu/models/uois_net.{dsn_train_losses, rrn_loss}
  ucn        metric-learning embeddings (UnseenObjectClustering recipe,
             prototype pull/push) -> quber_tpu/models/ucn.prototype_metric_loss
  msmformer  Mask2Former-style Hungarian set loss
             -> quber_tpu/models/msmformer.msmformer_set_loss
  rice       SGS-Net-style NodeScorer ranking: GT hypothesis nodes above
             corrupted ones -> quber_tpu/models/rice.node_scorer_loss

    python tools/train_zoo.py --model uoaisnet --size 192 --max-iter 3000 \
        --output-dir output/uoaisnet_synth

The checkpoints load into the eval harness via env vars, e.g.:
    QUBER_UOAISNET_CKPT=output/uoaisnet_synth/ckpt python run_eval.py \
        --base-model uoaisnet --refiner-model maskrefiner ...
(uoisnet3d writes ckpt_dsn/ + ckpt_rrn/ -> QUBER_UOIS3D_DSN_CKPT /
QUBER_UOIS3D_RRN_CKPT; ucn -> QUBER_UCN_CKPT; msmformer ->
QUBER_MSMFORMER_NATIVE_CKPT; rice -> QUBER_RICE_CKPT.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLOTS = 12  # gt instance slots (synthetic scenes have 3-8 objects)


def make_scenes(n, h, w, seed, depth_range):
    """Pre-render scenes to host arrays the jitted step consumes directly:
    rgb float32 0..255 (the eval wrapper feeds raw cv2 BGR; synthetic colors
    are channel-symmetric), depth normalized to the 0..255 x3 encoding
    (preprocess_utils.py:12-28), gt padded to SLOTS."""
    import numpy as np

    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.ops.preprocess import normalize_depth

    rng = np.random.RandomState(seed)
    scenes = []
    for _ in range(n):
        rgb, depth_mm, vis, amo = render_scene(
            rng, h, w, depth_range=depth_range, return_amodal=True
        )
        k = min(vis.shape[0], SLOTS)
        boxes = np.zeros((SLOTS, 4), np.float32)
        gvis = np.zeros((SLOTS, h, w), np.float32)
        gamo = np.zeros((SLOTS, h, w), np.float32)
        valid = np.zeros((SLOTS,), bool)
        for i in range(k):
            ys, xs = np.nonzero(amo[i])
            boxes[i] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
            gvis[i] = vis[i]
            gamo[i] = amo[i]
            valid[i] = True
        scenes.append({
            "rgb": rgb.astype(np.float32),
            "depth": normalize_depth(depth_mm).astype(np.float32),
            "boxes": boxes, "vis": gvis, "amo": gamo, "valid": valid,
        })
    return scenes


def make_labeled_scenes(n, h, w, seed, depth_range):
    """Scenes for the pixel-labeling trainers (uoisnet3d / ucn / msmformer):
    standardized RGB, XYZ point cloud (OSD-default intrinsics, as the eval
    wrappers use), compact instance labels {0=bg, 1+k=object k}, per-object
    XYZ centers and center-offset targets."""
    import numpy as np

    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.ops.preprocess import compute_xyz, standardize_image

    cam = {"fx": 550.0, "fy": 550.0, "x_offset": w / 2.0, "y_offset": h / 2.0,
           "img_width": w, "img_height": h}
    rng = np.random.RandomState(seed)
    out = {k: [] for k in ("rgb", "xyz", "labels", "centers", "valid", "offsets")}
    for _ in range(n):
        rgb, depth_mm, vis = render_scene(rng, h, w, depth_range=depth_range)
        xyz = compute_xyz(depth_mm.astype(np.float32) / 1000.0, cam)
        labels = np.zeros((h, w), np.int32)
        centers = np.zeros((SLOTS, 3), np.float32)
        valid = np.zeros((SLOTS,), bool)
        offsets = np.zeros((h, w, 3), np.float32)
        for i in range(min(vis.shape[0], SLOTS)):
            m = vis[i] > 0
            if not m.any():
                continue
            labels[m] = 1 + i
            centers[i] = xyz[m].mean(axis=0)
            offsets[m] = centers[i] - xyz[m]
            valid[i] = True
        out["rgb"].append(standardize_image(rgb).astype(np.float32))
        out["xyz"].append(xyz.astype(np.float32))
        out["labels"].append(labels)
        out["centers"].append(centers)
        out["valid"].append(valid)
        out["offsets"].append(offsets)
    return {k: np.stack(v) for k, v in out.items()}


def _stage(pool):
    """Upload the whole scene pool to the device ONCE; steps gather by
    on-device index (the axon transport never frees per-step H2D payloads
    host-side — see .claude/skills/verify). The staged pool must be PASSED
    to the jitted step as an argument, never closed over: captured device
    arrays lower as constants (gigabytes into every compile payload)."""
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in pool.items()}


def _fit_loop(step, n_scenes, args, save_fn):
    """Shared driver: shuffled scene order, periodic logging + checkpoints.
    `step(it, scene_index)` returns (total_loss, parts_dict)."""
    import numpy as np

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(n_scenes)
    cursor = 0
    t0 = time.time()
    for it in range(1, args.max_iter + 1):
        if cursor >= len(order):
            order = rng.permutation(n_scenes)
            cursor = 0
        loss, parts = step(it, int(order[cursor]))
        cursor += 1
        if it % args.log_period == 0 or it == args.max_iter:
            detail = " ".join(
                f"{k}={float(v):.4f}" for k, v in sorted(parts.items()))
            print(f"iter {it}/{args.max_iter} total={float(loss):.4f} {detail} "
                  f"({it / (time.time() - t0):.2f} it/s)", flush=True)
        if it % args.checkpoint_period == 0 or it == args.max_iter:
            save_fn(it)
            print(f"checkpoint saved at {it}", flush=True)


def train_uoisnet3d(args):
    """DSN + RRN joint recipe (uois/src/train.py DSNTrainer + RRNTrainer):
    one jitted step trains both nets on a scene — the DSN on the full
    reference objective over XYZ, the RRN on weighted BCE over a
    morphology-perturbed initial mask of one random instance."""
    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.uois_net import (
        DepthSeedingNetwork,
        RegionRefinementNetwork,
        dsn_train_losses,
        rrn_loss,
    )
    from quber_tpu.ops import morphology
    from quber_tpu.train.checkpoint import save_params

    pool = _stage(make_labeled_scenes(args.size, args.height, args.width,
                                      args.seed, tuple(args.depth_range)))
    dsn = DepthSeedingNetwork()
    rrn = RegionRefinementNetwork()
    d_vars = jax.jit(dsn.init)(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.height, args.width, 3)))
    r_vars = jax.jit(rrn.init)(
        jax.random.PRNGKey(args.seed + 1),
        jnp.zeros((1, args.height, args.width, 4)))
    tx = optax.adam(args.lr)
    params = {"dsn": d_vars, "rrn": r_vars}
    opt_state = tx.init(params)

    @jax.jit
    def jstep(params, opt_state, pool, idx, key):
        rgb = pool["rgb"][idx]
        xyz = pool["xyz"][idx]
        labels = pool["labels"][idx]
        centers = pool["centers"][idx]
        valid = pool["valid"][idx]
        off_t = pool["offsets"][idx]
        k_cl, k_inst, k_jit = jax.random.split(key, 3)
        # one random valid instance for the RRN, mask jittered by a random
        # dilate/erode (the reference trains the RRN on perturbed masks)
        probs = valid / jnp.maximum(valid.sum(), 1)
        inst = jax.random.choice(k_inst, SLOTS, (), p=probs)
        gt_mask = (labels == 1 + inst).astype(jnp.float32)
        jitter = jax.random.randint(k_jit, (), 0, 3)
        perturbed = jax.lax.switch(jitter, [
            lambda m: m,
            lambda m: morphology.dilate(m[None], 2)[0],
            lambda m: morphology.erode(m[None], 2)[0],
        ], gt_mask)

        def loss_fn(p):
            fg_logits, offsets = dsn.apply(p["dsn"], xyz[None])
            dl = dsn_train_losses(
                fg_logits[0], offsets[0], xyz, off_t, labels, centers, valid,
                k_cl, object_label=1, sigma=args.gms_sigma, delta=args.gms_delta)
            rin = jnp.concatenate([rgb, perturbed[..., None]], axis=-1)
            rl = rrn_loss(rrn.apply(p["rrn"], rin[None])[0, ..., 0], gt_mask)
            losses = dict(dl, loss_rrn=rl)
            return sum(losses.values()), losses

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, parts

    dsn_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt_dsn"))
    rrn_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt_rrn"))
    os.makedirs(dsn_dir, exist_ok=True)
    os.makedirs(rrn_dir, exist_ok=True)
    state = {"params": params, "opt": opt_state}

    def step(it, idx):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), it)
        state["params"], state["opt"], loss, parts = jstep(
            state["params"], state["opt"], pool, idx, key)
        return loss, parts

    def save(it):
        save_params(dsn_dir, state["params"]["dsn"], step=it)
        save_params(rrn_dir, state["params"]["rrn"], step=it)

    _fit_loop(step, args.size, args, save)


def train_ucn(args):
    """UCN metric-learning recipe: per-pixel embeddings pulled to their
    instance prototype and pushed from the others
    (quber_tpu/models/ucn.prototype_metric_loss; the reference trains this
    in the UnseenObjectClustering submodule, absent from the snapshot)."""
    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.ucn import UCNEmbeddingNet, prototype_metric_loss
    from quber_tpu.train.checkpoint import save_params

    pool = _stage(make_labeled_scenes(args.size, args.height, args.width,
                                      args.seed, tuple(args.depth_range)))
    model = UCNEmbeddingNet()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.height, args.width, 3)),
        jnp.zeros((1, args.height, args.width, 3)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables)

    @jax.jit
    def jstep(variables, opt_state, pool, idx):
        def loss_fn(v):
            emb = model.apply(v, pool["rgb"][idx][None], pool["xyz"][idx][None])
            loss, parts = prototype_metric_loss(
                emb, pool["labels"][idx][None], max_instances=SLOTS + 1)
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state2 = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state2, loss, parts

    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt"))
    os.makedirs(ckpt_dir, exist_ok=True)
    state = {"v": variables, "opt": opt_state}

    def step(it, idx):
        state["v"], state["opt"], loss, parts = jstep(
            state["v"], state["opt"], pool, idx)
        return loss, parts

    _fit_loop(step, args.size, args,
              lambda it: save_params(ckpt_dir, state["v"], step=it))


def train_msmformer(args):
    """MSMFormer set-prediction recipe: Hungarian-matched mask BCE+dice +
    objectness (quber_tpu/models/msmformer.msmformer_set_loss, the
    Mask2Former criterion role)."""
    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.msmformer import MSMFormer, msmformer_set_loss
    from quber_tpu.train.checkpoint import save_params

    pool = _stage(make_labeled_scenes(args.size, args.height, args.width,
                                      args.seed, tuple(args.depth_range)))
    model = MSMFormer(dtype=jnp.bfloat16)  # matches MSMFormerBaseModel
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.height, args.width, 3)),
        jnp.zeros((1, args.height, args.width, 3)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables)

    @jax.jit
    def jstep(variables, opt_state, pool, idx):
        labels = pool["labels"][idx]
        # gt mask stack at the mask-logit stride (H/4)
        gt = (labels[::4, ::4][None] == 1 + jnp.arange(SLOTS)[:, None, None])

        def loss_fn(v):
            out = model.apply(v, pool["rgb"][idx][None], pool["xyz"][idx][None])
            losses = msmformer_set_loss(
                out, gt.astype(jnp.float32)[None], pool["valid"][idx][None])
            return sum(losses.values()), losses

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state2 = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state2, loss, parts

    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt"))
    os.makedirs(ckpt_dir, exist_ok=True)
    state = {"v": variables, "opt": opt_state}

    def step(it, idx):
        state["v"], state["opt"], loss, parts = jstep(
            state["v"], state["opt"], pool, idx)
        return loss, parts

    _fit_loop(step, args.size, args,
              lambda it: save_params(ckpt_dir, state["v"], step=it))


def make_rice_scenes(n, h, w, seed, depth_range, slots):
    """Scene pools for the NodeScorer trainer: image6 (BGR/255 + normalized
    depth/255, the exact RICERefiner.predict encoding), a plausible-node
    stack, and an implausible-node stack from the data-generation
    perturbation family.

    Label semantics follow what RICE's ops can actually repair — graph
    STRUCTURE (rice's SplitNet/MergeNet/DeleteNet fix under/over-
    segmentation and false positives; none of them move boundaries):
      * plausible ("good"): GT masks AND perturbed masks that still match
        a GT object at IoU > 0.75 — the scorer must be invariant to
        boundary jitter, or the search learns to delete every mildly
        imprecise true object (measured before this split: refined
        Objects F DROPS 93 -> 75 on perturbed-GT input because nearly all
        IoU-0.6-0.9 jittered nodes scored negative).
      * implausible ("bad"): perturbed masks with best-IoU < 0.5 to any
        GT — merges, fragments, and hallucinated regions, the structural
        errors delete/split/merge exist to remove.
      * the 0.5-0.75 band is ambiguous and excluded from both sets."""
    import numpy as np

    from quber_tpu.data.perturb import (mask_iou, modify_boundary,
                                        perturb_masks, random_blob,
                                        split_mask)
    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.ops.preprocess import normalize_depth

    rng = np.random.RandomState(seed)
    out = {k: [] for k in ("image6", "good", "gvalid", "bad", "bvalid")}
    for _ in range(n):
        rgb, depth_mm, vis = render_scene(rng, h, w, depth_range=depth_range)
        # cv2.imread gives BGR at eval time; the synthetic colors are
        # channel-symmetric but keep the order consistent anyway
        image6 = np.concatenate([
            rgb[..., ::-1].astype(np.float32) / 255.0,
            normalize_depth(depth_mm.astype(np.float32),
                            depth_range[0], depth_range[1]) / 255.0,
        ], axis=-1)
        gt = [m.astype(np.uint8) for m in vis if m.any()]
        good = np.zeros((slots, h, w), np.float32)
        gvalid = np.zeros((slots,), bool)
        i = 0
        for m in gt[:slots]:
            good[i], gvalid[i] = m, True
            i += 1
        # jitter-invariant positives: boundary-modified GT at the eval
        # protocol's IoU range still denotes the same object
        for m in gt:
            if i >= slots:
                break
            jit = modify_boundary(m, rng, (0.55, 0.9))
            if jit.any() and mask_iou(jit, m) > 0.4:
                good[i], gvalid[i] = jit, True
                i += 1
        # DENSE structural hard negatives — one per op the search can
        # apply, so each op's damage is explicitly scored low. Without the
        # fragment negatives the scorer rates split halves positive
        # (measured +1.67 mean logit, 96% positive) and the search learns
        # to oversegment every large object.
        bad = np.zeros((slots, h, w), np.float32)
        bvalid = np.zeros((slots,), bool)
        j = 0

        def _push_bad(m):
            nonlocal j
            if j < slots and m.any():
                if max((mask_iou(m, g) for g in gt), default=0.0) < 0.75:
                    bad[j], bvalid[j] = m, True
                    j += 1

        for m in gt:  # fragments: halves of every GT object
            for piece in split_mask(m, rng):
                _push_bad(piece)
        if len(gt) >= 2:  # merges: random GT pairs
            for _ in range(2):
                a, b = rng.choice(len(gt), 2, replace=False)
                _push_bad(np.maximum(gt[a], gt[b]))
        for _ in range(2):  # hallucinated regions
            _push_bad(random_blob(rng, h, w))
        # plus the generic corruption family (skewed structural via the
        # wide IoU range), filling any remaining slots
        pert = perturb_masks(np.asarray(gt), rng, target_iou=(0.3, 0.9))
        for m in pert:
            if max((mask_iou(m, g) for g in gt), default=0.0) < 0.5:
                _push_bad(m)
        out["image6"].append(image6.astype(np.float32))
        out["good"].append(good)
        out["gvalid"].append(gvalid)
        out["bad"].append(bad)
        out["bvalid"].append(bvalid)
    return {k: np.stack(v) for k, v in out.items()}


def train_rice(args):
    """RICE NodeScorer recipe (the SGS-Net role; RICE submodule empty in the
    reference snapshot, built from the published method): rank GT hypothesis
    nodes above corrupted-hypothesis nodes, with crops produced by the SAME
    hypothesis_node_crops path the CEM/greedy search scores at eval time."""
    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.rice import (
        NodeScorer,
        RICERefiner,
        hypothesis_node_crops,
        node_scorer_loss,
    )
    from quber_tpu.train.checkpoint import save_params

    slots = RICERefiner.MAX_INST
    pool = _stage(make_rice_scenes(args.size, args.height, args.width,
                                   args.seed, tuple(args.depth_range), slots))
    scorer = NodeScorer()
    crop = RICERefiner.CROP
    variables = jax.jit(scorer.init)(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, crop, crop, 6)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables)

    @jax.jit
    def jstep(variables, opt_state, pool, idx):
        image6 = pool["image6"][idx]
        gc, g_ok = hypothesis_node_crops(
            image6, pool["good"][idx], pool["gvalid"][idx], crop=crop)
        bc, b_ok = hypothesis_node_crops(
            image6, pool["bad"][idx], pool["bvalid"][idx], crop=crop)

        def loss_fn(v):
            losses = node_scorer_loss(scorer.apply(v, gc), g_ok,
                                      scorer.apply(v, bc), b_ok)
            return sum(losses.values()), losses

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state2 = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state2, loss, parts

    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt"))
    os.makedirs(ckpt_dir, exist_ok=True)
    state = {"v": variables, "opt": opt_state}

    def step(it, idx):
        state["v"], state["opt"], loss, parts = jstep(
            state["v"], state["opt"], pool, idx)
        return loss, parts

    _fit_loop(step, args.size, args,
              lambda it: save_params(ckpt_dir, state["v"], step=it))


def make_refine_crops(n, h, w, seed, depth_range, crop=224, per_scene=3):
    """Crop pool for the single-mask refiner baselines (CascadePSP): for
    each sampled GT object, a GLOBAL sample (whole frame resized to crop^2,
    the wrapper's global pass) and an ROI sample (expanded-box zoom, the
    wrapper's local pass) with a boundary-perturbed seg input.

    Channels follow CascadePSPRefiner._refine_impl exactly: rgb ImageNet-
    normalized, depth /255 from the eval normalize_depth encoding, seg in
    {0,1} (scaled to [-1,1] at the consumer)."""
    import cv2
    import numpy as np

    from quber_tpu.data.perturb import mask_iou, modify_boundary
    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.models.cascadepsp import IMAGENET_MEAN, IMAGENET_STD
    from quber_tpu.ops.preprocess import normalize_depth

    rng = np.random.RandomState(seed)
    out = {k: [] for k in ("rgbd", "seg", "tgt")}
    g = crop
    while len(out["rgbd"]) < n:
        rgb, depth_mm, vis = render_scene(rng, h, w, depth_range=depth_range)
        rgbn = (rgb[..., ::-1].astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        depth = normalize_depth(depth_mm.astype(np.float32),
                                depth_range[0], depth_range[1])[..., :1] / 255.0
        rgbd = np.concatenate([rgbn, depth], axis=-1)
        objs = [m.astype(np.uint8) for m in vis if m.sum() >= 64]
        rng.shuffle(objs)
        for m in objs[:per_scene]:
            pert = modify_boundary(m, rng, (0.6, 0.95))
            if not pert.any() or mask_iou(pert, m) < 0.3:
                pert = m
            ys, xs = np.where(m + pert)
            y0, y1 = ys.min(), ys.max() + 1
            x0, x1 = xs.min(), xs.max() + 1
            mg = rng.uniform(0.15, 0.6)
            y0 = max(0, int(y0 - mg * (y1 - y0)))
            y1 = min(h, int(y1 + mg * (y1 - y0)))
            x0 = max(0, int(x0 - mg * (x1 - x0)))
            x1 = min(w, int(x1 + mg * (x1 - x0)))
            for view in ("global", "roi"):
                if len(out["rgbd"]) >= n:
                    break
                sl = (slice(None), slice(None)) if view == "global" else (
                    slice(y0, y1), slice(x0, x1))
                out["rgbd"].append(cv2.resize(rgbd[sl], (g, g)))
                out["seg"].append(cv2.resize(pert[sl].astype(np.float32),
                                             (g, g)))
                out["tgt"].append(cv2.resize(m[sl].astype(np.float32),
                                             (g, g)))
    return {k: np.stack(v).astype(np.float32) for k, v in out.items()}


def train_cascadepsp(args):
    """CascadePSP-RGBD refiner recipe: per-stage BCE over the s8/s4 cascade
    side outputs + L1/L2/gradient on the final s1 logit
    (models/cascadepsp.cascadepsp_refine_loss), on global + ROI crops of
    boundary-perturbed GT masks — the single-mask refinement task the
    reference baseline performs in the eval harness
    (eval/refiner_model.py:300-404). BatchNorms run in eval mode
    (init running stats), matching the eval-time wrapper's configuration;
    scale/bias remain learnable."""
    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.cascadepsp import (
        CascadePSPRefiner,
        PSPNetUOAIS,
        cascadepsp_refine_loss,
    )
    from quber_tpu.train.checkpoint import save_params

    g = CascadePSPRefiner.GLOBAL
    pool = _stage(make_refine_crops(args.size, args.height, args.width,
                                    args.seed, tuple(args.depth_range),
                                    crop=g))
    model = PSPNetUOAIS()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, g, g, 3)),
        jnp.zeros((1, g, g, 1)), jnp.zeros((1, g, g, 1)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables)
    bsz = 4

    @jax.jit
    def jstep(variables, opt_state, pool, idx):
        rgbd = pool["rgbd"][idx]           # [B, g, g, 4]
        seg = (pool["seg"][idx][..., None] - 0.5) / 0.5
        tgt = pool["tgt"][idx]

        def loss_fn(v):
            images = model.apply(v, rgbd[..., :3], rgbd[..., 3:4], seg)
            losses = cascadepsp_refine_loss(images, tgt)
            return sum(losses.values()), losses

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state2 = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state2, loss, parts

    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt"))
    os.makedirs(ckpt_dir, exist_ok=True)
    state = {"v": variables, "opt": opt_state}
    rng = __import__("numpy").random.default_rng(args.seed + 1)

    def step(it, idx):
        batch = (rng.integers(0, args.size, bsz - 1).tolist() + [idx])
        state["v"], state["opt"], loss, parts = jstep(
            state["v"], state["opt"], pool,
            __import__("jax").numpy.asarray(batch))
        return loss, parts

    _fit_loop(step, args.size, args,
              lambda it: save_params(ckpt_dir, state["v"], step=it))


SAMHQ_SYNTH_ARCH = dict(img_size=256, embed_dim=256, depth=6, num_heads=8,
                        global_blocks=(2, 5), window_size=8)


def make_samhq_scenes(n, h, w, seed, depth_range, img_size, slots=4):
    """SAM-HQ fine-tune pool: SAM-normalized square frames + per-object
    mask prompts (the wrapper's prompt encoding: resized initial mask
    * 20 - 10 at stride 4) and GT targets at the HQ output stride."""
    import cv2
    import numpy as np

    from quber_tpu.data.perturb import mask_iou, modify_boundary
    from quber_tpu.data.synthetic import render_scene
    from quber_tpu.models.sam_refiner import SAM_PIXEL_MEAN, SAM_PIXEL_STD

    s, q = img_size, img_size // 4
    rng = np.random.RandomState(seed)
    out = {k: [] for k in ("img", "prompt", "tgt", "valid")}
    for _ in range(n):
        rgb, _depth, vis = render_scene(rng, h, w, depth_range=depth_range)
        img = cv2.resize(rgb[..., ::-1].astype(np.float32), (s, s))
        out["img"].append((img - SAM_PIXEL_MEAN) / SAM_PIXEL_STD)
        prompts = np.zeros((slots, q, q), np.float32)
        tgts = np.zeros((slots, q, q), np.float32)
        valid = np.zeros((slots,), bool)
        objs = [m.astype(np.uint8) for m in vis if m.sum() >= 64]
        rng.shuffle(objs)
        for i, m in enumerate(objs[:slots]):
            pert = modify_boundary(m, rng, (0.6, 0.95))
            if not pert.any() or mask_iou(pert, m) < 0.3:
                pert = m
            prompts[i] = cv2.resize(pert.astype(np.float32), (q, q)) * 20.0 - 10.0
            tgts[i] = cv2.resize(m.astype(np.float32), (q, q))
            valid[i] = True
        out["prompt"].append(prompts)
        out["tgt"].append(tgts)
        out["valid"].append(valid)
    return {k: np.stack(v).astype(np.float32) if k != "valid"
            else np.stack(v) for k, v in out.items()}


def train_samhq(args):
    """HQ-SAM refiner recipe: focal+dice on the HQ-token mask under mask
    prompts (sam-hq/train/train.py MaskDecoderHQ objective,
    utils/loss_mask.py recipe) — from scratch at a reduced SAMHQ_SYNTH_ARCH
    scale (no pretrained ViT exists in this zero-egress environment; the
    reference fine-tunes a released ViT-H). Writes arch.json beside the
    checkpoint so the eval wrapper rebuilds the same architecture
    (QUBER_SAMHQ_CKPT)."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.sam_hq import SAMHQ, sam_hq_mask_loss
    from quber_tpu.train.checkpoint import save_params

    arch = SAMHQ_SYNTH_ARCH
    s = arch["img_size"]
    pool = _stage(make_samhq_scenes(args.size, args.height, args.width,
                                    args.seed, tuple(args.depth_range), s))
    model = SAMHQ(**arch)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, s, s, 3)),
        jnp.zeros((1, s // 4, s // 4, 1)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables)

    @jax.jit
    def jstep(variables, opt_state, pool, idx):
        img = pool["img"][idx][None]

        def loss_fn(v):
            embed, interm = model.apply(v, img, method=SAMHQ.encode)

            def one(prompt, tgt, ok):
                masks, _iou, _all = model.apply(
                    v, embed, interm, prompt[None, ..., None], False, True,
                    method=SAMHQ.decode)
                # focal+dice scalar per prompt, masked by slot validity
                return sam_hq_mask_loss(masks[:, 0], tgt[None]) * ok

            per = jax.vmap(one)(pool["prompt"][idx], pool["tgt"][idx],
                                pool["valid"][idx].astype(jnp.float32))
            loss = per.sum() / jnp.maximum(pool["valid"][idx].sum(), 1)
            return loss, {"focal_dice": loss}

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state2 = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state2, loss, parts

    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt"))
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "arch.json"), "w") as f:
        _json.dump(arch, f)
    state = {"v": variables, "opt": opt_state}

    def step(it, idx):
        state["v"], state["opt"], loss, parts = jstep(
            state["v"], state["opt"], pool, idx)
        return loss, parts

    _fit_loop(step, args.size, args,
              lambda it: save_params(ckpt_dir, state["v"], step=it))


# 60-degree hue buckets in spectral order (+30 offset centers red at 0)
COLOR_VOCAB = ["red object", "yellow object", "green object", "cyan object",
               "blue object", "magenta object", "gray object"]


def _color_class(rgb_mean):
    """Dominant-hue class id for COLOR_VOCAB from a mean RGB albedo.

    The synthetic renderer has no semantic categories; color is the one
    text-describable attribute every object carries, which makes the
    open-vocabulary objective real: the detector can only classify a ROI
    by agreeing with the right text embedding."""
    import colorsys

    r, g, b = (float(x) / 255.0 for x in rgb_mean)
    h, s, v = colorsys.rgb_to_hsv(r, g, b)
    if s < 0.12:
        return 6  # gray
    return int(((h * 360 + 30) % 360) // 60)  # 60-degree hue buckets


def make_detic_scenes(n, h, w, seed, depth_range, slots=SLOTS):
    """Detic pool: raw BGR frames (the wrapper feeds cv2.imread output
    untouched, open_vocab.DeticBaseModel.predict) + per-object boxes,
    color-class labels, masks."""
    import numpy as np

    from quber_tpu.data.synthetic import render_scene

    rng = np.random.RandomState(seed)
    out = {k: [] for k in ("bgr", "boxes", "classes", "masks", "valid")}
    for _ in range(n):
        rgb, _depth, vis = render_scene(rng, h, w, depth_range=depth_range)
        boxes = np.zeros((slots, 4), np.float32)
        classes = np.zeros((slots,), np.int32)
        masks = np.zeros((slots, h, w), np.float32)
        valid = np.zeros((slots,), bool)
        for i, m in enumerate(vis[:slots]):
            m = m > 0
            if m.sum() < 64:
                continue
            ys, xs = np.where(m)
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
            classes[i] = _color_class(rgb[m].mean(axis=0))
            masks[i] = m
            valid[i] = True
        out["bgr"].append(rgb[..., ::-1].astype(np.float32))
        out["boxes"].append(boxes)
        out["classes"].append(classes)
        out["masks"].append(masks)
        out["valid"].append(valid)
    import numpy as _np

    return {k: _np.stack(v) for k, v in out.items()}


def _fit_detector_with_text(args, vocabulary, detector, pool, extra_out=None,
                            extra_step=None, detector_key="detector"):
    """Shared detic/grounder driver: jointly trains the hash-vocabulary
    text tower and the open-vocab detector with detic_losses. `extra_step`
    (it -> dict) runs once per iteration for co-trained legs (the gsam SAM
    branch) and its parts merge into the logged losses; `extra_out`
    () -> dict merges extra trees into the saved checkpoint."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.open_vocab import detic_losses, make_text_tower
    from quber_tpu.train.checkpoint import save_params

    _enc, init_text, apply_text = make_text_tower(vocabulary)
    key = jax.random.PRNGKey(args.seed)
    tp = init_text(key)
    dp = jax.jit(detector.init)(
        key, jnp.zeros((1, args.height, args.width, 3)), apply_text(tp),
        jnp.zeros((SLOTS, 4)))
    params = {"text": tp, "detector": dp}
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def jstep(params, opt_state, pool, idx):
        def loss_fn(p):
            embeds = apply_text(p["text"])
            out = detector.apply(
                p["detector"], pool["bgr"][idx][None], embeds,
                gt_proposals=jnp.where(pool["valid"][idx][:, None],
                                       pool["boxes"][idx], 0.0))
            losses = detic_losses(out, pool["boxes"][idx],
                                  pool["classes"][idx], pool["masks"][idx],
                                  pool["valid"][idx])
            return sum(losses.values()), losses

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, parts

    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt"))
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "vocab.json"), "w") as f:
        _json.dump(vocabulary, f)
    state = {"p": params, "opt": opt_state}

    def step(it, idx):
        state["p"], state["opt"], loss, parts = jstep(
            state["p"], state["opt"], pool, idx)
        if extra_step is not None:
            parts = dict(parts)
            parts.update(extra_step(it))
        return loss, parts

    def save(it):
        tree = {"text": state["p"]["text"],
                detector_key: state["p"]["detector"]}
        if extra_out:
            tree.update(extra_out())
        save_params(ckpt_dir, tree, step=it)

    _fit_loop(step, args.size, args, save)
    return state


def train_detic(args):
    """Detic-class open-vocabulary recipe: the ROI classifier is a dot
    product against text embeddings of a color vocabulary (COLOR_VOCAB) —
    the text tower and detector train jointly, so classification only
    works if vision and language embeddings co-align (Detic's
    open-vocabulary head, reference wrapper base_model.py:108-172).
    Checkpoint + vocab.json load at eval via QUBER_DETIC_CKPT."""
    import jax.numpy as jnp

    from quber_tpu.models.open_vocab import DeticDetector

    pool = _stage(make_detic_scenes(args.size, args.height, args.width,
                                    args.seed, tuple(args.depth_range)))
    _fit_detector_with_text(args, COLOR_VOCAB,
                            DeticDetector(dtype=jnp.bfloat16), pool)


def train_gsam(args):
    """GroundedSAM-class recipe, two jointly-saved parts: a class-agnostic
    grounder (the same open-vocab detector with the single phrase the
    reference prompts, "A rigid object.", base_model.py:338) and a
    box-prompted SAM trained with focal+dice on decode_box outputs. One
    checkpoint tree {text, grounder, sam} + arch.json; loads at eval via
    QUBER_GSAM_CKPT."""
    import json as _json

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.open_vocab import DeticDetector
    from quber_tpu.models.sam_hq import SAMHQ, init_sam_variables, sam_hq_mask_loss
    from quber_tpu.models.sam_refiner import SAM_PIXEL_MEAN, SAM_PIXEL_STD

    pool = _stage(make_detic_scenes(args.size, args.height, args.width,
                                    args.seed, tuple(args.depth_range)))
    arch = SAMHQ_SYNTH_ARCH
    s = arch["img_size"]

    # SAM leg: SAM-normalized square frames + GT boxes in the SAM frame
    import cv2

    np_pool = {"img": [], "boxes": [], "tgt": [], "valid": []}
    bgr = np.asarray(pool["bgr"])
    boxes = np.asarray(pool["boxes"])
    masks = np.asarray(pool["masks"])
    valid = np.asarray(pool["valid"])
    sx, sy = s / args.width, s / args.height
    q = s // 4
    for i in range(bgr.shape[0]):
        img = cv2.resize(bgr[i][..., ::-1], (s, s))
        np_pool["img"].append((img - SAM_PIXEL_MEAN) / SAM_PIXEL_STD)
        np_pool["boxes"].append(boxes[i] * np.asarray([sx, sy, sx, sy],
                                                      np.float32))
        np_pool["tgt"].append(np.stack([
            cv2.resize(m, (q, q)) for m in masks[i]]))
        np_pool["valid"].append(valid[i])
    sam_pool = _stage({k: np.stack(v).astype(np.float32) if k != "valid"
                       else np.stack(v) for k, v in np_pool.items()})

    sam = SAMHQ(**arch)
    sam_vars = init_sam_variables(sam, jax.random.PRNGKey(args.seed + 3))
    sam_tx = optax.adam(args.lr)
    sam_opt = sam_tx.init(sam_vars)
    sam_state = {"v": sam_vars, "opt": sam_opt}

    @jax.jit
    def sam_step(variables, opt_state, sam_pool, idx):
        img = sam_pool["img"][idx][None]

        def loss_fn(v):
            embed, interm = sam.apply(v, img, method=SAMHQ.encode)

            def one(box, tgt, ok):
                m_out, _iou, _all = sam.apply(
                    v, embed, interm, box[None], False, True,
                    method=SAMHQ.decode_box)
                return sam_hq_mask_loss(m_out[:, 0], tgt[None]) * ok

            per = jax.vmap(one)(sam_pool["boxes"][idx], sam_pool["tgt"][idx],
                                sam_pool["valid"][idx].astype(jnp.float32))
            loss = per.sum() / jnp.maximum(sam_pool["valid"][idx].sum(), 1)
            return loss, {"focal_dice": loss}

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state2 = sam_tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state2, loss, parts

    # interleave: one SAM step per grounder iteration, so --max-iter bounds
    # both legs and the saved tree carries both
    import numpy as _np

    rng = _np.random.default_rng(args.seed + 7)

    def sam_extra(it):
        j = int(rng.integers(0, args.size))
        sam_state["v"], sam_state["opt"], sl, _parts = sam_step(
            sam_state["v"], sam_state["opt"], sam_pool, j)
        return {"sam_total": sl}

    _fit_detector_with_text(
        args, ["A rigid object."], DeticDetector(dtype=jnp.bfloat16), pool,
        extra_out=lambda: {"sam": sam_state["v"]}, extra_step=sam_extra,
        detector_key="grounder")
    with open(os.path.join(args.output_dir, "arch.json"), "w") as f:
        _json.dump(arch, f)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model",
                        choices=["uoaisnet", "uoisnet3d", "ucn", "msmformer",
                                 "rice", "cascadepsp", "samhq", "detic", "gsam"],
                        default="uoaisnet")
    parser.add_argument("--size", type=int, default=192,
                        help="number of pre-rendered scenes")
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--depth-range", type=float, nargs=2, default=(250, 1500))
    parser.add_argument("--max-iter", type=int, default=3000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--log-period", type=int, default=50)
    parser.add_argument("--checkpoint-period", type=int, default=500)
    parser.add_argument("--output-dir", default="")
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--gms-sigma", type=float, default=0.02,
                        help="uoisnet3d: GBMS kernel bandwidth (uois config)")
    parser.add_argument("--gms-delta", type=float, default=0.1,
                        help="uoisnet3d: cluster-loss push margin")
    parser.add_argument("--cpu", action="store_true",
                        help="pin JAX to CPU (tiny smoke runs; leaves an "
                             "attached TPU untouched)")
    args = parser.parse_args()
    if not args.output_dir:
        args.output_dir = f"output/{args.model}_synth"

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from quber_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()

    if args.model != "uoaisnet":
        print(f"rendering {args.size} scenes ...", flush=True)
        {"uoisnet3d": train_uoisnet3d, "ucn": train_ucn, "rice": train_rice,
         "msmformer": train_msmformer, "cascadepsp": train_cascadepsp,
         "samhq": train_samhq, "detic": train_detic,
         "gsam": train_gsam}[args.model](args)
        return

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from quber_tpu.models.uoais_net import UOAISNet, uoais_losses
    from quber_tpu.train.checkpoint import save_params

    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt"))
    os.makedirs(ckpt_dir, exist_ok=True)

    print(f"rendering {args.size} scenes ...", flush=True)
    scenes = make_scenes(args.size, args.height, args.width, args.seed,
                         tuple(args.depth_range))

    # FrozenBN (the eval wrapper's default) keeps the param tree identical to
    # UOAISNetBaseModel's; at random init it is the identity transform, which
    # is the right from-scratch behavior (the reference fine-tunes from
    # ImageNet weights with BN frozen the same way).
    model = UOAISNet()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.height, args.width, 3)),
        jnp.zeros((1, args.height, args.width, 3)),
    )
    tx = optax.adam(args.lr)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rgb, depth, boxes, vis, amo, valid):
        def loss_fn(p):
            # GT boxes spliced into the proposals + detections
            # (add_ground_truth_to_proposals) so ROI/mask heads train from
            # step one
            out = model.apply({"params": p}, rgb[None], depth[None],
                              gt_proposals=jnp.where(valid[:, None], boxes, 0.0))
            losses = uoais_losses(out, boxes, vis, amo, valid)
            return sum(losses.values()), losses

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, parts

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(scenes))
    cursor = 0
    t0 = time.time()
    for it in range(1, args.max_iter + 1):
        if cursor >= len(order):
            order = rng.permutation(len(scenes))
            cursor = 0
        s = scenes[order[cursor]]
        cursor += 1
        params, opt_state, loss, parts = step(
            params, opt_state,
            jnp.asarray(s["rgb"]), jnp.asarray(s["depth"]),
            jnp.asarray(s["boxes"]), jnp.asarray(s["vis"]),
            jnp.asarray(s["amo"]), jnp.asarray(s["valid"]),
        )
        if it % args.log_period == 0 or it == args.max_iter:
            detail = " ".join(
                f"{k}={float(v):.4f}" for k, v in sorted(parts.items())
            )
            print(f"iter {it}/{args.max_iter} total={float(loss):.4f} {detail} "
                  f"({it / (time.time() - t0):.2f} it/s)", flush=True)
        if it % args.checkpoint_period == 0 or it == args.max_iter:
            save_params(ckpt_dir, {"params": params}, step=it)
            print(f"checkpoint saved at {it}", flush=True)


if __name__ == "__main__":
    main()
