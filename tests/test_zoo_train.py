"""Zoo training recipes: every zoo member's loss must decrease when
overfitting one tiny synthetic batch (the reference trains each of these —
UOAIS-Net via adet rcnn losses, UCN via metric learning, MSMFormer via the
Mask2Former criterion, SAM-HQ via focal+dice fine-tuning)."""

import numpy as np
import optax

import jax
import jax.numpy as jnp


def _fit(loss_fn, params, steps=6, lr=1e-3):
    tx = optax.adam(lr)
    opt = tx.init(params)
    first = None
    val = None

    @jax.jit
    def step(params, opt):
        val, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, val

    for _ in range(steps):
        params, opt, val = step(params, opt)
        if first is None:
            first = float(val)
    return first, float(val)


def test_uoais_net_learns(rng):
    from quber_tpu.models.uoais_net import UOAISNet, uoais_losses

    m = UOAISNet(max_proposals=16, max_detections=4, norm="GN")
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    dep = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), rgb, dep)

    gt_boxes = jnp.asarray([[8, 8, 30, 30], [35, 12, 60, 40], [0, 0, 0, 0]],
                           jnp.float32)
    gt_vis = np.zeros((3, 64, 64), np.float32)
    gt_vis[0, 8:30, 8:30] = 1
    gt_vis[1, 12:40, 35:60] = 1
    gt_amo = gt_vis.copy()
    gt_amo[0, 8:34, 8:34] = 1
    gt_valid = jnp.asarray([True, True, False])
    gt_vis, gt_amo = jnp.asarray(gt_vis), jnp.asarray(gt_amo)

    def loss_fn(params):
        # GT proposals so every loss head contributes to the descent signal
        out = m.apply(params, rgb, dep, gt_proposals=gt_boxes)
        return sum(uoais_losses(out, gt_boxes, gt_vis, gt_amo, gt_valid).values())

    first, last = _fit(loss_fn, v, steps=12, lr=3e-4)
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_uoais_net_gt_proposals_engage_mask_losses(rng):
    """add_ground_truth_to_proposals (detectron2 ROIHeads semantics): with GT
    boxes spliced into the proposals, the ROI/mask losses are non-zero from
    step one at RANDOM weights — the from-scratch bootstrap that a pure
    RPN-proposal pipeline deadlocks on (proposals never cross the positive
    IoU threshold, so mask heads never train)."""
    from quber_tpu.models.uoais_net import UOAISNet, uoais_losses

    m = UOAISNet(max_proposals=16, max_detections=4, norm="GN")
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    dep = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), rgb, dep)

    gt_boxes = jnp.asarray([[8, 8, 30, 30], [35, 12, 60, 40], [0, 0, 0, 0]],
                           jnp.float32)
    gt_vis = np.zeros((3, 64, 64), np.float32)
    gt_vis[0, 8:30, 8:30] = 1
    gt_vis[1, 12:40, 35:60] = 1
    gt_valid = jnp.asarray([True, True, False])
    gt_vis = jnp.asarray(gt_vis)

    out = m.apply(v, rgb, dep, gt_proposals=gt_boxes)
    losses = uoais_losses(out, gt_boxes, gt_vis, gt_vis, gt_valid)
    # every positive-gated loss fires immediately
    assert float(losses["loss_visible_mask"]) > 0
    assert float(losses["loss_amodal_mask"]) > 0
    assert float(losses["loss_box"]) >= 0
    # the GT slots are valid proposals with IoU 1 to their GT
    from quber_tpu.ops import boxes as box_ops

    piou = np.asarray(box_ops.box_iou(out["proposal_boxes"], gt_boxes))
    assert piou.max() > 0.99
    # inference signature unchanged: no gt_proposals -> same output tree
    out2 = m.apply(v, rgb, dep)
    assert out2["proposal_boxes"].shape == out["proposal_boxes"].shape


def test_ucn_learns(rng):
    from quber_tpu.models.ucn import UCNEmbeddingNet, prototype_metric_loss

    m = UCNEmbeddingNet(embed_dim=8, train=False)
    rgb = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), rgb, xyz)
    labels = np.zeros((1, 32, 32), np.int32)
    labels[0, :, 16:] = 1
    labels[0, :12, :10] = 2
    labels = jnp.asarray(labels)

    def loss_fn(params):
        emb = m.apply(params, rgb, xyz)
        loss, _ = prototype_metric_loss(emb, labels, max_instances=4)
        return loss

    first, last = _fit(loss_fn, v, steps=6, lr=1e-3)
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_msmformer_learns(rng):
    from quber_tpu.models.msmformer import MSMFormer, msmformer_set_loss

    m = MSMFormer(dim=32, num_queries=8, encoder_layers=1, decoder_layers=1)
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), rgb, xyz)

    gt = np.zeros((1, 2, 16, 16), np.float32)  # mask-logit resolution H/4
    gt[0, 0, 2:8, 2:8] = 1
    gt[0, 1, 9:15, 9:15] = 1
    gt = jnp.asarray(gt)
    valid = jnp.asarray([[True, True]])

    def loss_fn(params):
        out = m.apply(params, rgb, xyz)
        return sum(msmformer_set_loss(out, gt, valid).values())

    first, last = _fit(loss_fn, v, steps=6, lr=1e-3)
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_rice_scorer_learns(rng):
    """The RICE NodeScorer learns to rank well-aligned mask crops above
    mis-aligned ones under the SGS-Net-style objective."""
    from quber_tpu.models.rice import NodeScorer, node_scorer_loss

    m = NodeScorer()
    # "good" crops: mask channel agrees with a bright blob in the rgb
    # channels; "bad" crops: mask shifted off the blob
    base = np.zeros((4, 64, 64, 6), np.float32)
    base[:, 16:48, 16:48, :3] = 1.0   # object pixels in rgb
    good = base.copy()
    good[:, 16:48, 16:48, 4] = 1.0    # aligned mask channel
    bad = base.copy()
    bad[:, 40:64, 40:64, 4] = 1.0     # misaligned mask channel
    good, bad = jnp.asarray(good), jnp.asarray(bad)
    valid = jnp.ones((4,), bool)
    v = m.init(jax.random.PRNGKey(0), good)

    def loss_fn(params):
        losses = node_scorer_loss(m.apply(params, good), valid,
                                  m.apply(params, bad), valid)
        return sum(losses.values())

    first, last = _fit(loss_fn, v, steps=8, lr=1e-3)
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_uois_dsn_learns(rng):
    """UOIS-Net-3D DSN overfits one frame under the full reference objective
    (fg CE + offset smooth-L1 + separation + cluster,
    uois/src/train.py:204-254)."""
    from quber_tpu.models.uois_net import DepthSeedingNetwork, dsn_train_losses

    m = DepthSeedingNetwork()
    h, w = 32, 32
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    xyz = np.stack([xs / w, ys / h, np.ones_like(xs)], axis=-1)
    labels = np.zeros((h, w), np.int32)
    labels[4:16, 4:16] = 1   # object 0 (native 2-class DSN: object_label=1)
    labels[18:30, 18:30] = 2  # object 1
    centers = np.zeros((4, 3), np.float32)
    centers[0] = xyz[4:16, 4:16].reshape(-1, 3).mean(0)
    centers[1] = xyz[18:30, 18:30].reshape(-1, 3).mean(0)
    valid = jnp.asarray([True, True, False, False])
    off_t = np.zeros((h, w, 3), np.float32)
    off_t[labels == 1] = centers[0] - xyz[labels == 1]
    off_t[labels == 2] = centers[1] - xyz[labels == 2]

    xyz_j = jnp.asarray(xyz)
    v = m.init(jax.random.PRNGKey(0), xyz_j[None])
    key = jax.random.PRNGKey(7)

    def loss_fn(params):
        fg_logits, offsets = m.apply(params, xyz_j[None])
        losses = dsn_train_losses(
            fg_logits[0], offsets[0], xyz_j, jnp.asarray(off_t),
            jnp.asarray(labels), jnp.asarray(centers), valid, key,
            object_label=1, sigma=0.05, delta=0.2)
        return sum(losses.values())

    first, last = _fit(loss_fn, v, steps=8, lr=1e-3)
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_uois_rrn_learns(rng):
    """UOIS-Net-3D RRN overfits one frame under the weighted-BCE objective
    (uois/src/train.py:306-330)."""
    from quber_tpu.models.uois_net import RegionRefinementNetwork, rrn_loss

    m = RegionRefinementNetwork()
    x = jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    target = np.zeros((1, 32, 32), np.float32)
    target[0, 8:24, 8:24] = 1
    target = jnp.asarray(target)

    def loss_fn(params):
        logits = m.apply(params, x)[..., 0]
        return rrn_loss(logits, target)

    first, last = _fit(loss_fn, v, steps=6, lr=1e-3)
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_sam_hq_learns(rng):
    from quber_tpu.models.sam_hq import SAMHQ, sam_hq_mask_loss

    m = SAMHQ(img_size=64, embed_dim=32, depth=2, num_heads=2,
              global_blocks=(1,), window_size=2)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    prompt = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), img, prompt)
    target = np.zeros((1, 16, 16), np.float32)
    target[0, 4:12, 4:12] = 1
    target = jnp.asarray(target)

    def loss_fn(params):
        masks, iou, _ = m.apply(params, img, prompt)
        return sam_hq_mask_loss(masks[:, 0], target)

    first, last = _fit(loss_fn, v, steps=6, lr=1e-3)
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_cascadepsp_refine_loss_learns(rng):
    from quber_tpu.models.cascadepsp import PSPNetUOAIS, cascadepsp_refine_loss

    m = PSPNetUOAIS()
    g = 32
    rgb = jnp.asarray(rng.rand(1, g, g, 3).astype(np.float32))
    dep = jnp.asarray(rng.rand(1, g, g, 1).astype(np.float32))
    seg = jnp.asarray((rng.rand(1, g, g, 1) > 0.5).astype(np.float32) * 2 - 1)
    target = np.zeros((1, g, g), np.float32)
    target[0, 8:24, 8:24] = 1
    target = jnp.asarray(target)
    v = m.init(jax.random.PRNGKey(0), rgb, dep, seg)

    def loss_fn(params):
        images = m.apply(params, rgb, dep, seg)
        return sum(cascadepsp_refine_loss(images, target).values())

    first, last = _fit(loss_fn, v, steps=6, lr=1e-3)
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_zoo_refiner_crop_pools():
    """The CascadePSP / SAM-HQ trainer pools carry the exact channel
    encodings their eval wrappers feed (tools/train_zoo.py make_refine_crops
    / make_samhq_scenes)."""
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from train_zoo import SAMHQ_SYNTH_ARCH, make_refine_crops, make_samhq_scenes

    pool = make_refine_crops(6, 120, 160, seed=3, depth_range=(250, 1500),
                             crop=64)
    assert pool["rgbd"].shape == (6, 64, 64, 4)
    assert pool["seg"].shape == (6, 64, 64)
    assert pool["tgt"].shape == (6, 64, 64)
    # seg is a perturbation OF the target: overlapping but not identical
    inter = ((pool["seg"] > 0.5) & (pool["tgt"] > 0.5)).sum()
    assert inter > 0
    assert (pool["tgt"] > 0.5).any(axis=(1, 2)).all()
    # depth channel in [0,1] (normalize_depth/255); rgb ImageNet-standardized
    assert 0.0 <= pool["rgbd"][..., 3].min() and pool["rgbd"][..., 3].max() <= 1.0

    s = 64
    sp = make_samhq_scenes(3, 120, 160, seed=3, depth_range=(250, 1500),
                           img_size=s)
    assert sp["img"].shape == (3, s, s, 3)
    assert sp["prompt"].shape == (3, 4, s // 4, s // 4)
    assert sp["tgt"].shape == (3, 4, s // 4, s // 4)
    assert sp["valid"].any()
    # the wrapper's prompt encoding: mask * 20 - 10
    assert set(np.round(np.unique(sp["prompt"])).tolist()) <= set(
        np.round(np.arange(-10, 10.5, 0.5)).tolist())
    assert SAMHQ_SYNTH_ARCH["img_size"] % 4 == 0


def test_detic_learns_with_text_tower(rng):
    """The open-vocab objective descends through BOTH towers: detector and
    text encoder gradients are nonzero (the classifier is a dot product
    against text embeddings, detic_losses loss_cls)."""
    from quber_tpu.models.open_vocab import (
        DeticDetector,
        TextEncoder,
        detic_losses,
        hash_tokenize,
    )

    texts = ["red object", "green object"]
    ids, mask = hash_tokenize(texts)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    enc = TextEncoder()
    tp = enc.init(jax.random.PRNGKey(0), ids, mask)
    det = DeticDetector(max_proposals=32, max_detections=4,
                        pre_nms_topk_per_level=16, norm="GN")
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)

    gt_boxes = jnp.asarray([[8, 8, 30, 30], [35, 12, 60, 40]], jnp.float32)
    gt_classes = jnp.asarray([0, 1], jnp.int32)
    gt_masks = np.zeros((2, 64, 64), np.float32)
    gt_masks[0, 8:30, 8:30] = 1
    gt_masks[1, 12:40, 35:60] = 1
    gt_masks = jnp.asarray(gt_masks)
    gt_valid = jnp.asarray([True, True])

    dp = det.init(jax.random.PRNGKey(1), rgb, enc.apply(tp, ids, mask),
                  gt_boxes)
    params = {"text": tp, "detector": dp}

    def loss_fn(p):
        embeds = enc.apply(p["text"], ids, mask)
        out = det.apply(p["detector"], rgb, embeds, gt_proposals=gt_boxes)
        return sum(detic_losses(out, gt_boxes, gt_classes, gt_masks,
                                gt_valid).values())

    grads = jax.grad(loss_fn)(params)
    gtext = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["text"]))
    gdet = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["detector"]))
    assert gtext > 0 and gdet > 0, (gtext, gdet)

    # exp(logit_scale)=100 makes the cls head's logits steep; small lr
    first, last = _fit(loss_fn, params, steps=10, lr=1e-4)
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_detic_scene_pool_color_classes():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from train_zoo import COLOR_VOCAB, _color_class, make_detic_scenes

    assert _color_class((220, 30, 30)) == 0     # red
    assert _color_class((30, 220, 30)) == 2     # green
    assert _color_class((40, 40, 230)) == 4     # blue
    assert _color_class((128, 128, 128)) == 6   # gray
    pool = make_detic_scenes(3, 96, 128, seed=2, depth_range=(250, 1500))
    assert pool["bgr"].shape == (3, 96, 128, 3)
    assert pool["valid"].any()
    cls = pool["classes"][pool["valid"]]
    assert ((0 <= cls) & (cls < len(COLOR_VOCAB))).all()
    # boxes enclose their masks
    for i in range(3):
        for j in range(pool["valid"].shape[1]):
            if not pool["valid"][i, j]:
                continue
            ys, xs = np.where(pool["masks"][i, j] > 0)
            x0, y0, x1, y1 = pool["boxes"][i, j]
            assert x0 <= xs.min() and xs.max() < x1
            assert y0 <= ys.min() and ys.max() < y1
