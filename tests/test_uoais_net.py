"""UOAIS-Net component tests (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from quber_tpu.models.uoais_net import CBAM, RGBDFPN, UOAISNet, paste_masks


def test_cbam_shapes(rng):
    m = CBAM()
    x = jnp.asarray(rng.rand(1, 8, 8, 64).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape


def test_rgbd_fpn_levels(rng):
    m = RGBDFPN(norm="GN")
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    dep = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), rgb, dep)
    out = m.apply(v, rgb, dep)
    assert out["p2"].shape == (1, 16, 16, 256)
    assert out["p3"].shape == (1, 8, 8, 256)
    assert out["p5"].shape == (1, 2, 2, 256)  # standard R50: res5 stride 32
    assert out["p6"].shape == (1, 1, 1, 256)  # LastLevelMaxPool


def test_uoais_net_forward(rng):
    m = UOAISNet(max_proposals=16, max_detections=4, norm="GN")
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    dep = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), rgb, dep)
    out = m.apply(v, rgb, dep)
    assert out["boxes"].shape == (4, 4)
    assert out["visible_masks"].shape == (4, 28, 28)
    assert out["amodal_masks"].shape == (4, 28, 28)
    assert out["occlusion"].shape == (4, 2)  # 2-class occ classifier
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_paste_masks():
    # a full-on 28x28 mask pasted into a known box covers exactly that box
    logits = np.full((1, 28, 28), 10.0, np.float32)
    boxes = np.asarray([[8.0, 4.0, 24.0, 20.0]], np.float32)
    valid = np.asarray([True])
    out = np.asarray(paste_masks(jnp.asarray(logits), jnp.asarray(boxes),
                                 jnp.asarray(valid), 32, 32))
    assert out.shape == (1, 32, 32)
    assert out[0, 12, 16]  # inside
    assert not out[0, 2, 2]  # outside
    ys, xs = np.nonzero(out[0])
    assert ys.min() == 4 and ys.max() == 19
    assert xs.min() == 8 and xs.max() == 23
    # invalid detection pastes nothing
    out2 = np.asarray(paste_masks(jnp.asarray(logits), jnp.asarray(boxes),
                                  jnp.asarray([False]), 32, 32))
    assert not out2.any()


def test_uoais_losses(rng):
    from quber_tpu.models.uoais_net import UOAISNet, uoais_losses

    m = UOAISNet(max_proposals=16, max_detections=4, norm="GN")
    rgb = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    dep = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), rgb, dep)
    out = m.apply(v, rgb, dep)

    n = 3
    gt_boxes = jnp.asarray([[8, 8, 30, 30], [35, 12, 60, 40], [0, 0, 0, 0]], jnp.float32)
    gt_vis = np.zeros((n, 64, 64), np.float32)
    gt_vis[0, 8:30, 8:30] = 1
    gt_vis[1, 12:40, 35:60] = 1
    gt_amo = gt_vis.copy()
    gt_amo[0, 8:34, 8:34] = 1  # instance 0 occluded (amodal larger)
    gt_valid = jnp.asarray([True, True, False])

    losses = uoais_losses(out, gt_boxes, jnp.asarray(gt_vis), jnp.asarray(gt_amo), gt_valid)
    assert set(losses) == {"loss_rpn_objectness", "loss_rpn_box", "loss_cls",
                           "loss_box", "loss_visible_mask", "loss_amodal_mask",
                           "loss_occlusion"}
    for k, val in losses.items():
        assert np.isfinite(float(val)), k
    # losses are differentiable end-to-end
    def total(params):
        o = m.apply(params, rgb, dep)
        return sum(uoais_losses(o, gt_boxes, jnp.asarray(gt_vis),
                                jnp.asarray(gt_amo), gt_valid).values())
    g = jax.grad(lambda p: total(p))(v)
    gnorm = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)))
    assert np.isfinite(gnorm) and gnorm > 0
