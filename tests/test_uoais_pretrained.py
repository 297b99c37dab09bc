"""UOAIS-Net pretrained-variant importer oracle.

The reference module tree needs detectron2 (absent from this image), so the
oracle is a torch RE-DERIVATION with the exact state-dict key layout of
ext_modules/uoais R50_rgbdconcat_mlc_occatmask_hom_concat checkpoints
(GeneralizedRCNN + RGBD_FPN late fusion + ORCNNROIHeads; see
quber_tpu/models/uoais_net_pretrained.py docstring for the file:line map).
The test randomizes the torch weights, imports them with
import_zoo.import_uoais_net, and requires the flax model's intermediate and
head outputs to match the torch forward on the same input, bypassing the
(separately unit-tested) NMS/top-k plumbing via debug_boxes.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from quber_tpu.models import import_zoo as IZ

pytestmark = pytest.mark.slow

C2, C3, C4, C5 = 256, 512, 1024, 2048


def d2conv(cin, cout, k, s=1, bias=False, norm=True):
    """detectron2 Conv2d key layout: .weight/.bias + .norm.* submodule."""
    c = tnn.Conv2d(cin, cout, k, s, padding=(k - 1) // 2, bias=bias)
    if norm:
        c.norm = tnn.BatchNorm2d(cout)
    return c


def cn(m, x, act=True):
    x = m(x)
    for sub in m.children():  # the fused .norm, if present
        x = sub(x)
    return tF.relu(x) if act else x


def bottleneck(cin, cmid, cout, stride):
    b = tnn.Module()
    b.conv1 = d2conv(cin, cmid, 1, stride)  # stride_in_1x1 (caffe R50)
    b.conv2 = d2conv(cmid, cmid, 3)
    b.conv3 = d2conv(cmid, cout, 1)
    if cin != cout:
        b.shortcut = d2conv(cin, cout, 1, stride)
    return b


def block_fwd(b, x):
    out = cn(b.conv1, x)
    out = cn(b.conv2, out)
    out = cn(b.conv3, out, act=False)
    sc = cn(b.shortcut, x, act=False) if hasattr(b, "shortcut") else x
    return tF.relu(out + sc)


def r50_trunk(stage_prefix="res"):
    tr = tnn.Module()
    stem = tnn.Module()
    stem.conv1 = d2conv(3, 64, 7, 2)
    tr.stem = stem
    cins, cmids, couts = (64, C2, C3, C4), (64, 128, 256, 512), (C2, C3, C4, C5)
    for s, n in zip(range(2, 6), (3, 4, 6, 3)):
        blocks = []
        for blk in range(n):
            stride = 2 if (blk == 0 and s > 2) else 1
            cin = cins[s - 2] if blk == 0 else couts[s - 2]
            blocks.append(bottleneck(cin, cmids[s - 2], couts[s - 2], stride))
        setattr(tr, f"{stage_prefix}{s}", tnn.Sequential(*blocks))
    return tr


def trunk_fwd(tr, x, stage_prefix="res"):
    x = cn(tr.stem.conv1, x)
    x = tF.max_pool2d(x, 3, 2, 1)
    outs = {}
    for s in range(2, 6):
        for b in getattr(tr, f"{stage_prefix}{s}"):
            x = block_fwd(b, x)
        outs[s] = x
    return outs


def conv_relu(cin, cout, k=3, s=1):
    return tnn.Conv2d(cin, cout, k, s, padding=(k - 1) // 2)


def hom_mask_head(prefix, n_guidance, c=256):
    h = tnn.Module()
    g = n_guidance * c
    for i, (ci, co) in enumerate(((g, g), (g, g), (g, c))):
        setattr(h, f"{prefix}_guidance_layer{i}", conv_relu(ci, co))
    for k in range(1, 5):
        setattr(h, f"{prefix}_mask_fcn{k}", conv_relu(c, c))
    for i, (ci, co) in enumerate(((2 * c, 2 * c), (2 * c, 2 * c), (2 * c, c))):
        setattr(h, f"{prefix}_mlc_layer{i}", conv_relu(ci, co))
    h.deconv = tnn.ConvTranspose2d(c, c, 2, 2)
    h.predictor = tnn.Conv2d(c, 1, 1)
    return h


def hom_mask_fwd(h, prefix, x, mlc):
    for i in range(3):
        x = tF.relu(getattr(h, f"{prefix}_guidance_layer{i}")(x))
    x = tF.relu(getattr(h, f"{prefix}_mask_fcn1")(x))
    x = torch.cat([x, mlc], 1)
    for i in range(3):
        x = tF.relu(getattr(h, f"{prefix}_mlc_layer{i}")(x))
    for k in (2, 3, 4):
        x = tF.relu(getattr(h, f"{prefix}_mask_fcn{k}")(x))
    return h.predictor(tF.relu(h.deconv(x))), x


def occ_head(c=256):
    h = tnn.Module()
    for i, (ci, co) in enumerate(((3 * c, 3 * c), (3 * c, 3 * c), (3 * c, c))):
        setattr(h, f"occlusion_guidance_layer{i}", conv_relu(ci, co))
    setattr(h, "_occ_cls_fcn1", conv_relu(c, c))
    for i, (ci, co) in enumerate(((2 * c, 2 * c), (2 * c, 2 * c), (2 * c, c))):
        setattr(h, f"occ_cls__mlc_layer{i}", conv_relu(ci, co))
    setattr(h, "_occ_cls_fcn2", conv_relu(c, c, s=2))
    setattr(h, "_occ_cls_fcn3", conv_relu(c, c))
    setattr(h, "_occ_cls_fcn4", conv_relu(c, c))
    h.deconv = tnn.ConvTranspose2d(c, c, 2, 2)  # unused (O is last)
    h.predictor = tnn.Linear(c * 7 * 7, 2)
    return h


def occ_fwd(h, x, mlc):
    for i in range(3):
        x = tF.relu(getattr(h, f"occlusion_guidance_layer{i}")(x))
    x = tF.relu(h._occ_cls_fcn1(x))
    x = torch.cat([x, mlc], 1)
    for i in range(3):
        x = tF.relu(getattr(h, f"occ_cls__mlc_layer{i}")(x))
    x = tF.relu(h._occ_cls_fcn2(x))
    x = tF.relu(h._occ_cls_fcn3(x))
    x = tF.relu(h._occ_cls_fcn4(x))
    return h.predictor(x.flatten(1))


class RefUOAIS(tnn.Module):
    def __init__(self):
        super().__init__()
        bb = tnn.Module()
        bb.bottom_up_rgb = r50_trunk("res")
        bb.bottom_up_depth = r50_trunk("res_")
        fus = tnn.Sequential()
        for s, c in zip(range(2, 6), (C2, C3, C4, C5)):
            fus.add_module(f"fusion_layer_{s}", tnn.Conv2d(2 * c, c, 1))
        bb.fusion_layers = fus
        for s, c in zip(range(2, 6), (C2, C3, C4, C5)):
            setattr(bb, f"fpn_lateral{s}", tnn.Conv2d(c, 256, 1))
            setattr(bb, f"fpn_output{s}", conv_relu(256, 256))
        self.backbone = bb

        pg = tnn.Module()
        rh = tnn.Module()
        rh.conv = conv_relu(256, 256)
        rh.objectness_logits = tnn.Conv2d(256, 3, 1)
        rh.anchor_deltas = tnn.Conv2d(256, 12, 1)
        pg.rpn_head = rh
        self.proposal_generator = pg

        roi = tnn.Module()
        bh = tnn.Module()
        for i in range(1, 5):
            setattr(bh, f"conv{i}", conv_relu(256, 256))
        roi.box_head = bh
        bp = tnn.Module()
        bp.cls_score = tnn.Linear(256 * 7 * 7, 2)
        bp.bbox_pred = tnn.Linear(256 * 7 * 7, 4)
        roi.box_predictor = bp
        roi.extraction_mlc_layer0 = tnn.ConvTranspose2d(256, 256, 2, 2)
        roi.extraction_mlc_layer1 = conv_relu(256, 256)
        roi.extraction_mlc_layer2 = conv_relu(256, 256)
        roi.visible_mask_head = hom_mask_head("visible", 1)
        roi.amodal_mask_head = hom_mask_head("amodal", 2)
        roi.occ_cls_mask_head = occ_head()
        self.roi_heads = roi

    def forward(self, x, boxes_np):
        rgb = trunk_fwd(self.backbone.bottom_up_rgb, x[:, :3], "res")
        dep = trunk_fwd(self.backbone.bottom_up_depth, x[:, 3:6], "res_")
        fused = {}
        for i, s in enumerate(range(2, 6)):
            fused[s] = self.backbone.fusion_layers[i](
                torch.cat([rgb[s], dep[s]], 1))
        prev = self.backbone.fpn_lateral5(fused[5])
        pyr = {5: self.backbone.fpn_output5(prev)}
        for s in (4, 3, 2):
            prev = (getattr(self.backbone, f"fpn_lateral{s}")(fused[s])
                    + tF.interpolate(prev, scale_factor=2.0, mode="nearest"))
            pyr[s] = getattr(self.backbone, f"fpn_output{s}")(prev)
        pyr[6] = pyr[5][:, :, ::2, ::2]

        rh = self.proposal_generator.rpn_head
        rpn = {}
        for s in range(2, 7):
            t = tF.relu(rh.conv(pyr[s]))
            rpn[s] = (rh.objectness_logits(t), rh.anchor_deltas(t))

        # every test box has area << (224/2^2)^2 => all assigned to p2
        pooled7 = np_roi_align(pyr[2][0].numpy(), boxes_np, 7, 4)
        bx = torch.from_numpy(pooled7)
        first = None
        for i in range(1, 5):
            bx = tF.relu(getattr(self.roi_heads.box_head, f"conv{i}")(bx))
            if i == 1:
                first = bx
        cls = self.roi_heads.box_predictor.cls_score(bx.flatten(1))
        deltas = self.roi_heads.box_predictor.bbox_pred(bx.flatten(1))

        mlc = self.roi_heads.extraction_mlc_layer0(first)
        mlc = tF.relu(self.roi_heads.extraction_mlc_layer1(mlc))
        mlc = tF.relu(self.roi_heads.extraction_mlc_layer2(mlc))

        pooled14 = torch.from_numpy(
            np_roi_align(pyr[2][0].numpy(), boxes_np, 14, 4))
        v_logits, v_feat = hom_mask_fwd(
            self.roi_heads.visible_mask_head, "visible", pooled14, mlc)
        a_logits, a_feat = hom_mask_fwd(
            self.roi_heads.amodal_mask_head, "amodal",
            torch.cat([pooled14, v_feat], 1), mlc)
        occ = occ_fwd(self.roi_heads.occ_cls_mask_head,
                      torch.cat([pooled14, v_feat, a_feat], 1), mlc)
        return pyr, rpn, cls, deltas, v_logits, a_logits, occ


def np_roi_align(feat, boxes, out, stride):
    """Bilinear sampling at bin centers (aligned=True, 1 sample/cell) —
    the ops/boxes.roi_align convention, re-derived independently in numpy."""
    c, hh, ww = feat.shape
    res = np.zeros((len(boxes), c, out, out), np.float32)
    for n, (x0, y0, x1, y1) in enumerate(np.asarray(boxes) / stride):
        bw = max(x1 - x0, 1e-6)
        bh = max(y1 - y0, 1e-6)
        for i in range(out):
            yy = y0 + (i + 0.5) * bh / out - 0.5
            for j in range(out):
                xx = x0 + (j + 0.5) * bw / out - 0.5
                yi, xi = int(np.floor(yy)), int(np.floor(xx))
                dy, dx = yy - yi, xx - xi
                acc = np.zeros(c, np.float32)
                for (cy, cx, wgt) in ((yi, xi, (1 - dy) * (1 - dx)),
                                      (yi, xi + 1, (1 - dy) * dx),
                                      (yi + 1, xi, dy * (1 - dx)),
                                      (yi + 1, xi + 1, dy * dx)):
                    if 0 <= cy < hh and 0 <= cx < ww:
                        acc += wgt * feat[:, cy, cx]
                res[n, :, i, j] = acc
    return res


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (0.5 + rng.rand(m.num_features).astype(np.float32))))
            m.weight.copy_(torch.from_numpy(
                (0.5 + rng.rand(m.num_features).astype(np.float32))))
            m.bias.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))


def nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def test_uoais_net_import_matches_torch_rederivation():
    from quber_tpu.models.uoais_net_pretrained import UOAISNetPretrained

    rng = np.random.RandomState(7)
    torch.manual_seed(7)
    ref = RefUOAIS().eval()
    with torch.no_grad():
        _randomize_bn_stats(ref, rng)

    variables = IZ.import_uoais_net(
        {k: v.numpy() for k, v in ref.state_dict().items()})

    x = rng.randn(64, 64, 6).astype(np.float32) * 20.0
    boxes = np.asarray([[4.0, 6.0, 30.0, 40.0],
                        [0.0, 0.0, 63.0, 63.0],
                        [20.5, 10.25, 44.0, 28.75]], np.float32)

    with torch.no_grad():
        pyr, rpn, cls, deltas, v_logits, a_logits, occ = ref(
            torch.from_numpy(np.transpose(x, (2, 0, 1))[None]), boxes)

    model = UOAISNetPretrained(rpn_pre_nms_topk=64, rpn_post_nms_topk=64,
                               detections=3)
    got = model.apply({"params": variables["params"]}, jnp.asarray(x),
                      debug_boxes=jnp.asarray(boxes))

    for s in range(2, 7):
        np.testing.assert_allclose(
            nchw(got["pyramid"][f"p{s}"]), pyr[s].numpy(),
            atol=2e-3, rtol=1e-3, err_msg=f"pyramid p{s}")
        obj, dl = got["rpn_maps"][f"p{s}"]
        np.testing.assert_allclose(nchw(obj), rpn[s][0].numpy(), atol=2e-3,
                                   rtol=1e-3, err_msg=f"rpn obj p{s}")
        np.testing.assert_allclose(nchw(dl), rpn[s][1].numpy(), atol=2e-3,
                                   rtol=1e-3, err_msg=f"rpn deltas p{s}")
    np.testing.assert_allclose(np.asarray(got["cls_logits"]), cls.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["box_deltas"]), deltas.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["visible_logits"]),
                               v_logits.numpy()[:, 0], atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["amodal_logits"]),
                               a_logits.numpy()[:, 0], atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["occ_logits"]), occ.numpy(),
                               atol=5e-3, rtol=1e-3)
