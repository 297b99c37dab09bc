"""Zoo checkpoint-importer tests.

Where the reference torch module is self-contained (CGNet, LMFFNet depend
only on torch), these tests are true oracles: instantiate the REFERENCE
module from /root/reference at test time, convert its randomly-initialized
state_dict with the importer, and require the flax forward to match the
torch forward numerically. Skipped when the reference snapshot is absent.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from quber_tpu.models import import_zoo as IZ

REF = "/root/reference/foreground_segmentation"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not available"
)


def _load_ref_module(name):
    sys.path.insert(0, REF)
    try:
        import importlib

        return importlib.import_module(name)
    finally:
        sys.path.remove(REF)


def _randomize_bn_stats(model, seed=0):
    """Give BN layers non-trivial running stats so mismatches can't hide."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


@needs_reference
def test_cgnet_import_matches_reference_torch(rng):
    cgnet_ref = _load_ref_module("cgnet")
    torch.manual_seed(0)
    # small M/N keeps the oracle fast; the mapping code is the same per block
    ref = cgnet_ref.Context_Guided_Network(classes=2, in_channel=4, M=2, N=3).eval()
    _randomize_bn_stats(ref)

    from quber_tpu.models.cgnet import CGNet

    variables = IZ.import_cgnet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, m=2, n=3
    )
    model = CGNet(classes=2, in_channels=4, m=2, n=3)

    x = rng.rand(1, 64, 64, 4).astype(np.float32)
    want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4
    )


@needs_reference
def test_lmffnet_import_matches_reference_torch(rng):
    lm_ref = _load_ref_module("lmffnet")
    torch.manual_seed(0)
    ref = lm_ref.LMFFNet(classes=3, block_1=1, block_2=2).eval()
    _randomize_bn_stats(ref)

    from quber_tpu.models.lmffnet import LMFFNet

    variables = IZ.import_lmffnet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, block_1=1, block_2=2
    )
    model = LMFFNet(classes=3, block_1=1, block_2=2)

    x = rng.rand(1, 64, 64, 6).astype(np.float32)
    want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4
    )


@needs_reference
def test_cgnet_import_full_size_strict():
    """Full-size (M=3, N=21) mapping consumes every checkpoint key."""
    cgnet_ref = _load_ref_module("cgnet")
    torch.manual_seed(1)
    ref = cgnet_ref.Context_Guided_Network(classes=2, in_channel=4)
    variables = IZ.import_cgnet({k: v.numpy() for k, v in ref.state_dict().items()})
    n_leaves = len(
        [1 for _ in _iter_leaves(variables["params"])]
    )
    assert n_leaves > 300


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


def _torch_resnet34_8s(num_units=64):
    """Independent torch re-derivation of the Resnet34_8s branch with
    torchvision state-dict naming (conv1/bn1/layer{1-4}.{i}/downsample/fc),
    dilated to stride 8 — the layout the published UCN checkpoints carry
    (the UnseenObjectClustering lib/ submodule is absent from the
    reference snapshot; wrapper at eval/base_model.py:522-546)."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1, dilation=1, downsample=False):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, dilation, dilation, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU()
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, dilation, dilation, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = (
                tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                ) if downsample else None
            )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idt)

    class Resnet34_8s(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            specs = [(64, 64, 3, 1, 1, 1), (64, 128, 4, 2, 1, 1),
                     (128, 256, 6, 1, 1, 2), (256, 512, 3, 1, 2, 4)]
            for li, (cin, cout, n, stride, dil0, dil) in enumerate(specs):
                blocks = []
                for bi in range(n):
                    blocks.append(BasicBlock(
                        cin if bi == 0 else cout, cout,
                        stride if bi == 0 else 1,
                        dil0 if bi == 0 else dil,
                        downsample=(bi == 0 and (stride != 1 or cin != cout)),
                    ))
                setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
            self.fc = tnn.Conv2d(512, num_units, 1)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(4):
                x = getattr(self, f"layer{li + 1}")(x)
            return self.fc(x)

    return Resnet34_8s()


def test_ucn_import_matches_torch_rederivation(rng):
    import torch.nn as tnn
    import torch.nn.functional as tF

    torch.manual_seed(0)

    class UCNTorch(tnn.Module):
        def __init__(self):
            super().__init__()
            self.rgb_fcn = _torch_resnet34_8s(16)
            self.depth_fcn = _torch_resnet34_8s(16)

        def forward(self, rgb, xyz):
            e = self.rgb_fcn(rgb) + self.depth_fcn(xyz)
            e = tF.interpolate(e, scale_factor=8, mode="bilinear",
                               align_corners=False)
            return tF.normalize(e, dim=1)

    ref = UCNTorch().eval()
    _randomize_bn_stats(ref)

    from quber_tpu.models.ucn import UCNEmbeddingNet

    variables = IZ.import_ucn({k: v.numpy() for k, v in ref.state_dict().items()})
    # auto-detected prefixes route rgb_fcn -> rgb_branch (depth hint absent
    # from "rgb_fcn", present in "depth_fcn")
    model = UCNEmbeddingNet(embed_dim=16)

    rgb = rng.rand(1, 64, 64, 3).astype(np.float32)
    xyz = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(xyz, (0, 3, 1, 2))),
        ).numpy()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(rgb), jnp.asarray(xyz),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4
    )


SAM_DIR = "/root/reference/sam-hq/segment_anything/modeling"


def _load_sam_modeling():
    """Load the reference segment_anything.modeling files as a synthetic
    package (the real package __init__ pulls torchvision/timm)."""
    import importlib
    import types

    if "samref" not in sys.modules:
        pkg = types.ModuleType("samref")
        pkg.__path__ = [SAM_DIR]
        sys.modules["samref"] = pkg
    return {
        name: importlib.import_module(f"samref.{name}")
        for name in ("common", "image_encoder", "prompt_encoder",
                     "transformer", "mask_decoder_hq")
    }


@pytest.mark.skipif(not os.path.isdir(SAM_DIR),
                    reason="reference snapshot not available")
def test_sam_hq_import_matches_reference_torch(rng):
    """Oracle: tiny-config reference SAM-HQ (ViT encoder + prompt encoder +
    HQ mask decoder) vs flax SAMHQ with imported weights, for both the
    mask-prompt and point-prompt paths."""
    from functools import partial

    import torch.nn as tnn

    mods = _load_sam_modeling()
    torch.manual_seed(0)

    class RefSamHQ(tnn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = mods["image_encoder"].ImageEncoderViT(
                img_size=64, patch_size=16, in_chans=3, embed_dim=32,
                depth=3, num_heads=2,
                norm_layer=partial(tnn.LayerNorm, eps=1e-6),
                use_rel_pos=True, global_attn_indexes=[1], window_size=2,
                out_chans=256,
            )
            self.prompt_encoder = mods["prompt_encoder"].PromptEncoder(
                embed_dim=256, image_embedding_size=(4, 4),
                input_image_size=(64, 64), mask_in_chans=16,
            )
            self.mask_decoder = mods["mask_decoder_hq"].MaskDecoderHQ(
                transformer_dim=256,
                transformer=mods["transformer"].TwoWayTransformer(
                    depth=2, embedding_dim=256, mlp_dim=2048, num_heads=8),
                num_multimask_outputs=3, vit_dim=32,
            )

    ref = RefSamHQ().eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    from quber_tpu.models.sam_hq import SAMHQ

    variables = IZ.import_sam_hq(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = SAMHQ(img_size=64, embed_dim=32, depth=3, num_heads=2,
                  global_blocks=(1,), window_size=2)

    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    mask_prompt = rng.rand(1, 16, 16, 1).astype(np.float32)

    with torch.no_grad():
        t_img = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        t_embed, t_interm = ref.image_encoder(t_img)
        sparse, dense = ref.prompt_encoder(
            points=None, boxes=None,
            masks=torch.from_numpy(np.transpose(mask_prompt, (0, 3, 1, 2))))
        want_masks, want_iou = ref.mask_decoder(
            image_embeddings=t_embed,
            image_pe=ref.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=False, hq_token_only=False,
            interm_embeddings=t_interm,
        )

    fvars = {"params": variables["params"]}
    embed, interm = model.apply(fvars, jnp.asarray(img), method=SAMHQ.encode)
    np.testing.assert_allclose(
        np.transpose(np.asarray(embed), (0, 3, 1, 2)), t_embed.numpy(),
        atol=2e-4, err_msg="image embedding")
    got_masks, got_iou, _ = model.apply(
        fvars, embed, interm, jnp.asarray(mask_prompt), method=SAMHQ.decode)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_masks), want_masks.numpy(),
                               atol=2e-3, err_msg="mask-prompt masks")

    # point-prompt path
    pts = np.asarray([[[10.0, 20.0], [40.0, 7.0]]], np.float32)
    labs = np.asarray([[1, 0]], np.int64)
    with torch.no_grad():
        sparse, dense = ref.prompt_encoder(
            points=(torch.from_numpy(pts), torch.from_numpy(labs)),
            boxes=None, masks=None)
        want_masks, want_iou = ref.mask_decoder(
            image_embeddings=t_embed,
            image_pe=ref.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=True, hq_token_only=False,
            interm_embeddings=t_interm,
        )
    got_masks, got_iou, _ = model.apply(
        fvars, embed, interm, jnp.asarray(pts), jnp.asarray(labs.astype(np.int32)),
        True, method=SAMHQ.decode_points)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_masks), want_masks.numpy(),
                               atol=2e-3, err_msg="point-prompt masks")


@pytest.mark.skipif(
    not os.path.isfile("/root/reference/pspnet.py"),
    reason="reference snapshot not available",
)
def test_cascadepsp_import_matches_reference_torch(rng):
    """Oracle: reference PSPNet_UOAIS (SyncBN shimmed to BatchNorm — exact
    in eval mode) vs flax PSPNetUOAIS with imported weights."""
    import importlib.util
    import types

    import torch.nn as tnn

    # the reference files import from the CascadePSP repo's package layout;
    # shim the two package modules they need
    sync = types.ModuleType("models.sync_batchnorm")
    sync.SynchronizedBatchNorm2d = tnn.BatchNorm2d
    models_pkg = types.ModuleType("models")
    psp_pkg = types.ModuleType("models.psp")
    saved = {k: sys.modules.get(k) for k in
             ("models", "models.psp", "models.sync_batchnorm")}
    sys.modules["models"] = models_pkg
    sys.modules["models.sync_batchnorm"] = sync
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_extractors", "/root/reference/extractors.py")
        extractors = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(extractors)
        psp_pkg.extractors = extractors
        sys.modules["models.psp"] = psp_pkg
        spec = importlib.util.spec_from_file_location(
            "ref_pspnet", "/root/reference/pspnet.py")
        pspnet = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pspnet)

        torch.manual_seed(0)
        ref = pspnet.PSPNet_UOAIS(backend="resnet50_uoais", pretrained=False).eval()
        _randomize_bn_stats(ref)

        from quber_tpu.models.cascadepsp import PSPNetUOAIS

        variables = IZ.import_cascadepsp(
            {k: v.numpy() for k, v in ref.state_dict().items()}
        )
        model = PSPNetUOAIS()

        rgb = rng.rand(1, 224, 224, 3).astype(np.float32)
        depth = rng.rand(1, 224, 224, 1).astype(np.float32)
        seg = (rng.rand(1, 224, 224, 1) > 0.5).astype(np.float32) * 2 - 1
        with torch.no_grad():
            want = ref(
                torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
                torch.from_numpy(np.transpose(depth, (0, 3, 1, 2))),
                torch.from_numpy(np.transpose(seg, (0, 3, 1, 2))),
            )
        got = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(seg),
        )
        for key in ("out_28", "out_56", "out_224"):
            np.testing.assert_allclose(
                np.transpose(np.asarray(got[key]), (0, 3, 1, 2)),
                want[key].numpy(), atol=5e-3,
                err_msg=key,
            )
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# ---------------------------------------------------------------------------
# MSMFormer (deployed "Pretrained" variant)
# ---------------------------------------------------------------------------


def _torch_pos_sine(h, w, num_pos_feats):
    """PositionEmbeddingSine(normalize=True) re-derivation
    (meanshiftformer/modeling/transformer_decoder/position_encoding.py:29-52),
    returning [HW, 2F] (y-channels then x-channels)."""
    import math

    eps = 1e-6
    y = torch.arange(1, h + 1, dtype=torch.float32)
    x = torch.arange(1, w + 1, dtype=torch.float32)
    y = y / (y[-1] + eps) * 2 * math.pi
    x = x / (x[-1] + eps) * 2 * math.pi
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                        / num_pos_feats)

    def inter(v):
        ang = v[:, None] / dim_t
        return torch.stack((ang[:, 0::2].sin(), ang[:, 1::2].cos()),
                           dim=2).flatten(1)

    py, px = inter(y), inter(x)  # [H,F],[W,F]
    grid = torch.cat(
        [py[:, None, :].expand(h, w, num_pos_feats),
         px[None, :, :].expand(h, w, num_pos_feats)], dim=-1)
    return grid.reshape(h * w, 2 * num_pos_feats)


def _torch_ms_attn(mha, q, k, v, mask=None, kappa=30.0):
    """hypersphere attention re-derivation (attention_util.py:30-86,
    330-430) on batch-first [B,L,E] tensors; mask additive [B,1,L,S]."""
    import torch.nn.functional as tF

    W, bias = mha.in_proj_weight, mha.in_proj_bias
    e = W.shape[0] // 3
    h = mha.num_heads
    hd = e // h

    def proj(x, i):
        return tF.linear(x, W[i * e:(i + 1) * e], bias[i * e:(i + 1) * e])

    def split(t):
        b, l, _ = t.shape
        return t.reshape(b, l, h, hd).permute(0, 2, 1, 3)

    qp, kp, vp = split(proj(q, 0)), split(proj(k, 1)), split(proj(v, 2))
    qp = tF.normalize(qp, dim=-1)
    kp = tF.normalize(kp, dim=-1)
    logits = kappa * (qp @ kp.transpose(-2, -1))
    if mask is not None:
        logits = logits + mask
    attn = logits.softmax(-1)
    out = tF.normalize(attn @ vp, dim=-1)
    b, _, l, _ = out.shape
    out = out.permute(0, 2, 1, 3).reshape(b, l, e)
    return tF.linear(out, mha.out_proj.weight, mha.out_proj.bias)


def test_msmformer_import_matches_torch_rederivation(rng):
    import torch.nn as tnn
    import torch.nn.functional as tF

    torch.manual_seed(0)
    E, DIM, HEADS, FFN, Q, L, C, MD = 16, 32, 4, 48, 8, 2, 2, 24

    class RefMSM(tnn.Module):
        """State-dict-exact container for the PretrainedMeanShiftMaskFormer
        key layout (pretrained_meanshiftformer_model.py:51;
        meanshiftformer_transformer_decoder.py:698-861)."""

        def __init__(self):
            super().__init__()
            bb = tnn.Module()
            bb.rgb_fcn = _torch_resnet34_8s(E)
            bb.depth_fcn = _torch_resnet34_8s(E)
            self.pretrained_backbone = bb
            sem = tnn.Module()
            pd = tnn.Module()
            pd.mask_features = tnn.Conv2d(E, MD, 3, padding=1)
            pred = tnn.Module()
            for kind, attr in (("cross", "meanshift_attn"),
                               ("self", "self_attn")):
                layers = tnn.ModuleList()
                for _ in range(L):
                    m = tnn.Module()
                    setattr(m, attr, tnn.MultiheadAttention(DIM, HEADS))
                    m.norm = tnn.LayerNorm(DIM)
                    layers.append(m)
                setattr(pred, f"transformer_{kind}_attention_layers", layers)
            ffns = tnn.ModuleList()
            for _ in range(L):
                m = tnn.Module()
                m.linear1 = tnn.Linear(DIM, FFN)
                m.linear2 = tnn.Linear(FFN, DIM)
                m.norm = tnn.LayerNorm(DIM)
                ffns.append(m)
            pred.transformer_ffn_layers = ffns
            pred.decoder_norm = tnn.LayerNorm(DIM)
            pred.query_feat = tnn.Embedding(Q, DIM)
            pred.query_embed = tnn.Embedding(Q, DIM)
            pred.level_embed = tnn.Embedding(1, DIM)
            pred.input_proj = tnn.ModuleList([tnn.Conv2d(E, DIM, 1)])
            pred.class_embed = tnn.Linear(DIM, C + 1)
            me = tnn.Module()
            me.layers = tnn.ModuleList(
                [tnn.Linear(DIM, DIM), tnn.Linear(DIM, DIM),
                 tnn.Linear(DIM, MD)])
            pred.mask_embed = me
            sem.pixel_decoder = pd
            sem.predictor = pred
            self.sem_seg_head = sem

        def forward(self, rgb, xyz):
            bb = self.pretrained_backbone
            emb = bb.rgb_fcn(rgb) + bb.depth_fcn(xyz)
            emb = tF.interpolate(emb, scale_factor=8, mode="bilinear",
                                 align_corners=False)
            emb = tF.normalize(emb, dim=1)  # backbone + meta-arch norm
            pd = self.sem_seg_head.pixel_decoder
            pred = self.sem_seg_head.predictor
            mask_features = pd.mask_features(emb)  # [B,MD,H,W]
            b, _, h, w = emb.shape
            pos = _torch_pos_sine(h, w, DIM // 2)[None]  # [1,HW,DIM]
            src = pred.input_proj[0](emb).flatten(2).transpose(1, 2)
            src = src + pred.level_embed.weight[0]
            out = pred.query_feat.weight[None].expand(b, Q, DIM)
            qpos = pred.query_embed.weight[None]

            def heads(out):
                dec = pred.decoder_norm(out)
                logits = pred.class_embed(dec)
                x = dec
                for i, lin in enumerate(pred.mask_embed.layers):
                    x = lin(x) if i == 2 else tF.relu(lin(x))
                masks = torch.einsum("bqc,bchw->bqhw", x, mask_features)
                am = tF.interpolate(masks, size=(h, w), mode="bilinear",
                                    align_corners=False)
                blocked = am.sigmoid().flatten(2) < 0.5  # [B,Q,HW]
                allb = blocked.all(-1, keepdim=True)
                blocked = blocked & ~allb
                fmask = torch.zeros_like(blocked, dtype=torch.float32)
                fmask[blocked] = float("-inf")
                return logits, masks, fmask[:, None]  # [B,1,Q,HW]

            logits, masks, am = heads(out)
            for i in range(L):
                t2 = _torch_ms_attn(
                    pred.transformer_cross_attention_layers[i].meanshift_attn,
                    out + qpos, src + pos, src, mask=am)
                out = pred.transformer_cross_attention_layers[i].norm(out + t2)
                t2 = _torch_ms_attn(
                    pred.transformer_self_attention_layers[i].self_attn,
                    out + qpos, out + qpos, out)
                out = pred.transformer_self_attention_layers[i].norm(out + t2)
                f = pred.transformer_ffn_layers[i]
                t2 = f.linear2(tF.relu(f.linear1(out)))
                out = f.norm(out + t2)
                out = tF.normalize(out, dim=-1)
                logits, masks, am = heads(out)
            return logits, masks

    ref = RefMSM().eval()
    _randomize_bn_stats(ref)

    from quber_tpu.models.msmformer_pretrained import PretrainedMSMFormer

    variables = IZ.import_msmformer(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = PretrainedMSMFormer(
        embed_dim=E, hidden_dim=DIM, num_queries=Q, nheads=HEADS,
        dim_feedforward=FFN, dec_layers=L, num_classes=C, mask_dim=MD)

    rgb = rng.rand(1, 32, 32, 3).astype(np.float32)
    xyz = rng.rand(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want_logits, want_masks = ref(
            torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(xyz, (0, 3, 1, 2))))
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(rgb), jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(got["pred_logits"]),
                               want_logits.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["pred_masks"]),
                               want_masks.numpy(), atol=2e-3)


# ---------------------------------------------------------------------------
# UOIS-Net-3D (uois/src/networks.py): true oracle against the reference
# torch modules, loaded as a synthetic package so src/'s relative imports
# resolve without an __init__.py.
# ---------------------------------------------------------------------------

UOIS_DIR = "/root/reference/uois/src"


def _load_uois_networks():
    import importlib
    import types

    if "refuois" not in sys.modules:
        pkg = types.ModuleType("refuois")
        pkg.__path__ = [UOIS_DIR]
        sys.modules["refuois"] = pkg
    return importlib.import_module("refuois.networks")


@pytest.mark.skipif(not os.path.isdir(UOIS_DIR),
                    reason="reference uois snapshot not available")
def test_uois_dsn_import_matches_reference_torch(rng):
    networks = _load_uois_networks()
    import torch.nn as tnn

    torch.manual_seed(0)
    fd = 10  # small feature_dim keeps the oracle fast; mapping is per-block
    enc = networks.UNetESP_Encoder(input_channels=3, feature_dim=fd).eval()
    dec = networks.UNetESP_Decoder(feature_dim=fd).eval()
    fg = tnn.Conv2d(fd, 3, kernel_size=1, bias=False)
    cd = tnn.Conv2d(fd, 3, kernel_size=1, bias=False)

    xyz = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        feats = dec(enc(torch.from_numpy(np.transpose(xyz, (0, 3, 1, 2)))))
        want_fg = fg(feats).numpy()
        want_cd = cd(feats).numpy()

    sd = {f"module.encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"module.decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({"module.fg_module.weight": fg.weight,
               "module.cd_module.weight": cd.weight})
    variables = IZ.import_uois_dsn(
        {"model": {k: v.detach().numpy() for k, v in sd.items()}})

    from quber_tpu.models.uois_net_pretrained import PretrainedDSN

    model = PretrainedDSN(feature_dim=fd)
    got_fg, got_cd = model.apply({"params": variables["params"]},
                                 jnp.asarray(xyz))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_fg), (0, 3, 1, 2)), want_fg, atol=1e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_cd), (0, 3, 1, 2)), want_cd, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(UOIS_DIR),
                    reason="reference uois snapshot not available")
def test_uois_rrn_import_matches_reference_torch(rng):
    networks = _load_uois_networks()
    import torch.nn as tnn

    torch.manual_seed(1)
    fd = 10
    enc = networks.UNet_Encoder(input_channels=4, feature_dim=fd).eval()
    dec = networks.UNet_Decoder(num_encoders=1, feature_dim=fd).eval()
    fg = tnn.Conv2d(fd, 1, kernel_size=1, bias=False)

    x = rng.rand(1, 64, 64, 4).astype(np.float32)
    with torch.no_grad():
        feats = dec([enc(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))])
        want = fg(feats).numpy()[:, 0]

    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({"fg_module.weight": fg.weight})
    variables = IZ.import_uois_rrn(
        {k: v.detach().numpy() for k, v in sd.items()})

    from quber_tpu.models.uois_net_pretrained import PretrainedRRN

    model = PretrainedRRN(feature_dim=fd)
    got = model.apply({"params": variables["params"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
