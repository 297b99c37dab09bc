"""Checkpoint importers for the model zoo: torch state_dicts -> flax trees.

The reference's eval path loads trained weights for every zoo member — the
fg filter (/root/reference/foreground_segmentation/predictor.py:21-99,
`rgbd_fg.pth` / `rgbd_lmffnet.pth`), UCN
(/root/reference/eval/base_model.py:522-546), MSMFormer, UOAIS-Net
(base_model.py:174-222), SAM-HQ (refiner_model.py:554-664) and CascadePSP.
Without per-model importers, metric parity with reference checkpoints can
never be measured. This module mirrors import_torch.import_mask_refiner's
structure for each zoo member: an exact key mapping from the reference
module tree onto the corresponding quber_tpu flax model.

Each importer returns {"params": ..., "batch_stats": ...} ready for
model.apply. Tensor layout conversion is shared with import_torch
(OIHW->HWIO convs, [O,I]->[I,O] linears).
"""

from __future__ import annotations

import numpy as np

from quber_tpu.models.import_torch import conv_kernel, conv_kernel_inv, linear_kernel


class _ZooBuilder:
    """Accumulates params/batch_stats from torch-key inserts.

    Unlike import_torch._Builder (detectron2 ConvNorm layout), the zoo
    models use plain flax submodules: nn.Conv named "conv"/"kernel" leaf,
    nn.BatchNorm with separate batch_stats, custom PReLU with an "alpha"
    leaf.
    """

    def __init__(self, sd: dict):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: dict = {}
        self.batch_stats: dict = {}
        self.used: set = set()

    def _insert(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def take(self, key):
        self.used.add(key)
        return self.sd[key]

    # -- leaf kinds -------------------------------------------------------
    def conv(self, fpath, tkey, bias=None):
        """torch Conv2d `tkey` -> flax nn.Conv at fpath."""
        self._insert(self.params, fpath + ["kernel"], conv_kernel(self.take(f"{tkey}.weight")))
        if bias is None:
            bias = f"{tkey}.bias" in self.sd
        if bias:
            self._insert(self.params, fpath + ["bias"], self.take(f"{tkey}.bias"))

    def linear(self, fpath, tkey, bias=None):
        self._insert(self.params, fpath + ["kernel"], linear_kernel(self.take(f"{tkey}.weight")))
        if bias is None:
            bias = f"{tkey}.bias" in self.sd
        if bias:
            self._insert(self.params, fpath + ["bias"], self.take(f"{tkey}.bias"))

    def bn(self, fpath, tkey):
        """torch BatchNorm2d -> flax nn.BatchNorm (params + batch_stats)."""
        self._insert(self.params, fpath + ["scale"], self.take(f"{tkey}.weight"))
        self._insert(self.params, fpath + ["bias"], self.take(f"{tkey}.bias"))
        self._insert(self.batch_stats, fpath + ["mean"], self.take(f"{tkey}.running_mean"))
        self._insert(self.batch_stats, fpath + ["var"], self.take(f"{tkey}.running_var"))
        self.used.add(f"{tkey}.num_batches_tracked")

    def prelu(self, fpath, tkey):
        """torch nn.PReLU weight -> quber layers.PReLU alpha."""
        self._insert(self.params, fpath + ["alpha"], self.take(f"{tkey}.weight"))

    def layernorm(self, fpath, tkey):
        self._insert(self.params, fpath + ["scale"], self.take(f"{tkey}.weight"))
        self._insert(self.params, fpath + ["bias"], self.take(f"{tkey}.bias"))

    def done(self):
        unused = set(self.sd) - self.used - {
            k for k in self.sd if k.endswith("num_batches_tracked")
        }
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "unused_keys": sorted(unused),
        }


def _result(b: _ZooBuilder, strict: bool):
    out = b.done()
    if strict and out["unused_keys"]:
        raise KeyError(
            f"{len(out['unused_keys'])} unmapped checkpoint keys, e.g. "
            f"{out['unused_keys'][:5]}"
        )
    return {"params": out["params"], "batch_stats": out["batch_stats"]}


# ---------------------------------------------------------------------------
# CGNet (foreground_segmentation/cgnet.py; checkpoint rgbd_fg.pth['model'])
# ---------------------------------------------------------------------------


def _cg_convbnprelu(b, fpath, tkey):
    b.conv(fpath + ["conv"], f"{tkey}.conv")
    b.bn(fpath + ["bn"], f"{tkey}.bn")
    b.prelu(fpath + ["act"], f"{tkey}.act")


def _cg_bnprelu(b, fpath, tkey):
    b.bn(fpath + ["bn"], f"{tkey}.bn")
    b.prelu(fpath + ["act"], f"{tkey}.act")


def _cg_fglo(b, fpath, tkey):
    b.linear(fpath + ["fc1"], f"{tkey}.fc.0")
    b.linear(fpath + ["fc2"], f"{tkey}.fc.2")


def _cg_block_down(b, fpath, tkey):
    _cg_convbnprelu(b, fpath + ["conv1x1"], f"{tkey}.conv1x1")
    b.conv(fpath + ["f_loc"], f"{tkey}.F_loc.conv")
    b.conv(fpath + ["f_sur"], f"{tkey}.F_sur.conv")
    b.bn(fpath + ["bn"], f"{tkey}.bn")
    b.prelu(fpath + ["act"], f"{tkey}.act")
    b.conv(fpath + ["reduce"], f"{tkey}.reduce.conv")
    _cg_fglo(b, fpath + ["f_glo"], f"{tkey}.F_glo")


def _cg_block(b, fpath, tkey):
    _cg_convbnprelu(b, fpath + ["conv1x1"], f"{tkey}.conv1x1")
    b.conv(fpath + ["f_loc"], f"{tkey}.F_loc.conv")
    b.conv(fpath + ["f_sur"], f"{tkey}.F_sur.conv")
    _cg_bnprelu(b, fpath + ["bn_prelu"], f"{tkey}.bn_prelu")
    _cg_fglo(b, fpath + ["f_glo"], f"{tkey}.F_glo")


def import_cgnet(state_dict: dict, m: int = 3, n: int = 21,
                 strict: bool = True) -> dict:
    """Context_Guided_Network state_dict -> quber_tpu.models.CGNet tree.

    Reference module tree: foreground_segmentation/cgnet.py:275-341
    (level1_0..2, b1, level2_0 + level2 ModuleList, bn_prelu_2, level3_0 +
    level3, bn_prelu_3, classifier Sequential).
    """
    b = _ZooBuilder(state_dict)
    for i in range(3):
        _cg_convbnprelu(b, [f"level1_{i}"], f"level1_{i}")
    _cg_bnprelu(b, ["b1"], "b1")
    _cg_block_down(b, ["level2_0"], "level2_0")
    for i in range(m - 1):
        _cg_block(b, [f"level2_{i + 1}"], f"level2.{i}")
    _cg_bnprelu(b, ["bn_prelu_2"], "bn_prelu_2")
    _cg_block_down(b, ["level3_0"], "level3_0")
    for i in range(n - 1):
        _cg_block(b, [f"level3_{i + 1}"], f"level3.{i}")
    _cg_bnprelu(b, ["bn_prelu_3"], "bn_prelu_3")
    b.conv(["classifier"], "classifier.0.conv")
    return _result(b, strict)


# ---------------------------------------------------------------------------
# LMFFNet (foreground_segmentation/lmffnet.py; rgbd_lmffnet.pth['model'])
# ---------------------------------------------------------------------------


def _lm_bnprelu(b, fpath, tkey):
    b.bn(fpath + ["bn"], f"{tkey}.bn")
    b.prelu(fpath + ["act"], f"{tkey}.acti")


def _lm_convunit(b, fpath, tkey, bn_acti: bool):
    b.conv(fpath + ["conv"], f"{tkey}.conv")
    if bn_acti:
        _lm_bnprelu(b, fpath + ["bn_prelu"], f"{tkey}.bn_prelu")


def _lm_semb(b, fpath, tkey):
    _lm_convunit(b, fpath + ["conv3x3"], f"{tkey}.conv3x3", True)
    _lm_convunit(b, fpath + ["dconv_left"], f"{tkey}.dconv_left", True)
    _lm_convunit(b, fpath + ["dconv_right"], f"{tkey}.dconv_right", True)
    _lm_convunit(b, fpath + ["resume_3x3"], f"{tkey}.conv3x3_resume.conv3x3", True)
    _lm_convunit(b, fpath + ["resume_1x1"], f"{tkey}.conv3x3_resume.conv1x1_resume", False)
    _lm_bnprelu(b, fpath + ["bn_out"], f"{tkey}.bn_relu_1")


def _lm_ffmb(b, fpath, tkey):
    b.conv(fpath + ["pmca", "conv2x2"], f"{tkey}.PMCA.conv2x2.conv")
    b.linear(fpath + ["pmca", "se", "fc1"], f"{tkey}.PMCA.SE_Block.fc.0")
    b._insert(b.params, fpath + ["pmca", "se", "prelu_alpha"],
              b.take(f"{tkey}.PMCA.SE_Block.fc.1.weight"))
    b.linear(fpath + ["pmca", "se", "fc2"], f"{tkey}.PMCA.SE_Block.fc.2")
    _lm_bnprelu(b, fpath + ["bn_prelu"], f"{tkey}.bn_prelu")
    _lm_convunit(b, fpath + ["conv1x1"], f"{tkey}.conv1x1", False)


def import_lmffnet(state_dict: dict, block_1: int = 3, block_2: int = 8,
                   strict: bool = True) -> dict:
    """LMFFNet state_dict -> quber_tpu.models.LMFFNet tree.

    Reference module tree: foreground_segmentation/lmffnet.py:283-341
    (Init_Block Sequential, FFM_A, downsample_1, SEM_B_Block1 nested
    Sequential named SEM_Block_1{i}, FFM_B1, downsample_2, SEM_B_Block2,
    FFM_B2, MAD).
    """
    b = _ZooBuilder(state_dict)
    for i in range(3):
        _lm_convunit(b, [f"init_{i}"], f"Init_Block.init_conv.{i}", True)
    _lm_bnprelu(b, ["ffm_a", "bn_prelu"], "FFM_A.bn_prelu")
    _lm_convunit(b, ["ffm_a", "conv1x1"], "FFM_A.conv1x1", False)
    _lm_convunit(b, ["downsample_1", "conv3x3"], "downsample_1.conv3x3", False)
    _lm_bnprelu(b, ["downsample_1", "bn_prelu"], "downsample_1.bn_prelu")
    for i in range(block_1):
        _lm_semb(b, [f"sem_b1_{i}"], f"SEM_B_Block1.SEM_B_Block.SEM_Block_1{i}")
    _lm_ffmb(b, ["ffm_b1"], "FFM_B1")
    _lm_convunit(b, ["downsample_2", "conv3x3"], "downsample_2.conv3x3", False)
    _lm_bnprelu(b, ["downsample_2", "bn_prelu"], "downsample_2.bn_prelu")
    for i in range(block_2):
        _lm_semb(b, [f"sem_b2_{i}"], f"SEM_B_Block2.SEM_B_Block.SEM_Block_2{i}")
    _lm_ffmb(b, ["ffm_b2"], "FFM_B2")
    _lm_convunit(b, ["mad", "mid_1x1"], "MAD.mid_layer_1x1", False)
    _lm_convunit(b, ["mad", "deep_1x1"], "MAD.deep_layer_1x1", False)
    _lm_convunit(b, ["mad", "dw1"], "MAD.DwConv1", True)
    _lm_convunit(b, ["mad", "pw1"], "MAD.PwConv1", False)
    _lm_convunit(b, ["mad", "dw2"], "MAD.DwConv2", True)
    _lm_convunit(b, ["mad", "pw2"], "MAD.PwConv2", False)
    return _result(b, strict)


# ---------------------------------------------------------------------------
# CascadePSP-RGBD (pspnet.py PSPNet_UOAIS; checkpoint model_40000 with the
# DataParallel "module." prefix already stripped by the caller, as the
# reference wrapper does at eval/refiner_model.py:315-320)
# ---------------------------------------------------------------------------


def import_cascadepsp(state_dict: dict, layers=(3, 4, 6, 3),
                      strict: bool = True) -> dict:
    """PSPNet_UOAIS state_dict -> quber_tpu.models.cascadepsp.PSPNetUOAIS.

    Reference module tree: pspnet.py:175-203 (feats=ResNet_UOAIS, psp,
    up_1..3, final_28/56 Sequentials, final_11/21) with torchvision-style
    trunk naming (extractors.py:189-249). SynchronizedBatchNorm2d keys have
    the plain BatchNorm layout.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    b = _ZooBuilder(sd)
    b.conv(["feats", "conv1"], "feats.conv1")
    b.bn(["feats", "bn1"], "feats.bn1")
    for li, n in enumerate(layers):
        for bi in range(n):
            t = f"feats.layer{li + 1}.{bi}"
            f = ["feats", f"layer{li + 1}_{bi}"]
            for c in (1, 2, 3):
                b.conv(f + [f"conv{c}"], f"{t}.conv{c}")
                b.bn(f + [f"bn{c}"], f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in b.sd:
                b.conv(f + ["downsample_conv"], f"{t}.downsample.0")
                b.bn(f + ["downsample_bn"], f"{t}.downsample.1")
    for i in range(4):
        b.conv(["psp", f"stage_{i}"], f"psp.stages.{i}.1")
    b.conv(["psp", "bottleneck"], "psp.bottleneck")
    for k in (1, 2, 3):
        f = [f"up_{k}"]
        for seq, pfx in (("conv", "conv"), ("conv2", "conv2")):
            b.bn(f + [f"{pfx}_bn0"], f"up_{k}.{seq}.0")
            b.conv(f + [f"{pfx}_conv0"], f"up_{k}.{seq}.2")
            b.bn(f + [f"{pfx}_bn1"], f"up_{k}.{seq}.3")
            b.conv(f + [f"{pfx}_conv1"], f"up_{k}.{seq}.5")
        b.conv(f + ["shortcut"], f"up_{k}.shortcut")
    for name in ("final_28", "final_56"):
        b.conv([f"{name}_0"], f"{name}.0")
        b.conv([f"{name}_2"], f"{name}.2")
    b.conv(["final_11"], "final_11")
    b.conv(["final_21"], "final_21")
    return _result(b, strict)


# ---------------------------------------------------------------------------
# UCN (seg_resnet34_8s_embedding_cosine_rgbd_add; the UnseenObjectClustering
# lib/ submodule is absent from the reference snapshot, so the mapping
# targets the torchvision-style Resnet34_8s trunk naming the published UCN
# checkpoints use, with branch prefixes auto-detected from the keys)
# ---------------------------------------------------------------------------

_RESNET34_BLOCKS = (3, 4, 6, 3)


def _ucn_trunk(b, fpath, pfx):
    b.conv(fpath + ["conv1"], f"{pfx}conv1")
    b.bn(fpath + ["bn1"], f"{pfx}bn1")
    for li, n in enumerate(_RESNET34_BLOCKS):
        for bi in range(n):
            t = f"{pfx}layer{li + 1}.{bi}"
            f = fpath + [f"layer{li + 1}_{bi}"]
            b.conv(f + ["conv1"], f"{t}.conv1")
            b.bn(f + ["bn1"], f"{t}.bn1")
            b.conv(f + ["conv2"], f"{t}.conv2")
            b.bn(f + ["bn2"], f"{t}.bn2")
            if f"{t}.downsample.0.weight" in b.sd:
                b.conv(f + ["downsample_conv"], f"{t}.downsample.0")
                b.bn(f + ["downsample_bn"], f"{t}.downsample.1")


def detect_ucn_prefixes(state_dict: dict) -> tuple[str, str]:
    """(rgb_prefix, depth_prefix) of the two Resnet34_8s branches, found by
    locating the 7x7 stem convs. Prefixes include the trailing dot."""
    cands = []
    for k, v in state_dict.items():
        if k.endswith("conv1.weight") and np.asarray(v).ndim == 4 \
                and np.asarray(v).shape[2:] == (7, 7):
            cands.append(k[: -len("conv1.weight")])
    cands = sorted(set(cands))
    if len(cands) != 2:
        raise KeyError(f"expected 2 stem convs, found prefixes {cands}")
    depth_hints = ("depth", "xyz", "d_")
    if any(h in cands[0].lower() for h in depth_hints):
        return cands[1], cands[0]
    return cands[0], cands[1]


def import_ucn(state_dict: dict, strict: bool = True,
               rgb_prefix: str | None = None,
               depth_prefix: str | None = None) -> dict:
    """UCN checkpoint -> quber_tpu.models.ucn.UCNEmbeddingNet tree.

    Each branch = torchvision ResNet-34 trunk (dilated to stride 8; the
    dilation config carries no weights) + the fully-conv `fc` embedding
    head. Reference wrapper: /root/reference/eval/base_model.py:522-546.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    if rgb_prefix is None or depth_prefix is None:
        rgb_prefix, depth_prefix = detect_ucn_prefixes(sd)
    b = _ZooBuilder(sd)
    for branch, pfx in (("rgb_branch", rgb_prefix), ("depth_branch", depth_prefix)):
        _ucn_trunk(b, [branch, "trunk"], pfx)
        b.conv([branch, "fc"], f"{pfx}fc")
    return _result(b, strict)


# ---------------------------------------------------------------------------
# SAM-HQ (sam-hq/segment_anything/modeling/*; checkpoints sam_hq_vit_{b,l,h}
# .pth or the reference's fine-tuned sam_hq_epoch_*.pth,
# eval/refiner_model.py:554-664)
# ---------------------------------------------------------------------------


def _sam_convT(b, fpath, tkey):
    """torch ConvTranspose2d(2,2) [in,out,2,2] -> ConvTranspose2x2 kernel
    [2,2,in,out]."""
    w = b.take(f"{tkey}.weight")
    b._insert(b.params, fpath + ["kernel"], np.transpose(w, (2, 3, 0, 1)))
    b._insert(b.params, fpath + ["bias"], b.take(f"{tkey}.bias"))


def _sam_ln2d(b, fpath, tkey):
    b._insert(b.params, fpath + ["weight"], b.take(f"{tkey}.weight"))
    b._insert(b.params, fpath + ["bias"], b.take(f"{tkey}.bias"))


def _sam_mlp(b, fpath, tkey, n_layers=3):
    for i in range(n_layers):
        b.linear(fpath + [f"layers_{i}"], f"{tkey}.layers.{i}")


def _sam_attn(b, fpath, tkey):
    for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
        b.linear(fpath + [p], f"{tkey}.{p}")


def _sam_twoway(b, fpath, tkey, depth=2):
    for i in range(depth):
        t = f"{tkey}.layers.{i}"
        f = fpath + [f"layers_{i}"]
        _sam_attn(b, f + ["self_attn"], f"{t}.self_attn")
        _sam_attn(b, f + ["cross_attn_token_to_image"], f"{t}.cross_attn_token_to_image")
        _sam_attn(b, f + ["cross_attn_image_to_token"], f"{t}.cross_attn_image_to_token")
        for j in (1, 2, 3, 4):
            b.layernorm(f + [f"norm{j}"], f"{t}.norm{j}")
        b.linear(f + ["mlp", "lin1"], f"{t}.mlp.lin1")
        b.linear(f + ["mlp", "lin2"], f"{t}.mlp.lin2")
    _sam_attn(b, fpath + ["final_attn_token_to_image"],
              f"{tkey}.final_attn_token_to_image")
    b.layernorm(fpath + ["norm_final_attn"], f"{tkey}.norm_final_attn")


def import_sam_hq(state_dict: dict, depth: int | None = None,
                  strict: bool = True) -> dict:
    """SAM-HQ checkpoint -> quber_tpu.models.sam_hq.SAMHQ variables.

    Handles the standard Sam layout (image_encoder / prompt_encoder /
    mask_decoder=MaskDecoderHQ). The ViT depth is inferred from the block
    keys when not given (12/24/32 for vit_b/l/h).
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    b = _ZooBuilder(sd)
    enc = ["image_encoder"]
    if depth is None:
        depth = 1 + max(
            int(k.split(".")[2]) for k in sd
            if k.startswith("image_encoder.blocks.")
        )
    b.conv(enc + ["patch_embed"], "image_encoder.patch_embed.proj")
    b._insert(b.params, enc + ["pos_embed"], b.take("image_encoder.pos_embed"))
    for i in range(depth):
        t = f"image_encoder.blocks.{i}"
        f = enc + [f"block_{i}"]
        b.layernorm(f + ["norm1"], f"{t}.norm1")
        b.layernorm(f + ["norm2"], f"{t}.norm2")
        b.linear(f + ["attn", "qkv"], f"{t}.attn.qkv")
        b.linear(f + ["attn", "proj"], f"{t}.attn.proj")
        b._insert(b.params, f + ["attn", "rel_pos_h"], b.take(f"{t}.attn.rel_pos_h"))
        b._insert(b.params, f + ["attn", "rel_pos_w"], b.take(f"{t}.attn.rel_pos_w"))
        b.linear(f + ["mlp", "lin1"], f"{t}.mlp.lin1")
        b.linear(f + ["mlp", "lin2"], f"{t}.mlp.lin2")
    b.conv(enc + ["neck_0"], "image_encoder.neck.0")
    _sam_ln2d(b, enc + ["neck_1"], "image_encoder.neck.1")
    b.conv(enc + ["neck_2"], "image_encoder.neck.2")
    _sam_ln2d(b, enc + ["neck_3"], "image_encoder.neck.3")

    pe = ["prompt_encoder"]
    b._insert(b.params, pe + ["pe_gaussian"],
              b.take("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"))
    b._insert(b.params, pe + ["point_embeddings"], np.concatenate(
        [b.take(f"prompt_encoder.point_embeddings.{i}.weight") for i in range(4)]))
    b._insert(b.params, pe + ["not_a_point_embed"],
              b.take("prompt_encoder.not_a_point_embed.weight")[0])
    b._insert(b.params, pe + ["no_mask_embed"],
              b.take("prompt_encoder.no_mask_embed.weight")[0])
    b.conv(pe + ["mask_down_0"], "prompt_encoder.mask_downscaling.0")
    _sam_ln2d(b, pe + ["mask_ln_1"], "prompt_encoder.mask_downscaling.1")
    b.conv(pe + ["mask_down_2"], "prompt_encoder.mask_downscaling.3")
    _sam_ln2d(b, pe + ["mask_ln_3"], "prompt_encoder.mask_downscaling.4")
    b.conv(pe + ["mask_proj"], "prompt_encoder.mask_downscaling.6")

    dec = ["mask_decoder"]
    b._insert(b.params, dec + ["iou_token"], b.take("mask_decoder.iou_token.weight"))
    b._insert(b.params, dec + ["mask_tokens"], b.take("mask_decoder.mask_tokens.weight"))
    b._insert(b.params, dec + ["hf_token"], b.take("mask_decoder.hf_token.weight"))
    _sam_twoway(b, dec + ["transformer"], "mask_decoder.transformer")
    _sam_convT(b, dec + ["up_0"], "mask_decoder.output_upscaling.0")
    _sam_ln2d(b, dec + ["up_ln_1"], "mask_decoder.output_upscaling.1")
    _sam_convT(b, dec + ["up_3"], "mask_decoder.output_upscaling.3")
    for i in range(4):
        _sam_mlp(b, dec + [f"hyper_{i}"], f"mask_decoder.output_hypernetworks_mlps.{i}")
    _sam_mlp(b, dec + ["iou_head"], "mask_decoder.iou_prediction_head")
    _sam_mlp(b, dec + ["hf_mlp"], "mask_decoder.hf_mlp")
    _sam_convT(b, dec + ["compress_vit_0"], "mask_decoder.compress_vit_feat.0")
    _sam_ln2d(b, dec + ["compress_vit_ln_1"], "mask_decoder.compress_vit_feat.1")
    _sam_convT(b, dec + ["compress_vit_3"], "mask_decoder.compress_vit_feat.3")
    _sam_convT(b, dec + ["enc_0"], "mask_decoder.embedding_encoder.0")
    _sam_ln2d(b, dec + ["enc_ln_1"], "mask_decoder.embedding_encoder.1")
    _sam_convT(b, dec + ["enc_3"], "mask_decoder.embedding_encoder.3")
    b.conv(dec + ["maskfeat_0"], "mask_decoder.embedding_maskfeature.0")
    _sam_ln2d(b, dec + ["maskfeat_ln_1"], "mask_decoder.embedding_maskfeature.1")
    b.conv(dec + ["maskfeat_3"], "mask_decoder.embedding_maskfeature.3")
    # sam.py pixel_mean/pixel_std buffers carry no learnable state
    for k in ("pixel_mean", "pixel_std"):
        b.used.add(k)
    return _result(b, strict)


# ---------------------------------------------------------------------------
# CLIP text tower (for the Detic / GroundedSAM open-vocabulary seam,
# eval/base_model.py:108-172,301-440; accepts a full CLIP state dict and
# ignores the visual tower)
# ---------------------------------------------------------------------------


def import_clip_text(state_dict: dict, strict: bool = True) -> dict:
    """CLIP state dict -> quber_tpu.models.clip_text.CLIPTextEncoder tree.

    Handles both a full CLIP model (visual.* ignored) and a text-only
    state dict. Layer count inferred from transformer.resblocks keys.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    b = _ZooBuilder(sd)
    layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
    )
    b._insert(b.params, ["token_embedding"], b.take("token_embedding.weight"))
    b._insert(b.params, ["positional_embedding"], b.take("positional_embedding"))
    for i in range(layers):
        t = f"transformer.resblocks.{i}"
        f = [f"resblock_{i}"]
        b.layernorm(f + ["ln_1"], f"{t}.ln_1")
        b._insert(b.params, f + ["in_proj", "kernel"],
                  linear_kernel(b.take(f"{t}.attn.in_proj_weight")))
        b._insert(b.params, f + ["in_proj", "bias"],
                  b.take(f"{t}.attn.in_proj_bias"))
        b.linear(f + ["out_proj"], f"{t}.attn.out_proj")
        b.layernorm(f + ["ln_2"], f"{t}.ln_2")
        b.linear(f + ["c_fc"], f"{t}.mlp.c_fc")
        b.linear(f + ["c_proj"], f"{t}.mlp.c_proj")
    b.layernorm(["ln_final"], "ln_final")
    # torch applies pooled @ text_projection directly: no transpose
    b._insert(b.params, ["text_projection"], b.take("text_projection"))
    for k in list(sd):
        if k.startswith("visual.") or k in ("logit_scale",):
            b.used.add(k)
    return _result(b, strict)


# ---------------------------------------------------------------------------
# MSMFormer (deployed "Pretrained" variant: norm_model_0069999.pth /
# crop_dec9_model_final.pth, eval/base_model.py:963-1012; meta-arch
# meanshiftformer/pretrained_meanshiftformer_model.py:51)
# ---------------------------------------------------------------------------


def _ms_mha(b, fpath, tkey):
    """nn.MultiheadAttention packed in_proj + out_proj -> q/k/v/out Dense."""
    w = b.take(f"{tkey}.in_proj_weight")
    bias = b.take(f"{tkey}.in_proj_bias")
    e = w.shape[0] // 3
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        b._insert(b.params, fpath + [name, "kernel"],
                  linear_kernel(w[i * e:(i + 1) * e]))
        b._insert(b.params, fpath + [name, "bias"], bias[i * e:(i + 1) * e])
    b.linear(fpath + ["out_proj"], f"{tkey}.out_proj")


def import_msmformer(state_dict: dict, strict: bool = True,
                     dec_layers: int | None = None) -> dict:
    """MSMFormer checkpoint -> models.msmformer_pretrained.PretrainedMSMFormer.

    Maps `pretrained_backbone.*` (UCN dual Resnet34_8s, prefixes
    auto-detected), `sem_seg_head.pixel_decoder.mask_features` and the
    `sem_seg_head.predictor.*` mean-shift transformer decoder. Criterion
    buffers (`criterion.empty_weight`) carry no network state.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    b = _ZooBuilder(sd)

    bb = {k[len("pretrained_backbone."):]: v for k, v in sd.items()
          if k.startswith("pretrained_backbone.")}
    rgb_pfx, depth_pfx = detect_ucn_prefixes(bb)
    for branch, pfx in (("rgb_branch", rgb_pfx), ("depth_branch", depth_pfx)):
        _ucn_trunk(b, ["backbone", branch, "trunk"],
                   f"pretrained_backbone.{pfx}")
        b.conv(["backbone", branch, "fc"], f"pretrained_backbone.{pfx}fc")

    b.conv(["mask_features"], "sem_seg_head.pixel_decoder.mask_features")

    p = "sem_seg_head.predictor"
    f = ["predictor"]
    if dec_layers is None:
        dec_layers = 1 + max(
            int(k.split(".")[3]) for k in sd
            if k.startswith(f"{p}.transformer_ffn_layers."))
    for i in range(dec_layers):
        _ms_mha(b, f + [f"cross_attn_{i}"],
                f"{p}.transformer_cross_attention_layers.{i}.meanshift_attn")
        b.layernorm(f + [f"cross_norm_{i}"],
                    f"{p}.transformer_cross_attention_layers.{i}.norm")
        _ms_mha(b, f + [f"self_attn_{i}"],
                f"{p}.transformer_self_attention_layers.{i}.self_attn")
        b.layernorm(f + [f"self_norm_{i}"],
                    f"{p}.transformer_self_attention_layers.{i}.norm")
        b.linear(f + [f"ffn_{i}", "linear1"],
                 f"{p}.transformer_ffn_layers.{i}.linear1")
        b.linear(f + [f"ffn_{i}", "linear2"],
                 f"{p}.transformer_ffn_layers.{i}.linear2")
        b.layernorm(f + [f"ffn_{i}", "norm"],
                    f"{p}.transformer_ffn_layers.{i}.norm")
    b.layernorm(f + ["decoder_norm"], f"{p}.decoder_norm")
    b._insert(b.params, f + ["query_feat"], b.take(f"{p}.query_feat.weight"))
    b._insert(b.params, f + ["query_embed"], b.take(f"{p}.query_embed.weight"))
    b._insert(b.params, f + ["level_embed"], b.take(f"{p}.level_embed.weight"))
    b.conv(f + ["input_proj_0"], f"{p}.input_proj.0")
    b.linear(f + ["class_embed"], f"{p}.class_embed")
    for i in range(3):
        b.linear(f + ["mask_embed", f"layers_{i}"],
                 f"{p}.mask_embed.layers.{i}")
    for k in list(sd):
        if k.startswith("criterion.") or k in ("pixel_mean", "pixel_std"):
            b.used.add(k)
    return _result(b, strict)


# ---------------------------------------------------------------------------
# UOAIS-Net (ext_modules/uoais model_final.pth['model'], detectron2
# GeneralizedRCNN with R50_rgbdconcat_mlc_occatmask_hom_concat.yaml; eval
# wrapper /root/reference/eval/base_model.py:174-222)
# ---------------------------------------------------------------------------


def _d2conv(b, fpath, tkey, norm=None):
    """detectron2 Conv2d (+ optional fused .norm) -> quber ConvNorm module
    (kernel under a "conv" subname, FrozenBN as frozen_* params)."""
    b._insert(b.params, fpath + ["conv", "kernel"],
              conv_kernel(b.take(f"{tkey}.weight")))
    if f"{tkey}.bias" in b.sd:
        b._insert(b.params, fpath + ["conv", "bias"], b.take(f"{tkey}.bias"))
    if norm == "FrozenBN":
        n = fpath + ["FrozenBatchNorm_0"]
        b._insert(b.params, n + ["frozen_weight"], b.take(f"{tkey}.norm.weight"))
        b._insert(b.params, n + ["frozen_bias"], b.take(f"{tkey}.norm.bias"))
        b._insert(b.params, n + ["frozen_mean"],
                  b.take(f"{tkey}.norm.running_mean"))
        b._insert(b.params, n + ["frozen_var"],
                  b.take(f"{tkey}.norm.running_var"))


def _d2convT(b, fpath, tkey):
    """torch ConvTranspose2d -> flax nn.ConvTranspose kernel [kh,kw,in,out]."""
    w = b.take(f"{tkey}.weight")  # [in, out, kh, kw]
    b._insert(b.params, fpath + ["kernel"], np.transpose(w, (2, 3, 0, 1)))
    if f"{tkey}.bias" in b.sd:
        b._insert(b.params, fpath + ["bias"], b.take(f"{tkey}.bias"))


def _linear_nchw(b, fpath, tkey, c, h, w):
    """torch Linear over an NCHW flatten -> flax Dense over NHWC flatten."""
    wt = b.take(f"{tkey}.weight")  # [out, c*h*w]
    out = wt.shape[0]
    wt = wt.reshape(out, c, h, w).transpose(0, 2, 3, 1).reshape(out, -1)
    b._insert(b.params, fpath + ["kernel"], wt.T)
    b._insert(b.params, fpath + ["bias"], b.take(f"{tkey}.bias"))


def _d2_r50_trunk(b, fpath, tprefix, stage_prefix="res"):
    """Standard detectron2 R50 trunk (BasicStem + res2..res5, FrozenBN).

    stage_prefix="res_" handles the depth trunk's underscored stage names
    (adet resnet_depth.py:98)."""
    _d2conv(b, fpath + ["stem", "conv1"], f"{tprefix}.stem.conv1", "FrozenBN")
    for s, n in zip(range(2, 6), (3, 4, 6, 3)):
        for blk in range(n):
            t = f"{tprefix}.{stage_prefix}{s}.{blk}"
            f = fpath + [f"res{s}_{blk}"]
            for c in ("conv1", "conv2", "conv3"):
                _d2conv(b, f + [c], f"{t}.{c}", "FrozenBN")
            if f"{t}.shortcut.weight" in b.sd:
                _d2conv(b, f + ["shortcut"], f"{t}.shortcut", "FrozenBN")


def _hom_mask_head(b, head, prefix, n_guidance):
    """Visible/Amodal MaskRCNNConvUpsampleHead (mask_heads.py:515-728)."""
    t = f"roi_heads.{head}"
    f = [head]
    for i in range(3):
        _d2conv(b, f + [f"{prefix}_guidance_layer{i}"],
                f"{t}.{prefix}_guidance_layer{i}")
    for k in range(1, 5):
        _d2conv(b, f + [f"{prefix}_mask_fcn{k}"], f"{t}.{prefix}_mask_fcn{k}")
    for i in range(3):
        _d2conv(b, f + [f"{prefix}_mlc_layer{i}"], f"{t}.{prefix}_mlc_layer{i}")
    _d2convT(b, f + ["deconv"], f"{t}.deconv")
    _d2conv(b, f + ["predictor"], f"{t}.predictor")


def import_uoais_net(state_dict: dict, strict: bool = True) -> dict:
    """detectron2 UOAIS-Net state_dict -> UOAISNetPretrained variables."""
    b = _ZooBuilder(state_dict)
    sd = b.sd

    _d2_r50_trunk(b, ["bottom_up_rgb"], "backbone.bottom_up_rgb", "res")
    _d2_r50_trunk(b, ["bottom_up_depth"], "backbone.bottom_up_depth", "res_")
    for s in range(2, 6):
        _d2conv(b, [f"fusion_layer_{s}"],
                f"backbone.fusion_layers.fusion_layer_{s}")
        _d2conv(b, [f"fpn_lateral{s}"], f"backbone.fpn_lateral{s}")
        _d2conv(b, [f"fpn_output{s}"], f"backbone.fpn_output{s}")

    rpn = "proposal_generator.rpn_head"
    _d2conv(b, ["rpn_conv"], f"{rpn}.conv")
    _d2conv(b, ["rpn_objectness"], f"{rpn}.objectness_logits")
    _d2conv(b, ["rpn_anchor_deltas"], f"{rpn}.anchor_deltas")

    for i in range(1, 5):
        _d2conv(b, [f"box_head_conv{i}"], f"roi_heads.box_head.conv{i}")
    _linear_nchw(b, ["cls_score"], "roi_heads.box_predictor.cls_score",
                 256, 7, 7)
    _linear_nchw(b, ["bbox_pred"], "roi_heads.box_predictor.bbox_pred",
                 256, 7, 7)

    _d2convT(b, ["extraction_mlc_layer0"], "roi_heads.extraction_mlc_layer0")
    _d2conv(b, ["extraction_mlc_layer1"], "roi_heads.extraction_mlc_layer1")
    _d2conv(b, ["extraction_mlc_layer2"], "roi_heads.extraction_mlc_layer2")

    _hom_mask_head(b, "visible_mask_head", "visible", 1)
    _hom_mask_head(b, "amodal_mask_head", "amodal", 2)

    t, f = "roi_heads.occ_cls_mask_head", ["occ_cls_mask_head"]
    for i in range(3):
        _d2conv(b, f + [f"occlusion_guidance_layer{i}"],
                f"{t}.occlusion_guidance_layer{i}")
    for k in range(1, 5):
        _d2conv(b, f + [f"_occ_cls_fcn{k}"], f"{t}._occ_cls_fcn{k}")
    for i in range(3):
        _d2conv(b, f + [f"occ_cls__mlc_layer{i}"], f"{t}.occ_cls__mlc_layer{i}")
    _linear_nchw(b, f + ["predictor"], f"{t}.predictor", 256, 7, 7)

    # non-parameter buffers: normalizer constants, anchor tables, and the
    # occ head's unused trailing deconv (its output only matters when "O"
    # is not last in PREDICTION_ORDER; the deployed config ends with O)
    for k in list(sd):
        if (k in ("pixel_mean", "pixel_std")
                or k.startswith("proposal_generator.anchor_generator")
                or k.startswith("roi_heads.occ_cls_mask_head.deconv")):
            b.used.add(k)
    return _result(b, strict)


# ---------------------------------------------------------------------------
# UOIS-Net-3D: DSN + RRN (uois/src/networks.py:191-369, segmentation.py:58-68
# checkpoint format {'model': state_dict} with nn.DataParallel 'module.'
# prefixes; loaded at eval/base_model.py:441-455)
# ---------------------------------------------------------------------------


def _import_uois(state_dict: dict, strict: bool) -> dict:
    """Shared DSN/RRN mapper.

    The torch module tree (encoder/decoder/fg_module[/cd_module] of
    Conv2d_GN_ReLU / ESPModule / Upsample_Concat blocks) and the flax tree
    in models/uois_net_pretrained.py use identical submodule names, so the
    mapping is rule-based: every '<mod>.weight' is a bias-free conv unless
    its leaf is a GroupNorm ('gn'/'gn1'); 'last_conv' carries a bias
    (networks.py:253-254), which b.conv auto-detects.
    """
    if "model" in state_dict and isinstance(state_dict["model"], dict):
        state_dict = state_dict["model"]
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("module."):] if k.startswith("module.") else k] = v
    b = _ZooBuilder(sd)
    for k in sorted(b.sd):
        if not k.endswith(".weight"):
            continue
        mod = k[: -len(".weight")]
        path = mod.split(".")
        if path[-1] in ("gn", "gn1"):
            b.layernorm(path, mod)  # GroupNorm: weight/bias -> scale/bias
        else:
            b.conv(path, mod)
    return _result(b, strict)


def import_uois_dsn(state_dict: dict, strict: bool = True) -> dict:
    """DepthSeedingNetwork_3D_TOD_checkpoint.pth -> PretrainedDSN params."""
    return _import_uois(state_dict, strict)


def import_uois_rrn(state_dict: dict, strict: bool = True) -> dict:
    """RRN_OID_checkpoint.pth -> PretrainedRRN params."""
    return _import_uois(state_dict, strict)
