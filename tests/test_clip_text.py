"""CLIP text stack tests: exact BPE semantics against hand-derived
expectations, and the text tower against a torch re-derivation."""

import gzip

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from quber_tpu.models import import_zoo as IZ
from quber_tpu.models.clip_text import (
    CLIPTextEncoder,
    CLIPTokenizer,
    bytes_to_unicode,
)


def _write_merges(path, merges):
    """CLIP merges file: version header + one merge per line."""
    lines = ["#version: 0.2"] + [f"{a} {b}" for a, b in merges]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    assert m[ord("a")] == "a"


def test_bpe_tokenizer_hand_derived(tmp_path):
    # merges teach: l+o, lo+w, e+r</w>  (GPT-2 style with </w> end marker)
    merges = [("l", "o"), ("lo", "w"), ("e", "r</w>")]
    path = str(tmp_path / "merges.txt.gz")
    _write_merges(path, merges)
    tok = CLIPTokenizer(path, context_length=16)

    # vocab = 256 bytes + 256 byte</w> + merges + 2 specials
    assert tok.vocab_size == 512 + len(merges) + 2

    # "low" -> l+o -> lo, then lo+w... w is final char so it's "w</w>":
    # merge (lo, w) does NOT fire ("w</w>" != "w"); tokens = [lo, w</w>]
    ids = tok.encode("low")
    assert [tok.decoder[i] for i in ids] == ["lo", "w</w>"]

    # "lower": w is not final here, so (lo,w) fires -> low, then (e,r</w>)
    ids = tok.encode("lower")
    assert [tok.decoder[i] for i in ids] == ["low", "er</w>"]

    # casing + whitespace normalization
    assert tok.encode("  LOW   ") == tok.encode("low")

    # padded batch layout: <sot> ... <eot> then zeros
    batch = tok(["low"])
    sot, eot = tok.encoder[tok.SOT], tok.encoder[tok.EOT]
    assert batch.shape == (1, 16)
    assert batch[0, 0] == sot
    n = 1 + 2 + 1  # sot + 2 tokens + eot
    assert batch[0, n - 1] == eot
    assert (batch[0, n:] == 0).all()

    # punctuation splits off words (regex class [^\s\p{L}\p{N}]+)
    ids_dot = tok.encode("low.")
    assert [tok.decoder[i] for i in ids_dot] == ["lo", "w</w>", ".</w>"]


def test_bpe_tokenizer_golden_fixture():
    """Golden ids for the COMMITTED mini merges file, hand-derived on paper
    from the published CLIP SimpleTokenizer rules (see the fixture's
    _comment for the worked derivations) — independent of this
    implementation, unlike the tmp_path fixtures above."""
    import json
    import os

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    with open(os.path.join(fixdir, "clip_mini_golden.json")) as f:
        golden = json.load(f)
    tok = CLIPTokenizer(os.path.join(fixdir, "clip_mini_merges.txt"),
                        context_length=8)
    assert tok.vocab_size == golden["vocab_size"]
    assert tok.encoder[tok.SOT] == golden["sot"]
    assert tok.encoder[tok.EOT] == golden["eot"]
    for text, ids in golden["texts"].items():
        assert tok.encode(text) == ids, text
    # padded batch layout
    batch = tok(["cup"])
    np.testing.assert_array_equal(
        batch[0], [golden["sot"], 513, golden["eot"], 0, 0, 0, 0, 0])


def test_clip_text_encoder_matches_torch_rederivation(rng):
    """Weight-compat oracle: torch CLIP-layout text tower (fused-qkv
    MultiheadAttention, QuickGELU, EOT pooling, text_projection)."""
    width, heads, layers, vocab, ctx, embed = 64, 4, 2, 100, 12, 32

    class QuickGELU(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(width)
            self.attn = tnn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = tnn.LayerNorm(width)
            self.mlp = tnn.Sequential()
            self.mlp.add_module("c_fc", tnn.Linear(width, width * 4))
            self.mlp.add_module("gelu", QuickGELU())
            self.mlp.add_module("c_proj", tnn.Linear(width * 4, width))

        def forward(self, x, mask):
            a, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                             attn_mask=mask, need_weights=False)
            x = x + a
            return x + self.mlp(self.ln_2(x))

    class RefText(tnn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = tnn.Embedding(vocab, width)
            self.positional_embedding = tnn.Parameter(torch.randn(ctx, width) * 0.01)
            self.transformer = tnn.Module()
            self.transformer.resblocks = tnn.ModuleList(
                [Block() for _ in range(layers)])
            self.ln_final = tnn.LayerNorm(width)
            self.text_projection = tnn.Parameter(torch.randn(width, embed) * 0.02)

        def forward(self, ids):
            x = self.token_embedding(ids) + self.positional_embedding[: ids.shape[1]]
            mask = torch.full((ids.shape[1], ids.shape[1]), float("-inf"))
            mask.triu_(1)
            for blk in self.transformer.resblocks:
                x = blk(x, mask)
            x = self.ln_final(x)
            pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
            out = pooled @ self.text_projection
            return out / out.norm(dim=-1, keepdim=True)

    torch.manual_seed(0)
    ref = RefText().eval()

    variables = IZ.import_clip_text(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = CLIPTextEncoder(vocab_size=vocab, width=width, layers=layers,
                            heads=heads, context_length=ctx, embed_dim=embed)

    ids = rng.randint(1, vocab, size=(3, ctx)).astype(np.int32)
    # make the "EOT" (max id) land at distinct positions per row
    ids[:, 5] = vocab - 1
    with torch.no_grad():
        want = ref(torch.from_numpy(ids.astype(np.int64))).numpy()
    got = np.asarray(model.apply({"params": variables["params"]},
                                 jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_make_text_tower_clip_path(tmp_path):
    """open_vocab's tower factory uses the CLIP stack when a merges file
    is supplied, and the hash fallback otherwise."""
    from quber_tpu.models.open_vocab import make_text_tower

    merges = [("l", "o"), ("lo", "w")]
    path = str(tmp_path / "merges.txt.gz")
    _write_merges(path, merges)

    enc, init, apply = make_text_tower(
        ["low object", "tall object"], bpe_path=path,
        clip_config=dict(vocab_size=520, width=32, layers=1, heads=2,
                         context_length=16, embed_dim=24))
    tp = init(jax.random.PRNGKey(0))
    embeds = apply(tp)
    assert embeds.shape == (2, 24)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(embeds), axis=-1), 1.0, atol=1e-5)

    enc2, init2, apply2 = make_text_tower(["low object"])
    embeds2 = apply2(init2(jax.random.PRNGKey(0)))
    assert embeds2.shape[0] == 1
