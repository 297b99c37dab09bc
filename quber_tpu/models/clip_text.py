"""CLIP-compatible text stack: exact BPE tokenizer + text transformer.

Makes the open-vocabulary import seam real (the reference's Detic /
GroundedSAM wrappers, /root/reference/eval/base_model.py:108-172,301-440,
drive CLIP-embedded class vocabularies): a faithful re-implementation of
CLIP's byte-pair-encoding tokenizer (loads the standard
`bpe_simple_vocab_16e6.txt[.gz]` merges file every CLIP distribution
ships — this zero-egress environment cannot bundle it, so the path is
supplied at runtime) and a weight-compatible flax CLIP text encoder
(token/positional embeddings, causal residual attention blocks with
QuickGELU, ln_final + text_projection, EOT-token pooling) that
import_zoo.import_clip_text fills from a real CLIP state dict.

With no merges file, quber_tpu.models.open_vocab's hash tokenizer remains
the fallback.
"""

from __future__ import annotations

import gzip
import html
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# BPE tokenizer (CLIP semantics)
# ---------------------------------------------------------------------------


@lru_cache()
def bytes_to_unicode():
    """Reversible byte -> printable-unicode map (GPT-2/CLIP convention):
    the 188 printable latin-1 bytes map to themselves, the rest to
    256+offset codepoints, so every byte string becomes visible chars."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(a, b) for a, b in zip(word, word[1:])}


class CLIPTokenizer:
    """CLIP's SimpleTokenizer semantics: lowercase, regex word split,
    byte-encode, per-word BPE with an end-of-word marker.

    Args:
      bpe_path: merges file (`bpe_simple_vocab_16e6.txt` or `.txt.gz`;
        first line is a version header, next 48894 lines are merges).
      context_length: padded token-sequence length (CLIP uses 77).
    """

    SOT = "<|startoftext|>"
    EOT = "<|endoftext|>"

    def __init__(self, bpe_path: str, context_length: int = 77):
        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        if bpe_path.endswith(".gz"):
            with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
        else:
            with open(bpe_path, encoding="utf-8") as f:
                lines = f.read().split("\n")
        # CLIP slices merges[1 : 49152-256-2+1]: drop the header line and
        # keep exactly 48894 merge rules
        merges = [tuple(m.split()) for m in lines[1: 49152 - 256 - 2 + 1] if m]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [self.SOT, self.EOT]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {self.SOT: self.SOT, self.EOT: self.EOT}
        import regex

        self.pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE,
        )

    @property
    def vocab_size(self):
        return len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        text = html.unescape(html.unescape(text))
        text = " ".join(text.split()).strip().lower()
        ids = []
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def __call__(self, texts) -> np.ndarray:
        """Tokenize to padded [B, context_length] int32 (CLIP tokenize()):
        <sot> tokens <eot>, truncated so <eot> always survives."""
        if isinstance(texts, str):
            texts = [texts]
        sot, eot = self.encoder[self.SOT], self.encoder[self.EOT]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [sot] + self.encode(text) + [eot]
            if len(ids) > self.context_length:
                ids = ids[: self.context_length]
                ids[-1] = eot
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# CLIP text transformer (weight-compatible)
# ---------------------------------------------------------------------------


def quick_gelu(x):
    """OpenAI CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        d = self.dtype
        c, nh = self.width, self.heads
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        # torch nn.MultiheadAttention: fused in_proj [3C, C] -> q,k,v
        in_proj = nn.Dense(3 * c, dtype=d, name="in_proj")(y)
        q, k, v = jnp.split(in_proj, 3, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, nh, c // nh).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        attn = (q / np.sqrt(c // nh)) @ jnp.swapaxes(k, -2, -1)
        attn = jnp.where(causal_mask, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(x.shape)
        x = x + nn.Dense(c, dtype=d, name="out_proj")(o)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * c, dtype=d, name="c_fc")(y)
        y = quick_gelu(y)
        x = x + nn.Dense(c, dtype=d, name="c_proj")(y)
        return x


class CLIPTextEncoder(nn.Module):
    """CLIP's text tower: causal transformer over BPE ids, EOT pooling.

    Defaults match ViT-B CLIP (vocab 49408, width 512, 12 layers, 8 heads,
    context 77, projection to 512). Output is L2-normalized.
    """

    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        """ids [B, context_length] int32 from CLIPTokenizer."""
        d = self.dtype
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (self.vocab_size, self.width))
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = tok[ids].astype(d) + pos[None, : ids.shape[1]].astype(d)
        n = ids.shape[1]
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, d,
                                       name=f"resblock_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x.astype(jnp.float32))
        # pool at the EOT token = position of the max id (EOT has the
        # highest id in the CLIP vocab)
        eot_pos = jnp.argmax(ids, axis=-1)
        pooled = jnp.take_along_axis(
            x, eot_pos[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.embed_dim))
        out = pooled @ proj
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8)
