"""COCO RLE codec: ctypes binding to csrc/libquber_rle.so + numpy fallback.

The reference datasets store perturbed masks and the 8 error maps as
COCO-compressed RLE dicts in JSON (written by tools/ours/panoptic2eee.py:
61-64,125-132 via pycocotools). pycocotools is not available in this image,
so the codec is implemented natively (csrc/rle.cpp, built by `make -C csrc`)
with a pure-numpy fallback for portability.

API (pycocotools-compatible dicts: {"size": [h, w], "counts": str}):
    encode(mask) -> rle dict
    decode(rle)  -> uint8 [h, w]
    decode_batch([rle, ...]) -> uint8 [n, h, w]
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libquber_rle.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # try building it
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path)], check=True,
                capture_output=True,
            )
        except Exception:
            _LIB = False
            return False
    try:
        lib = ctypes.CDLL(path)
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.rle_decode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


# ---------------------------------------------------------------------------
# numpy fallback
# ---------------------------------------------------------------------------

def _counts_from_mask(mask: np.ndarray) -> np.ndarray:
    """Column-major run lengths, starting with the zero run."""
    flat = np.asarray(mask, np.uint8).T.reshape(-1)  # column-major
    change = np.nonzero(np.diff(flat))[0] + 1
    edges = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(edges)
    if flat.size and flat[0] == 1:
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def _string_from_counts(counts) -> str:
    out = []
    counts = list(counts)
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(chr(ch + 48))
    return "".join(out)


def _counts_from_string(s: str) -> list[int]:
    counts, p = [], 0
    while p < len(s):
        x, k, more = 0, 0, True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _mask_from_counts(counts, h: int, w: int) -> np.ndarray:
    total = h * w
    flat = np.zeros((total,), np.uint8)
    pos, v = 0, 0
    for c in counts:
        if v:
            flat[pos : pos + c] = 1
        pos += c
        v ^= 1
    return flat.reshape(w, h).T  # column-major


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def encode(mask: np.ndarray) -> dict:
    mask = np.ascontiguousarray(np.asarray(mask, np.uint8))
    h, w = mask.shape
    lib = _load_lib()
    if lib:
        cap = 4 * h * w + 64
        buf = ctypes.create_string_buffer(cap)
        n = lib.rle_encode(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, buf, cap
        )
        if n >= 0:
            return {"size": [h, w], "counts": buf.raw[:n].decode("ascii")}
    return {"size": [h, w], "counts": _string_from_counts(_counts_from_mask(mask))}


def decode(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    s = rle["counts"]
    if isinstance(s, bytes):
        s = s.decode("ascii")
    lib = _load_lib()
    if lib:
        out = np.zeros((h, w), np.uint8)
        rc = lib.rle_decode(
            s.encode("ascii"), len(s), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc == 0:
            return out
    return _mask_from_counts(_counts_from_string(s), h, w)


def decode_batch(rles: list[dict]) -> np.ndarray:
    if not rles:
        return np.zeros((0, 0, 0), np.uint8)
    return np.stack([decode(r) for r in rles])
