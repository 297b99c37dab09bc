"""Native (C++) host transport codecs: byte-equality vs the numpy pack path.

csrc/codec.cpp via quber_tpu/transport_native.py is the serving packer's
fast path; these tests pin it to the numpy formulation in
quber_tpu/predictor.py (_encode_rgb_nibbles / _pack_inputs_rle /
_pack_inputs), including the budget-overflow fallback conditions.
"""

import numpy as np
import pytest

from quber_tpu import transport_native as tn
from quber_tpu.models.mask_refiner import MaskRefinerConfig
from quber_tpu.predictor import MaskRefinerPredictor

pytestmark = pytest.mark.skipif(not tn.available(),
                                reason="libquber_codec.so not built")


def _camera_rgb(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(yy // 3 + xx // 5) % 256, (xx // 2) % 256, (yy // 4) % 256], -1
    ).astype(np.int16)
    return (rgb + rng.randint(-3, 4, rgb.shape)).clip(0, 255).astype(np.uint8)


def _frames(rng, h, w, n_masks):
    from tests.conftest import random_blobs

    rgb = _camera_rgb(rng, h, w)
    depth1 = ((np.add.outer(np.arange(h), np.arange(w)) // 7) % 256).astype(
        np.uint8
    )
    depth = np.repeat(depth1[..., None], 3, axis=-1)
    masks = list(random_blobs(rng, n_masks, h, w, min_r=4, max_r=9))
    return rgb, depth, masks


def _numpy_packed(predictor, fn_name, *args, **kw):
    """Run the predictor pack function with the native library disabled."""
    import quber_tpu.predictor as P

    orig = P._native.available
    P._native.available = lambda: False
    try:
        return getattr(predictor, fn_name)(*args, **kw)
    finally:
        P._native.available = orig


@pytest.mark.parametrize("rgb_codec", [False, True])
def test_pack_inputs_rle_native_matches_numpy(rng, rgb_codec):
    cfg = MaskRefinerConfig(height=64, width=64, resnet_depth=14)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    for n_masks in (0, 1, 3):
        rgb, depth, masks = _frames(rng, 64, 64, n_masks)
        ref = _numpy_packed(predictor, "_pack_inputs_rle", rgb, depth, masks,
                            rgb_codec=rgb_codec)
        got = predictor._pack_inputs_rle(rgb, depth, masks,
                                         rgb_codec=rgb_codec)
        assert ref is not None and got is not None
        np.testing.assert_array_equal(got, ref)


def test_pack_inputs_dense_native_matches_numpy(rng):
    cfg = MaskRefinerConfig(height=64, width=64, resnet_depth=14)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    rgb, depth, masks = _frames(rng, 64, 64, 2)
    ref = _numpy_packed(predictor, "_pack_inputs", rgb, depth, masks)
    got = predictor._pack_inputs(rgb, depth, masks)
    np.testing.assert_array_equal(got, ref)


def test_native_overflow_fallbacks_match_numpy(rng):
    cfg = MaskRefinerConfig(height=64, width=64, resnet_depth=14)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    rgb, depth, _ = _frames(rng, 64, 64, 0)
    # mask-run budget: a checkerboard exceeds max_in_runs
    checker = (np.indices((64, 64)).sum(0) % 2).astype(bool)
    assert predictor._pack_inputs_rle(rgb, depth, [checker] * 8) is None
    # rgb escape budget: uniform noise is incompressible
    noise = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    assert predictor._pack_inputs_rle(noise, depth, [], rgb_codec=True) is None
    # depth delta budget: native agrees with numpy (overflow iff the noisy
    # map's nonzero-delta count exceeds max_depth_nz, which depends on the
    # configured resolution)
    noisy = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    ref = _numpy_packed(predictor, "_pack_inputs_rle", rgb, noisy, [])
    got = predictor._pack_inputs_rle(rgb, noisy, [])
    if ref is None:
        assert got is None
    else:
        np.testing.assert_array_equal(got, ref)


def test_mask_runs_edge_cases():
    # first/last pixel set, multiple masks, non-bool dtypes
    flat = np.zeros((2, 4, 4), np.uint8)
    flat[0, 0, 0] = 255
    flat[1, 3, 3] = 7
    r = 8
    sb = np.empty(4 * r, np.uint8)
    eb = np.empty(4 * r, np.uint8)
    k = tn.mask_runs_encode(flat, r, 999, sb, eb)
    assert k == 2
    starts, ends = sb.view(np.uint32), eb.view(np.uint32)
    assert starts[0] == 0 and ends[0] == 1
    assert starts[1] == 31 and ends[1] == 32
    assert np.all(starts[2:] == 999) and np.all(ends[2:] == 999)


def test_rgb_nibble_escape_bytes_roundtrip(rng):
    # every residual class: step sizes 0..255 appear; decode is exercised by
    # the device tests, here we pin the escape bookkeeping
    h = w = 16
    rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    max_esc = 3 * h * w  # budget big enough for pure noise
    cap = 4 + 3 * h * w // 2 + max_esc
    out = np.empty(cap, np.uint8)
    n_esc = tn.rgb_nibble_encode(rgb, max_esc, out)
    assert 0 <= n_esc <= max_esc
    # numpy reference
    rgbp = np.ascontiguousarray(rgb.transpose(2, 0, 1)).reshape(-1)
    delta = rgbp.copy()
    delta[1:] -= rgbp[:-1]
    s = delta.view(np.int8)
    esc = (s < -7) | (s > 7)
    assert n_esc == int(esc.sum())
    np.testing.assert_array_equal(
        out[4 + 3 * h * w // 2 : 4 + 3 * h * w // 2 + n_esc], delta[esc]
    )
