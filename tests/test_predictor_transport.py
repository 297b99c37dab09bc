"""Packed-transfer paths: RLE codec, mono-depth packing, stream equivalence."""

import numpy as np
import jax.numpy as jnp

from quber_tpu.models.mask_refiner import MaskRefinerConfig
from quber_tpu.predictor import MaskRefinerPredictor, rle_decode, rle_encode_device


def test_rle_roundtrip_blobby():
    rng = np.random.RandomState(3)
    # runny map: few labels, long runs (like a grouped panoptic map)
    flat = np.repeat(rng.randint(0, 9, size=200), rng.randint(1, 400, size=200))
    packed, n_runs = rle_encode_device(jnp.asarray(flat.astype(np.int32)), 512)
    n = int(n_runs)
    assert n <= 512
    out = rle_decode(np.asarray(packed), n, flat.size)
    np.testing.assert_array_equal(out, flat)


def test_rle_roundtrip_single_run():
    flat = np.full(1000, 7, np.int32)
    packed, n_runs = rle_encode_device(jnp.asarray(flat), 16)
    assert int(n_runs) == 1
    np.testing.assert_array_equal(rle_decode(np.asarray(packed), 1, 1000), flat)


def test_rle_overflow_reports_true_count():
    # alternating values: every pixel is a run -> overflows any small budget
    flat = (np.arange(1000) % 2).astype(np.int32)
    packed, n_runs = rle_encode_device(jnp.asarray(flat), 64)
    assert int(n_runs) == 1000  # caller sees the overflow and falls back


def _make_frames(rng, h, w, n_frames, n_masks=2):
    from tests.conftest import random_blobs

    frames = []
    for _ in range(n_frames):
        rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        depth1 = (rng.rand(h, w) * 255).astype(np.uint8)
        depth = np.repeat(depth1[..., None], 3, axis=-1)  # replicated, as in
        # the reference's normalize_depth (eval/preprocess_utils.py:12-28)
        masks = random_blobs(rng, n_masks, h, w, min_r=4, max_r=7)
        frames.append((rgb, depth, list(masks)))
    return frames


def test_stream_rle_matches_raw_and_packed(rng):
    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    frames = _make_frames(rng, h, w, 5)

    single = [predictor.predict_packed(*f) for f in frames]
    raw = list(predictor.predict_batch_stream(frames, batch_size=2, use_rle=False))
    rle = list(predictor.predict_batch_stream(frames, batch_size=2, use_rle=True))
    assert len(raw) == len(rle) == 5
    for (p1, c1, s1), (p2, c2, s2), (p3, c3, s3) in zip(single, raw, rle):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(p1, p3)
        assert c1 == c2 == c3
        np.testing.assert_allclose(s1, s2, rtol=1e-6)
        np.testing.assert_allclose(s1, s3, rtol=1e-6)


def test_stream_inline_matches_threaded_and_overflow_fallback(rng):
    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    # tiny run budget: every frame overflows -> exercises the bulk raw-map
    # fallback inside drain (random params produce fragmented maps anyway)
    predictor.max_rle_runs = 8
    predictor._rle_bytes = 4 + 4 * 8 + 1 + 4 * predictor._scores_len
    frames = _make_frames(rng, h, w, 5)

    inline = list(
        predictor.predict_batch_stream(frames, batch_size=2, use_rle=True, prefetch=0)
    )
    threaded = list(
        predictor.predict_batch_stream(frames, batch_size=2, use_rle=True, prefetch=2)
    )
    assert len(inline) == len(threaded) == 5
    for (p1, c1, s1), (p2, c2, s2) in zip(inline, threaded):
        np.testing.assert_array_equal(p1, p2)
        assert c1 == c2
        np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_rle_input_matches_dense_input(rng):
    import jax.numpy as jnp

    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    frames = _make_frames(rng, h, w, 3, n_masks=3)

    # device-side decode parity: RLE buffer unpacks to the same image/masks
    rgb, depth, masks = frames[0]
    dense = predictor._pack_inputs(rgb, depth, masks)
    rle = predictor._pack_inputs_rle(rgb, depth, masks)
    assert rle is not None and rle.size == predictor._in_bytes_rle
    di, dm, dv = predictor._unpack_buf(jnp.asarray(dense))
    ri, rm, rv = predictor._unpack_buf_rle(jnp.asarray(rle))
    np.testing.assert_array_equal(np.asarray(di), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(dm), np.asarray(rm))
    np.testing.assert_array_equal(np.asarray(dv), np.asarray(rv))

    # end-to-end stream parity across input layouts
    a = list(predictor.predict_batch_stream(frames, batch_size=2, input_rle=False))
    b = list(predictor.predict_batch_stream(frames, batch_size=2, input_rle=True))
    for (p1, c1, s1), (p2, c2, s2) in zip(a, b):
        np.testing.assert_array_equal(p1, p2)
        assert c1 == c2
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    # run-budget overflow falls back to None (dense layout)
    checker = np.indices((h, w)).sum(0) % 2  # worst case: every pixel a run
    assert predictor._pack_inputs_rle(rgb, depth, [checker] * 8) is None


def test_sharded_stream_matches_single_device(rng):
    # multi-chip serving path: batch sharded over the 8-device virtual mesh
    # must reproduce the single-device stream exactly
    import jax

    from quber_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    frames = _make_frames(rng, h, w, 8)
    mesh = make_mesh(jax.devices()[:8])

    single = list(predictor.predict_batch_stream(frames, batch_size=8, use_rle=False))
    sharded = list(
        predictor.predict_batch_stream(frames, batch_size=8, use_rle=False, mesh=mesh)
    )
    assert len(single) == len(sharded) == 8
    for (p1, c1, s1), (p2, c2, s2) in zip(single, sharded):
        np.testing.assert_array_equal(p1, p2)
        assert c1 == c2
        np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_packed_mono_depth_matches_full_pipeline(rng):
    # the packed path stores depth as one channel; with replicated input
    # depth it must agree with the unpacked pipeline exactly
    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    (rgb, depth, masks), = _make_frames(rng, h, w, 1)

    pan_packed, count_packed, _ = predictor.predict_packed(rgb, depth, masks)

    image = np.concatenate([rgb, depth], axis=-1).astype(np.float32)
    mask_arr = np.zeros((8, h, w), bool)
    for i, m in enumerate(masks):
        mask_arr[i] = m > 0
    valid = np.zeros((8,), bool)
    valid[: len(masks)] = True
    out = predictor._pipeline(
        predictor.params, jnp.asarray(image), jnp.asarray(mask_arr), jnp.asarray(valid)
    )
    np.testing.assert_array_equal(pan_packed, np.asarray(out["panoptic_seg"]))
    assert count_packed == int(out["num_instances"])


def test_aot_export_roundtrip(rng, tmp_path):
    # jax.export serialization of the batched pipeline: the deserialized
    # artifact must reproduce the live pipeline exactly (serving path)
    import sys
    import subprocess

    import jax
    import jax.export
    import jax.numpy as jnp
    from functools import partial

    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    fn = jax.jit(partial(predictor._pipeline_packed_batch_impl, input_rle=True))
    buf_spec = jax.ShapeDtypeStruct((2, predictor._in_bytes_rle), jnp.uint8)
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), predictor.params
    )
    blob = jax.export.export(fn)(param_specs, buf_spec).serialize()

    frames = _make_frames(rng, h, w, 2)
    bufs = jnp.asarray(np.stack([predictor._pack_inputs_rle(*f) for f in frames]))
    got = jax.export.deserialize(blob).call(predictor.params, bufs)
    want = fn(predictor.params, bufs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rgb_nibble_codec_roundtrip_and_fallback(rng):
    # camera-like RGB (smooth signal + small sensor noise) travels through
    # the 4-bit delta codec exactly; full-entropy RGB overflows the escape
    # budget and the stream falls back to the raw-RGB RLE layout, setting
    # the sticky skip flag
    import jax

    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    ys, xs = np.mgrid[:h, :w]
    rgb = np.clip(
        np.stack([60 + ys * 0.3, 90 + xs * 0.2, 120 + 0.0 * ys], -1)
        + rng.randn(h, w, 3) * 2,
        0, 255,
    ).astype(np.uint8)
    depth = np.clip(60 + 120 * ys / h, 0, 255).astype(np.uint8)
    masks = [(ys - 30) ** 2 + (xs - 30) ** 2 <= 100]

    buf = predictor._pack_inputs_rle(rgb, depth, masks, rgb_codec=True)
    assert buf is not None and buf.size == predictor._in_bytes_rlec
    assert predictor._in_bytes_rlec < predictor._in_bytes_rle
    image, dmasks, _ = jax.jit(
        lambda b: predictor._unpack_buf_rle(b, rgb_codec=True)
    )(jnp.asarray(buf))
    np.testing.assert_array_equal(np.asarray(image)[..., :3], rgb.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(image)[..., 3], depth.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(dmasks)[0], masks[0])

    # end-to-end parity: codec stream == dense-input stream
    frames = [(rgb, depth, masks)] * 3
    a = list(predictor.predict_batch_stream(frames, batch_size=2, input_rle=False))
    b = list(predictor.predict_batch_stream(frames, batch_size=2, input_rle=True))
    assert predictor._rgb_codec_ok  # codec path was used, no fallback
    for (p1, c1, s1), (p2, c2, s2) in zip(a, b):
        np.testing.assert_array_equal(p1, p2)
        assert c1 == c2
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    # incompressible RGB: per-frame overflow -> raw-RGB layout; the codec
    # tiers disarm only after 3 consecutive over-budget BATCHES (one
    # outlier frame must not push a compressible stream to raw for good),
    # so 6 noise frames at batch_size=2 = 3 strikes = disarm
    noise = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    assert predictor._pack_inputs_rle(noise, depth, masks, rgb_codec=True) is None
    frames_n = [(noise, depth, masks)] * 6
    c = list(predictor.predict_batch_stream(frames_n, batch_size=2, input_rle=True))
    assert predictor._rgb_codec5_strikes >= 3 or not predictor._rgb_codec5_ok
    assert not predictor._rgb_codec_ok and not predictor._rgb_codec5_ok
    d = list(predictor.predict_batch_stream(frames_n, batch_size=2, input_rle=False))
    for (p1, c1, s1), (p2, c2, s2) in zip(c, d):
        np.testing.assert_array_equal(p1, p2)
        assert c1 == c2
        np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_rgb_5bit_codec_roundtrip_and_negotiation(rng):
    # textured RGB whose residuals blow the 4-bit escape budget but fit
    # 5-bit fields: the negotiation must land on "codec5" (not raw), the
    # device decode must reproduce the pixels exactly, and the wire must
    # be smaller than the raw-RGB RLE layout
    import jax

    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    ys, xs = np.mgrid[:h, :w]
    # texture amplitude 6 -> planar first-differences up to ~10.4 LSB
    # (d/dx of 6 sin(2.1x) is 12.6): escapes 4-bit ([-7, 7]) on ~1/3 of
    # pixels (over its 12.5% budget) but sits inside 5-bit ([-15, 15])
    # essentially everywhere
    tex = 6.0 * np.sin(xs * 2.1) * np.cos(ys * 1.7)
    rgb = np.clip(
        np.stack([90 + tex, 120 + tex, 60 - tex], -1) + rng.randn(h, w, 3) * 2,
        0, 255,
    ).astype(np.uint8)
    depth = np.clip(60 + 120 * ys / h, 0, 255).astype(np.uint8)
    masks = [(ys - 30) ** 2 + (xs - 30) ** 2 <= 100]

    # 4-bit overflows, 5-bit holds
    assert predictor._pack_inputs_rle(rgb, depth, masks, rgb_codec=4) is None
    buf = predictor._pack_inputs_rle(rgb, depth, masks, rgb_codec=5)
    assert buf is not None and buf.size == predictor._in_bytes_rlec5
    assert predictor._in_bytes_rlec5 < predictor._in_bytes_rle

    image, dmasks, _ = jax.jit(
        lambda b: predictor._unpack_buf_rle(b, rgb_codec=5)
    )(jnp.asarray(buf))
    np.testing.assert_array_equal(
        np.asarray(image)[..., :3], rgb.astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(image)[..., 3], depth.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(dmasks)[0], masks[0])

    # negotiation: batch path picks codec5 and end-to-end matches dense
    mode, stacked, real = predictor._pack_batch(
        [(rgb, depth, masks)] * 2, 2, input_rle=True)
    assert mode == "codec5" and real == 2
    frames = [(rgb, depth, masks)] * 3
    a = list(predictor.predict_batch_stream(frames, batch_size=2,
                                            input_rle=False))
    b = list(predictor.predict_batch_stream(frames, batch_size=2,
                                            input_rle=True))
    assert predictor._rgb_codec5_ok
    for (p1, c1, s1), (p2, c2, s2) in zip(a, b):
        np.testing.assert_array_equal(p1, p2)
        assert c1 == c2
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    # full-entropy RGB still falls through codec5 to the raw layout; a
    # single over-budget batch must NOT disarm the codec (3-strike rule),
    # so a later compressible batch re-engages codec5
    noise = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    assert predictor._pack_inputs_rle(noise, depth, masks, rgb_codec=5) is None
    mode, _, _ = predictor._pack_batch(
        [(noise, depth, masks)] * 2, 2, input_rle=True)
    assert mode is True  # raw-RGB RLE layout
    assert predictor._rgb_codec5_ok  # one strike: still armed
    mode, _, _ = predictor._pack_batch(
        [(rgb, depth, masks)] * 2, 2, input_rle=True)
    assert mode == "codec5" and predictor._rgb_codec5_strikes == 0
    for _ in range(3):  # three consecutive raw batches disarm the tier
        mode, _, _ = predictor._pack_batch(
            [(noise, depth, masks)] * 2, 2, input_rle=True)
        assert mode is True
    assert not predictor._rgb_codec5_ok and not predictor._rgb_codec_ok


def test_rgb_5bit_native_matches_numpy(rng):
    # the C++ single-pass encoder must be byte-identical to the numpy body
    from quber_tpu import transport_native as tn

    if not tn.available():
        import pytest

        pytest.skip("native codec lib unavailable")
    h = w = 48
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=4)
    ys, xs = np.mgrid[:h, :w]
    tex = 6.0 * np.sin(xs * 2.1) * np.cos(ys * 1.7)
    rgb = np.clip(
        np.stack([90 + tex, 120 + tex, 60 - tex], -1) + rng.randn(h, w, 3) * 2,
        0, 255,
    ).astype(np.uint8)

    native = np.empty((predictor._rgb_codec5_block,), np.uint8)
    ne = tn.rgb_5bit_encode(rgb, predictor.max_rgb_esc5, native)
    assert ne is not None and ne >= 0

    # numpy fallback body, forced
    import unittest.mock as mock

    with mock.patch.object(
        type(predictor)._encode_rgb_5bit.__globals__["_native"],
        "available", lambda: False,
    ):
        ref = predictor._encode_rgb_5bit(rgb)
    np.testing.assert_array_equal(native, ref)

    # overflow parity: full-entropy rgb -> -1 native, None numpy
    noise = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    assert tn.rgb_5bit_encode(noise, predictor.max_rgb_esc5, native) == -1
    with mock.patch.object(
        type(predictor)._encode_rgb_5bit.__globals__["_native"],
        "available", lambda: False,
    ):
        assert predictor._encode_rgb_5bit(noise) is None


def test_staged_stream_matches_host_stream(rng):
    # stage_frames + predict_batch_stream_staged (HBM-resident inputs, the
    # benchmark's timed path) must produce exactly what the host-streaming
    # path produces, including the padded last partial batch
    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    ys, xs = np.mgrid[:h, :w]
    frames = []
    for i in range(5):  # batch_size 2 -> last batch is padded
        rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        depth = np.clip(40 + 150 * ys / h + i, 0, 255).astype(np.uint8)
        masks = [(ys - 20 - 3 * i) ** 2 + (xs - 30) ** 2 <= 80 + 10 * i]
        frames.append((rgb, depth, masks))

    a = list(predictor.predict_batch_stream(frames, batch_size=2,
                                            use_rle=False))
    staged = predictor.stage_frames(frames, batch_size=2)
    b = list(predictor.predict_batch_stream_staged(staged, use_rle=False))
    assert len(a) == len(b) == 5
    for (p1, c1, s1), (p2, c2, s2) in zip(a, b):
        np.testing.assert_array_equal(p1, p2)
        assert c1 == c2
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    # staged batches are reusable: a second pass gives identical results
    c = list(predictor.predict_batch_stream_staged(staged, use_rle=False))
    for (p1, _, _), (p2, _, _) in zip(b, c):
        np.testing.assert_array_equal(p1, p2)


def test_depth_delta_codec_and_bitplane_roundtrip(rng):
    # depth travels delta-coded (sparse mod-256 nonzeros) and the raw
    # panoptic map travels as bitplanes; both must round-trip exactly
    import jax

    h = w = 64
    cfg = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False)
    predictor = MaskRefinerPredictor(cfg, max_instances=8)
    ys = np.mgrid[:h, :w][0]
    smooth = np.clip(60.0 + 120.0 * ys / h, 0, 255).astype(np.uint8)
    smooth[20:40, 20:40] -= 17  # object silhouette
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    masks = [np.zeros((h, w), bool)]
    masks[0][10:30, 10:30] = True

    for depth in (smooth, np.zeros((h, w), np.uint8),
                  np.full((h, w), 255, np.uint8)):
        buf = predictor._pack_inputs_rle(rgb, depth, masks)
        assert buf is not None
        image, dmasks, valid = jax.jit(predictor._unpack_buf_rle)(
            jnp.asarray(buf)
        )
        np.testing.assert_array_equal(
            np.asarray(image)[..., 3], depth.astype(np.float32)
        )
        np.testing.assert_array_equal(np.asarray(dmasks)[0], masks[0])

    # noisy depth exceeds the sparse budget -> dense fallback signalled
    noisy = (rng.rand(h, w) * 255).astype(np.uint8)
    if np.count_nonzero(np.diff(noisy.reshape(-1).astype(np.int16))) > \
            predictor.max_depth_nz:
        assert predictor._pack_inputs_rle(rgb, noisy, masks) is None

    # bitplane pan pack/unpack round trip at the id ceiling
    pan = (rng.rand(h * w) * (predictor.max_instances + 2)).astype(np.int32)
    packed = np.asarray(jax.jit(predictor._pack_pan_planes)(jnp.asarray(pan)))
    assert packed.size == predictor._pan_bytes
    np.testing.assert_array_equal(predictor._unpack_pan_planes(packed), pan)
