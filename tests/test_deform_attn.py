"""ms_deform_attn vs a naive numpy bilinear-sampling oracle."""

import numpy as np
import jax.numpy as jnp

from quber_tpu.ops.deform_attn import ms_deform_attn


def naive_ms_deform_attn(value, spatial_shapes, locs, weights):
    b, s, nh, d = value.shape
    _, q, _, nl, p, _ = locs.shape
    out = np.zeros((b, q, nh, d), np.float64)
    offs = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]
    for bi in range(b):
        for qi in range(q):
            for hi in range(nh):
                for li, (h, w) in enumerate(spatial_shapes):
                    vmap = value[bi, offs[li]:offs[li] + h * w, hi].reshape(h, w, d)
                    for pi in range(p):
                        x = locs[bi, qi, hi, li, pi, 0] * w - 0.5
                        y = locs[bi, qi, hi, li, pi, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        dx, dy = x - x0, y - y0
                        acc = np.zeros(d)
                        for cx, cy, wt in [(x0, y0, (1-dx)*(1-dy)), (x0+1, y0, dx*(1-dy)),
                                           (x0, y0+1, (1-dx)*dy), (x0+1, y0+1, dx*dy)]:
                            if 0 <= cx < w and 0 <= cy < h:
                                acc += wt * vmap[cy, cx]
                        out[bi, qi, hi] += weights[bi, qi, hi, li, pi] * acc
    return out.reshape(b, q, nh * d)


def test_matches_naive_oracle(rng):
    b, nh, d, q, nl, p = 2, 2, 4, 5, 2, 3
    shapes = ((6, 8), (3, 4))
    s = sum(h * w for h, w in shapes)
    value = rng.randn(b, s, nh, d).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, (b, q, nh, nl, p, 2)).astype(np.float32)
    weights = rng.rand(b, q, nh, nl, p).astype(np.float32)
    weights /= weights.reshape(b, q, nh, -1).sum(-1)[..., None, None]

    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(locs), jnp.asarray(weights)))
    want = naive_ms_deform_attn(value, shapes, locs, weights)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_center_sample_recovers_value(rng):
    # sampling exactly at a pixel center returns that pixel's value
    h, w, d = 4, 4, 2
    value = rng.randn(1, h * w, 1, d).astype(np.float32)
    # pixel (row 1, col 2): normalized x = (2 + .5)/4, y = (1 + .5)/4
    locs = np.array([[[[[[(2 + 0.5) / 4, (1 + 0.5) / 4]]]]]], np.float32)
    weights = np.ones((1, 1, 1, 1, 1), np.float32)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), ((h, w),),
                                    jnp.asarray(locs), jnp.asarray(weights)))
    np.testing.assert_allclose(got[0, 0], value[0, 1 * w + 2, 0], atol=1e-6)


def test_out_of_range_is_zero(rng):
    value = rng.randn(1, 16, 1, 2).astype(np.float32)
    locs = np.full((1, 1, 1, 1, 1, 2), 5.0, np.float32)  # far outside
    weights = np.ones((1, 1, 1, 1, 1), np.float32)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), ((4, 4),),
                                    jnp.asarray(locs), jnp.asarray(weights)))
    np.testing.assert_array_equal(got, 0)
