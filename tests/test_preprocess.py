import numpy as np
import jax.numpy as jnp

from quber_tpu.ops import preprocess as P


def test_normalize_depth_roundtrip(rng):
    depth = rng.uniform(100, 2000, (48, 64)).astype(np.float32)
    norm = P.normalize_depth(depth.copy())
    assert norm.shape == (48, 64, 3) and norm.dtype == np.uint8
    # in-range values round-trip within quantization error
    mm = P.unnormalize_depth(norm)
    inr = (depth > 250) & (depth < 1500)
    assert np.abs(mm[..., 0][inr] - depth[inr]).max() < (1500 - 250) / 255 + 1e-3


def test_normalize_depth_jax_matches_host(rng):
    depth = rng.uniform(100, 2000, (48, 64)).astype(np.float32)
    host = P.normalize_depth(depth.copy()).astype(np.float32)
    dev = np.asarray(P.normalize_depth_jax(jnp.asarray(depth)))
    # host path quantizes to uint8 (truncation); device path stays float
    assert np.abs(host - dev).max() <= 1.0


def test_inpaint_depth_fills_holes(rng):
    depth = P.normalize_depth(rng.uniform(300, 1400, (48, 64)).astype(np.float32))
    depth[20:28, 30:40] = 0
    out = P.inpaint_depth(depth)
    assert np.all(out[20:28, 30:40] > 0)
    # untouched pixels unchanged
    mask = np.all(depth == 0, axis=-1)
    np.testing.assert_array_equal(out[~mask], depth[~mask])


def test_inpaint_depth_jax_fills_holes(rng):
    depth = rng.uniform(300, 1400, (48, 64)).astype(np.float32)
    depth[20:28, 30:40] = 0
    out = np.asarray(P.inpaint_depth_jax(jnp.asarray(depth)))
    assert np.all(out[20:28, 30:40] > 0)
    valid = depth > 0
    np.testing.assert_allclose(out[valid], depth[valid])
    # filled values stay within the valid range of neighbours
    assert out.min() >= depth[valid].min() - 1
    assert out.max() <= depth[valid].max() + 1


def test_standardize_image(rng):
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    host = P.standardize_image(img)
    dev = np.asarray(P.standardize_image_jax(jnp.asarray(img)))
    np.testing.assert_allclose(host, dev, atol=1e-5)


def test_compute_xyz(rng):
    depth = rng.uniform(0.3, 1.5, (48, 64)).astype(np.float32)
    params = {"fx": 550.0, "fy": 550.0, "x_offset": 32.0, "y_offset": 24.0,
              "img_width": 64, "img_height": 48}
    host = P.compute_xyz(depth, params)
    dev = np.asarray(P.compute_xyz_jax(jnp.asarray(depth), 550.0, 550.0, 32.0, 24.0))
    np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(host[..., 2], depth)
