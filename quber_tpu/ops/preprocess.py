"""RGB-D preprocessing: depth normalization, inpainting, standardization.

Host (numpy/cv2) and device (jnp) variants of the reference's
/root/reference/eval/preprocess_utils.py. The host variants are bit-exact with
the reference pipeline (cv2 Telea inpaint); the device variants are jit-safe
approximations used when the whole pipeline must stay on-chip.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host (exact) variants
# ---------------------------------------------------------------------------

def normalize_depth(depth: np.ndarray, min_val: float = 250.0, max_val: float = 1500.0) -> np.ndarray:
    """mm depth [H, W] -> uint8 [H, W, 3] in 0..255 (preprocess_utils.py:12-28)."""
    depth = np.asarray(depth, dtype=np.float64).copy()
    depth[depth < min_val] = min_val
    depth[depth > max_val] = max_val
    depth = (depth - min_val) / (max_val - min_val) * 255
    if depth.ndim == 2:
        depth = depth[..., None]
    return np.uint8(np.repeat(depth, 3, -1))


def unnormalize_depth(depth: np.ndarray, min_val: float = 250.0, max_val: float = 1500.0) -> np.ndarray:
    """uint8 [H, W, 3] 0..255 -> mm depth (preprocess_utils.py:30-41)."""
    depth = np.float32(depth) / 255
    return depth * (max_val - min_val) + min_val


def inpaint_depth(depth: np.ndarray, factor: int = 1, kernel_size: int = 3, dilate: bool = True) -> np.ndarray:
    """Telea-inpaint zero-depth holes of a normalized uint8 depth [H, W, 3].

    Host-exact path mirroring preprocess_utils.py:44-64 (cv2.INPAINT_TELEA over
    the dilated zero mask, pasted back where the original depth was zero).
    """
    import cv2

    h, w, _ = depth.shape
    resized = cv2.resize(depth, (w // factor, h // factor))
    mask = np.all(resized == 0, axis=2).astype(np.uint8)
    if dilate:
        mask = cv2.dilate(mask, np.ones((kernel_size, kernel_size), np.uint8), iterations=1)
    inpainted = cv2.inpaint(resized, mask, kernel_size, cv2.INPAINT_TELEA)
    inpainted = cv2.resize(inpainted, (w, h))
    return np.where(depth == 0, inpainted, depth)


def standardize_image(image: np.ndarray) -> np.ndarray:
    """uint8 RGB [H, W, 3] -> ImageNet-standardized float32 (preprocess_utils.py:82-93)."""
    mean = np.array([0.485, 0.456, 0.406], dtype=np.float32)
    std = np.array([0.229, 0.224, 0.225], dtype=np.float32)
    return (np.asarray(image, dtype=np.float32) / 255.0 - mean) / std


def compute_xyz(depth_img: np.ndarray, camera_params: dict) -> np.ndarray:
    """Ordered point cloud [H, W, 3] from metric depth (preprocess_utils.py:96-138).

    Left-handed camera frame: x right, y up, z forward; y pixel indices are
    flipped so they start at the bottom-left as in the reference.
    """
    if "fx" in camera_params and "fy" in camera_params:
        fx, fy = camera_params["fx"], camera_params["fy"]
    else:
        aspect = camera_params["img_width"] / camera_params["img_height"]
        e = 1 / np.tan(np.radians(camera_params["fov"] / 2.0))
        t = camera_params["near"] / e
        r = t * aspect
        alpha = camera_params["img_width"] / (2 * r)
        fx = fy = camera_params["near"] * alpha

    x_offset = camera_params.get("x_offset", camera_params["img_width"] / 2)
    y_offset = camera_params.get("y_offset", camera_params["img_height"] / 2)

    h, w = depth_img.shape
    ys, xs = np.indices((h, w), dtype=np.float32)
    ys = np.flipud(ys)
    z = depth_img
    x = (xs - x_offset) * z / fx
    y = (ys - y_offset) * z / fy
    return np.stack([x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# Device (jit-safe) variants
# ---------------------------------------------------------------------------

def normalize_depth_jax(depth: jnp.ndarray, min_val: float = 250.0, max_val: float = 1500.0) -> jnp.ndarray:
    """mm depth [H, W] -> float32 [H, W, 3] in 0..255 (device variant)."""
    d = jnp.clip(depth.astype(jnp.float32), min_val, max_val)
    d = (d - min_val) / (max_val - min_val) * 255.0
    return jnp.repeat(d[..., None], 3, axis=-1)


@partial(jax.jit, static_argnames=("iterations",))
def inpaint_depth_jax(depth: jnp.ndarray, iterations: int = 32) -> jnp.ndarray:
    """Fill zero-depth holes by iterative masked 3x3 diffusion, on device.

    A jit-friendly stand-in for Telea inpainting (which has no XLA analog —
    SURVEY §7 hard part 6): each step replaces hole pixels with the mean of
    their valid 3x3 neighbours, growing inward from the hole rim. Converges to
    a smooth harmonic fill; metric impact vs Telea is validated in tests.

    depth: [H, W] or [H, W, C] float; zeros are holes.
    """
    squeeze = depth.ndim == 2
    d = depth.astype(jnp.float32)
    if squeeze:
        d = d[..., None]
    valid = (jnp.max(d, axis=-1, keepdims=True) > 0).astype(jnp.float32)

    kernel = jnp.ones((3, 3, 1, 1), jnp.float32)

    def conv(x):
        # depthwise 3x3 box filter per channel via feature-group conv
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x[None],
            jnp.tile(kernel, (1, 1, 1, c)),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )[0]

    def body(_, state):
        d, valid = state
        s = conv(d * valid)
        n = conv(valid)
        fill = s / jnp.maximum(n, 1.0)
        new_valid = jnp.clip(n, 0.0, 1.0)
        d = jnp.where(valid > 0, d, fill)
        valid = jnp.maximum(valid, jnp.where(n > 0, 1.0, 0.0) * new_valid)
        return d, valid

    d, _ = jax.lax.fori_loop(0, iterations, body, (d, valid))
    if squeeze:
        d = d[..., 0]
    return d


def standardize_image_jax(image: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
    return (image.astype(jnp.float32) / 255.0 - mean) / std


def compute_xyz_jax(depth_img: jnp.ndarray, fx: float, fy: float, x_offset: float, y_offset: float) -> jnp.ndarray:
    h, w = depth_img.shape
    ys = jnp.flip(jax.lax.broadcasted_iota(jnp.float32, (h, w), 0), axis=0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    z = depth_img.astype(jnp.float32)
    return jnp.stack([(xs - x_offset) * z / fx, (ys - y_offset) * z / fy, z], axis=-1)
