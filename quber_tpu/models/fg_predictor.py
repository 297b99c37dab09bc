"""Foreground-segmenter predictors (CGNet 320x240 / LMFFNet 640x480).

Rebuild of /root/reference/foreground_segmentation/predictor.py:21-99 with
the preprocessing (ImageNet standardization, depth normalize + inpaint) on
the host and the network as one jitted NHWC program.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from quber_tpu.ops.preprocess import inpaint_depth, normalize_depth, standardize_image


def _load_rgbd(rgb_path, depth_path, size):
    import cv2
    import imageio.v2 as imageio

    w, h = size
    rgb = cv2.imread(rgb_path)
    rgb = cv2.resize(rgb, (w, h))
    if depth_path.endswith(".npy"):
        depth = np.load(depth_path)
        depth = normalize_depth(depth, 0.25, 1.5)
    else:
        depth = np.asarray(imageio.imread(depth_path))
        depth = normalize_depth(depth)
    depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
    depth = inpaint_depth(depth)
    return rgb, depth


class CGNetPredictor:
    """4-ch (RGB + depth/255) at 320x240; argmax over 2 classes; nearest
    upsample to 640x480 (predictor.py:21-52)."""

    def __init__(self, params=None, seed: int = 0):
        from quber_tpu.models.cgnet import CGNet

        self.model = CGNet(classes=2, in_channels=4)
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, 240, 320, 4))
            )
        self.variables = params
        self._fwd = jax.jit(
            lambda v, x: jnp.argmax(self.model.apply(v, x), axis=-1).astype(jnp.uint8)
        )

    def predict(self, rgb_path, depth_path):
        import cv2

        rgb, depth = _load_rgbd(rgb_path, depth_path, (320, 240))
        x = np.concatenate(
            [standardize_image(rgb), depth[:, :, 0:1].astype(np.float32) / 255.0],
            axis=-1,
        )
        out = np.asarray(self._fwd(self.variables, jnp.asarray(x[None])))[0]
        return cv2.resize(out, (640, 480), interpolation=cv2.INTER_NEAREST) > 0


class LMFFNetPredictor:
    """6-ch (RGB + 3x depth/255) at 640x480; class 2 = object foreground
    (predictor.py:57-99)."""

    def __init__(self, params=None, seed: int = 0):
        from quber_tpu.models.lmffnet import LMFFNet

        self.model = LMFFNet(classes=3)
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, 480, 640, 6))
            )
        self.variables = params
        self._fwd = jax.jit(
            lambda v, x: jnp.argmax(self.model.apply(v, x), axis=-1).astype(jnp.uint8)
        )

    def predict(self, rgb_path, depth_path):
        rgb, depth = _load_rgbd(rgb_path, depth_path, (640, 480))
        x = np.concatenate(
            [standardize_image(rgb), depth.astype(np.float32) / 255.0], axis=-1
        )
        out = np.asarray(self._fwd(self.variables, jnp.asarray(x[None])))[0]
        return out == 2
