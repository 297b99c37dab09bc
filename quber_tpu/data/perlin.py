"""Perlin-style depth distortion (sensor-noise simulation).

Re-creates the training-time depth augmentation of
/root/reference/maskrefiner/data/dataset_mappers/augmentation.py:20-47
(pyfastnoisesimd Perlin flow-field warp + additive noise) without the
pyfastnoisesimd dependency: gradient-noise fields are synthesized with
bicubically upsampled random lattices, used both to warp the depth map
(flow field) and as additive noise.
"""

from __future__ import annotations

import numpy as np


def value_noise(rng, h: int, w: int, res: int = 8) -> np.ndarray:
    """Smooth noise in [-1, 1] from a res x res lattice, bicubic upsampled."""
    import cv2

    lattice = rng.rand(res + 1, res + 1).astype(np.float32) * 2 - 1
    return cv2.resize(lattice, (w, h), interpolation=cv2.INTER_CUBIC)


def perlin_distortion(
    depth: np.ndarray,
    rng=None,
    warp_scale: float = 20.0,
    noise_scale: float = 10.0,
    res: int = 8,
) -> np.ndarray:
    """Warp + additively perturb a depth map [H, W] (mm or normalized)."""
    import cv2

    rng = rng or np.random.RandomState(0)
    h, w = depth.shape[:2]
    flow_x = value_noise(rng, h, w, res) * warp_scale
    flow_y = value_noise(rng, h, w, res) * warp_scale
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    warped = cv2.remap(
        depth.astype(np.float32),
        xs + flow_x,
        ys + flow_y,
        interpolation=cv2.INTER_NEAREST,
        borderMode=cv2.BORDER_REPLICATE,
    )
    noise = value_noise(rng, h, w, res * 2) * noise_scale
    out = warped + noise
    # zero-depth (invalid) pixels stay invalid
    out[depth == 0] = 0
    return out.astype(depth.dtype)
