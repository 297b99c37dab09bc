"""Photometric / geometric training augmentations.

Host-side augmentation toolkit covering the reference's
foreground_segmentation/data_augmentation.py (chromatic shift, blur,
rotation, Perlin depth distortion) and the SSD color augmentation used by
the refiner mapper. All functions are numpy/cv2 (loader processes);
Perlin lives in quber_tpu.data.perlin.
"""

from __future__ import annotations

import numpy as np


def chromatic_shift(rgb: np.ndarray, rng, d_h=0.1, d_s=0.2, d_l=0.2) -> np.ndarray:
    """Random hue/saturation/lightness shift (data_augmentation.py flavor)."""
    import cv2

    hls = cv2.cvtColor(rgb, cv2.COLOR_BGR2HLS).astype(np.float32)
    hls[..., 0] = (hls[..., 0] + rng.uniform(-d_h, d_h) * 180) % 180
    hls[..., 1] = np.clip(hls[..., 1] * (1 + rng.uniform(-d_l, d_l)), 0, 255)
    hls[..., 2] = np.clip(hls[..., 2] * (1 + rng.uniform(-d_s, d_s)), 0, 255)
    return cv2.cvtColor(hls.astype(np.uint8), cv2.COLOR_HLS2BGR)


def gaussian_blur(rgb: np.ndarray, rng, max_sigma=1.8) -> np.ndarray:
    import cv2

    sigma = rng.uniform(0.3, max_sigma)
    return cv2.GaussianBlur(rgb, (0, 0), sigma)


def add_gaussian_noise(rgb: np.ndarray, rng, max_std=12.0) -> np.ndarray:
    noise = rng.randn(*rgb.shape) * rng.uniform(2.0, max_std)
    return np.clip(rgb.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def random_rotation(images: list, rng, max_deg=15.0, nearest: list | None = None):
    """Rotate a list of aligned images by the same random angle; `nearest`
    flags per image select nearest-neighbor interpolation (labels/depth)."""
    import cv2

    angle = rng.uniform(-max_deg, max_deg)
    h, w = images[0].shape[:2]
    mat = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    out = []
    for i, img in enumerate(images):
        interp = (
            cv2.INTER_NEAREST
            if nearest and nearest[i]
            else cv2.INTER_LINEAR
        )
        out.append(cv2.warpAffine(img, mat, (w, h), flags=interp))
    return out


def copy_paste(
    rgb: np.ndarray, depth: np.ndarray, masks: np.ndarray,
    donor_rgb: np.ndarray, donor_depth: np.ndarray, donor_masks: np.ndarray,
    rng, max_paste: int = 3, paired_masks=None, donor_paired=None,
):
    """Copy-paste augmentation (tools/ours copy-paste flavor): paste up to
    `max_paste` donor instances at random offsets; occluded pixels of
    existing masks are cleared.

    paired_masks/donor_paired: an optional second mask stack kept aligned
    with the scene (the training mapper's *perturbed* initial masks): each
    pasted donor instance also pastes the donor's paired pixels inside its
    region as a new paired mask, and occludes the existing paired masks —
    so perturbed-input / error-map targets can be regenerated coherently
    after pasting. Returns (rgb, depth, masks[, paired])."""
    rgb = rgb.copy()
    depth = depth.copy()
    masks = [m.copy() for m in masks]
    paired = None if paired_masks is None else [p.copy() for p in paired_masks]
    h, w = rgb.shape[:2]
    n = min(max_paste, len(donor_masks))
    order = rng.permutation(len(donor_masks))[:n]
    for i in order:
        m = donor_masks[i].astype(bool)
        if not m.any():
            continue
        ys, xs = np.nonzero(m)
        dy = rng.randint(-ys.min(), h - 1 - ys.max()) if ys.max() < h - 1 else 0
        dx = rng.randint(-xs.min(), w - 1 - xs.max()) if xs.max() < w - 1 else 0
        shifted = np.zeros_like(m)
        shifted[ys + dy, xs + dx] = True
        rgb[shifted] = donor_rgb[m]
        depth[shifted] = donor_depth[m]
        for mm in masks:
            mm[shifted] = 0
        masks.append(shifted.astype(np.uint8))
        if paired is not None:
            for pp in paired:
                pp[shifted] = 0
            newp = np.zeros_like(m)
            for dp in (donor_paired if donor_paired is not None else ()):
                sel = dp.astype(bool) & m
                if sel.any():
                    sy, sx = np.nonzero(sel)
                    newp[sy + dy, sx + dx] = True
            if newp.any():
                paired.append(newp.astype(np.uint8))
    masks = [m for m in masks if m.sum() > 16]
    masks = np.asarray(masks) if masks else np.zeros((0, h, w), np.uint8)
    if paired is None:
        return rgb, depth, masks
    paired = [p for p in paired if p.sum() > 16]
    paired = np.asarray(paired) if paired else np.zeros((0, h, w), np.uint8)
    return rgb, depth, masks, paired
