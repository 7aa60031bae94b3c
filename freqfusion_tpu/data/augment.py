"""Paired geometric augmentation for SR training (numpy, host-side).

Semantics follow the reference's SRTrainAugmentation / CachedSRDataset
augmentation (src/data/augmentations.py:26-178, src/data/cached_dataset.py
:228-282): LR, HR, and any expert images/features receive the *same*
geometric transform (hflip / vflip / k*90-degree rotation); color jitter is
not applied in cached mode because it would invalidate cached expert
outputs (cached_dataset.py:36-37).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["paired_random_crop", "paired_geometric_augment", "apply_geometry",
           "invert_geometry", "crop_and_transform", "paired_color_jitter", "cutblur", "frequency_augment"]

try:
    from ._native import NATIVE_AVAILABLE, crop_geom
except ImportError:  # pragma: no cover
    NATIVE_AVAILABLE, crop_geom = False, None


def crop_and_transform(x: np.ndarray, top: int, left: int, h: int, w: int,
                       hflip: bool, vflip: bool, rot_k: int) -> np.ndarray:
    """Fused crop + dihedral transform (C fast path, numpy fallback)."""
    if (NATIVE_AVAILABLE and x.dtype == np.float32
            and x.flags["C_CONTIGUOUS"]):
        return crop_geom(x, top, left, h, w, bool(hflip), bool(vflip),
                         int(rot_k) & 3)
    out = x[top : top + h, left : left + w]
    return apply_geometry(out, hflip, vflip, rot_k)


def paired_random_crop(lr: np.ndarray, hr: np.ndarray, lr_patch: int,
                       scale: int, rng: np.random.Generator
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Random aligned crop: LR patch lr_patch, HR patch lr_patch*scale."""
    h, w = lr.shape[:2]
    top = int(rng.integers(0, max(h - lr_patch, 0) + 1))
    left = int(rng.integers(0, max(w - lr_patch, 0) + 1))
    lr_c = lr[top : top + lr_patch, left : left + lr_patch]
    hr_c = hr[top * scale : (top + lr_patch) * scale,
              left * scale : (left + lr_patch) * scale]
    return lr_c, hr_c


def apply_geometry(x: np.ndarray, hflip: bool, vflip: bool, rot_k: int
                   ) -> np.ndarray:
    """Apply a geometric transform to an HWC array."""
    if hflip:
        x = x[:, ::-1]
    if vflip:
        x = x[::-1]
    if rot_k:
        x = np.rot90(x, rot_k, axes=(0, 1))
    return np.ascontiguousarray(x)


def invert_geometry(x: np.ndarray, hflip: bool, vflip: bool, rot_k: int
                    ) -> np.ndarray:
    """Invert apply_geometry (for TTA un-transforming)."""
    if rot_k:
        x = np.rot90(x, -rot_k, axes=(0, 1))
    if vflip:
        x = x[::-1]
    if hflip:
        x = x[:, ::-1]
    return np.ascontiguousarray(x)


def paired_geometric_augment(tensors: Dict[str, np.ndarray],
                             rng: np.random.Generator,
                             flip_prob: float = 0.5,
                             rot_prob: float = 0.5) -> Dict[str, np.ndarray]:
    """Sample one geometric transform and apply it to every tensor."""
    hflip = bool(rng.random() < flip_prob)
    vflip = bool(rng.random() < flip_prob)
    rot_k = int(rng.integers(1, 4)) if rng.random() < rot_prob else 0
    return {k: apply_geometry(v, hflip, vflip, rot_k)
            for k, v in tensors.items()}


def paired_color_jitter(lr: np.ndarray, hr: np.ndarray,
                        rng: np.random.Generator,
                        brightness: float = 0.05, contrast: float = 0.05,
                        saturation: float = 0.05,
                        prob: float = 0.2) -> "tuple":
    """Identical color transform on both images (augmentations.py:178-264).
    Live-expert training only — cached mode forbids it because it would
    invalidate cached expert outputs (cached_dataset.py:36-37)."""
    if rng.random() >= prob:
        return lr, hr
    b = 1.0 + rng.uniform(-brightness, brightness)
    c = 1.0 + rng.uniform(-contrast, contrast)
    s = 1.0 + rng.uniform(-saturation, saturation)

    def jitter(img):
        img = img * b
        mean = img.mean()
        img = (img - mean) * c + mean
        if s != 1.0:
            try:
                import cv2
                u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                hsv = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV).astype(np.float32)
                hsv[:, :, 1] = np.clip(hsv[:, :, 1] * s, 0, 255)
                img = cv2.cvtColor(hsv.astype(np.uint8),
                                   cv2.COLOR_HSV2RGB).astype(np.float32) / 255.0
            except ImportError:  # saturation needs cv2; skip gracefully
                pass
        return np.clip(img, 0.0, 1.0).astype(np.float32)

    return jitter(lr), jitter(hr)


def cutblur(lr: np.ndarray, hr: np.ndarray, rng: np.random.Generator,
            alpha: float = 0.7, prob: float = 0.5,
            scale: int = 4) -> "tuple":
    """CutBlur: replace a random HR region with its down-up-sampled self
    ("Rethinking Data Augmentation for Image Super-resolution";
    augmentations.py:308-371)."""
    if rng.random() >= prob:
        return lr, hr
    import cv2

    h, w = hr.shape[:2]
    ratio = rng.beta(alpha, alpha)
    ch, cw = int(h * ratio), int(w * ratio)
    if ch < scale or cw < scale:
        return lr, hr
    cy = int(rng.integers(0, h - ch + 1))
    cx = int(rng.integers(0, w - cw + 1))
    region = hr[cy : cy + ch, cx : cx + cw]
    small = cv2.resize(region, (max(cw // scale, 1), max(ch // scale, 1)),
                       interpolation=cv2.INTER_CUBIC)
    blurred = cv2.resize(small, (cw, ch), interpolation=cv2.INTER_CUBIC)
    hr_aug = hr.copy()
    hr_aug[cy : cy + ch, cx : cx + cw] = np.clip(blurred, 0.0, 1.0)
    return lr, hr_aug


def frequency_augment(x: np.ndarray, rng: np.random.Generator,
                      block_size: int = 8,
                      low_range=(0.9, 1.1), mid_range=(0.85, 1.15),
                      high_range=(0.8, 1.2), prob: float = 0.5) -> np.ndarray:
    """Frequency-domain augmentation: random per-band DCT scaling
    (src/data/frequency_decomposition.py:549-616). Because DCT bands
    partition the spectrum (low+mid+high == x), scaling and summing the
    bands equals scaling the masked coefficients directly."""
    if rng.random() > prob:
        return x
    from ..models.fusion.frequency import _dct_basis_np, _zigzag_band_masks_np

    n = block_size
    h, w = x.shape[:2]
    ph, pw = (n - h % n) % n, (n - w % n) % n
    xp = np.pad(x, [(0, ph), (0, pw), (0, 0)], mode="reflect") if (ph or pw) else x
    hp, wp = xp.shape[:2]
    basis = _dct_basis_np(n)
    masks = _zigzag_band_masks_np(n)
    scales = [rng.uniform(*low_range), rng.uniform(*mid_range),
              rng.uniform(*high_range)]
    weight = sum(s * m for s, m in zip(scales, masks))  # [n, n]

    blocks = xp.reshape(hp // n, n, wp // n, n, -1).transpose(0, 2, 4, 1, 3)
    coeffs = np.einsum("ki,...ij,lj->...kl", basis, blocks, basis)
    coeffs *= weight
    spatial = np.einsum("ki,...kl,lj->...ij", basis, coeffs, basis)
    out = spatial.transpose(0, 3, 1, 4, 2).reshape(hp, wp, -1)
    return np.clip(out[:h, :w], 0.0, 1.0).astype(np.float32)
