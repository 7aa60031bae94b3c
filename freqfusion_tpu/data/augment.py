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
           "invert_geometry", "crop_and_transform"]

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
