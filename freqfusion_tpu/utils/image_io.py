"""Image IO: uint8 PNG <-> float32 NHWC tensors in [0, 1].

Mirrors the reference conventions (models/team29_FreqFusionSR/io.py
_imread_uint/_uint2tensor4: BGR->RGB via cv2, /255) but is layout-native
(HWC float arrays, no CHW transpose).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False
    from PIL import Image

__all__ = ["read_image", "write_image"]


def read_image(path: str) -> np.ndarray:
    """Read an image file -> float32 [H, W, 3] RGB in [0, 1]."""
    if _HAVE_CV2:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:  # pragma: no cover
        img = np.asarray(Image.open(path).convert("RGB"))
    return img.astype(np.float32) / 255.0


def write_image(path: str, img: np.ndarray) -> None:
    """Write float [H, W, 3] RGB in [0,1] (or uint8) to disk."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    if _HAVE_CV2:
        ok = cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        if not ok:
            raise IOError(f"failed to write {path}")
    else:  # pragma: no cover
        Image.fromarray(img).save(str(path))
