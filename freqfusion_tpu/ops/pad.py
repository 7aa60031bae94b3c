"""Padding helpers matching PyTorch F.pad semantics, NHWC layout."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pad_reflect", "pad_zeros", "pad_to_multiple", "unpad"]


def _spatial_pad(x: jnp.ndarray, top: int, bottom: int, left: int, right: int, mode: str) -> jnp.ndarray:
    cfg = [(0, 0), (top, bottom), (left, right), (0, 0)]
    if x.ndim == 3:
        cfg = cfg[1:]
    return jnp.pad(x, cfg, mode=mode)


def pad_reflect(x: jnp.ndarray, top: int, bottom: int, left: int, right: int) -> jnp.ndarray:
    """Reflect (mirror without edge repeat) pad — matches F.pad(mode='reflect')."""
    return _spatial_pad(x, top, bottom, left, right, "reflect")


def pad_zeros(x: jnp.ndarray, top: int, bottom: int, left: int, right: int) -> jnp.ndarray:
    return _spatial_pad(x, top, bottom, left, right, "constant")


def pad_to_multiple(x: jnp.ndarray, multiple: int, mode: str = "reflect") -> jnp.ndarray:
    """Pad bottom/right so H and W are multiples of ``multiple``.

    Mirrors the reference's pad-then-crop tiling (io.py:71-78 pads with
    reflect to 16; NAFNet.check_image_size zero-pads to 16,
    nafnet_arch.py:220-225).
    """
    h, w = (x.shape[1], x.shape[2]) if x.ndim == 4 else (x.shape[0], x.shape[1])
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph == 0 and pw == 0:
        return x
    return _spatial_pad(x, 0, ph, 0, pw, mode)


def unpad(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Crop back to (h, w) after padded compute."""
    if x.ndim == 4:
        return x[:, :h, :w, :]
    return x[:h, :w, :]
