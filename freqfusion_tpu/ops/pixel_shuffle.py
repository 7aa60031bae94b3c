"""Pixel shuffle (depth-to-space) in NHWC with PyTorch channel ordering.

Torch's nn.PixelShuffle(r) interprets the channel axis as (C, r, r):
out[c, h*r+i, w*r+j] = in[c*r^2 + i*r + j, h, w]. Keeping that ordering
makes converted checkpoints (e.g. DRCT's Upsample, drct_arch.py:601-620)
drop in without channel permutation.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pixel_shuffle", "pixel_unshuffle"]


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    b, h, w, cr2 = x.shape
    c = cr2 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, i, j
    return x.reshape(b, h, w, c * r * r)
