"""Shared window-attention machinery (Swin-style), NHWC, static shapes.

Used by DRCT's 16x16 shifted windows (reference src/models/drct/
drct_arch.py:97-222) and GRL's 8x8 windows / stripe attention (reference
src/models/grl/common/ops.py:36-553). TPU-first choices:

  - Window partition/reverse are pure reshapes/transposes on NHWC tensors
    (free layout changes under XLA), producing [B*nW, N, C] token blocks
    whose attention is one batched einsum on the MXU.
  - Relative-position indices and shifted-window masks are numpy
    precomputes keyed on static (H, W, window, shift); under jit each shape
    bucket constant-folds its own tables — the functional replacement of
    the reference's per-resolution buffer regeneration
    (drct_arch.py:377-383, grl_arch.py:431-453).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = [
    "window_partition", "window_reverse", "relative_position_index",
    "shifted_window_mask", "multi_head_window_attention",
]


def window_partition(x: jnp.ndarray, wh: int, ww: Optional[int] = None
                     ) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, wh*ww, C] (row-major windows)."""
    ww = wh if ww is None else ww
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, c)


def window_reverse(windows: jnp.ndarray, wh: int, h: int, w: int,
                   ww: Optional[int] = None) -> jnp.ndarray:
    """[B*nW, wh*ww, C] -> [B, H, W, C]."""
    ww = wh if ww is None else ww
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // wh) * (w // ww))
    x = windows.reshape(b, h // wh, w // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=64)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """[wh*ww, wh*ww] int32 index into a (2wh-1)(2ww-1) bias table
    (Swin convention, drct_arch.py:153-164)."""
    coords_h = np.arange(wh)
    coords_w = np.arange(ww)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # 2,wh,ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)      # N, N, 2
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=256)
def shifted_window_mask_rect(h: int, w: int, wh: int, ww: int,
                             sh: int, sw: int,
                             fill: float = -100.0) -> Optional[np.ndarray]:
    """[nW, N, N] additive mask for rectangular shifted windows
    (the DAT generalization, dat_arch.py:432-494). None when no shift."""
    if sh == 0 and sw == 0:
        return None
    img_mask = np.zeros((1, h, w, 1), np.float32)
    h_slices = (slice(0, -wh), slice(-wh, -sh), slice(-sh, None))
    w_slices = (slice(0, -ww), slice(-ww, -sw), slice(-sw, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // wh, wh, w // ww, ww, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, fill, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=256)
def shifted_window_mask(h: int, w: int, window: int, shift: int,
                        fill: float = -100.0) -> Optional[np.ndarray]:
    """[nW, N, N] additive attention mask for shifted square windows
    (drct_arch.py:386-409). None when shift == 0."""
    return shifted_window_mask_rect(h, w, window, window, shift, shift, fill)


def multi_head_window_attention(
        q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        num_heads: int,
        bias: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        scale: Optional[float] = None) -> jnp.ndarray:
    """Batched window attention: q,k,v [B_, N, C] -> [B_, N, C].

    bias: [num_heads, N, N] additive (relative position bias).
    mask: [nW, N, N] additive, tiled over batch (B_ = B * nW).
    """
    b_, n, c = q.shape
    m = k.shape[1]  # key/value token count may differ (e.g. HAT's OCAB)
    hd = c // num_heads
    scale = hd ** -0.5 if scale is None else scale

    def split(x):
        return x.reshape(b_, x.shape[1], num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q) * scale, split(k), split(v)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                      preferred_element_type=jnp.float32)
    if bias is not None:
        attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, num_heads, n, m)
        attn = attn + mask[None, :, None]
        attn = attn.reshape(b_, num_heads, n, m)
    attn = jnp.asarray(attn, jnp.float32)
    attn = jnp.exp(attn - attn.max(axis=-1, keepdims=True))
    attn = attn / attn.sum(axis=-1, keepdims=True)
    attn = attn.astype(vh.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b_, n, c)
