"""GRL attention tables/indices/masks as static numpy precomputes.

Functional re-design of the reference's 13 registered buffers
(src/models/grl/grl_arch.py:386-453) computed by
common/ops.py:112-553. Under jit each static shape bucket constant-folds
its own tables; nothing is regenerated at runtime.

GRL-B specifics (src/models/grl/__init__.py:76-160): window 8, stripe
size [8, 8] with stripe_groups [None, None] and stripe_shift=False — so
stripe windows are static 8x8/4x4 anchors and the stripe-shift masks are
never consumed (mask_a2w/mask_w2a = None in the blocks,
mixed_attn_block_efficient.py:525-535).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "relative_coords_table_all", "relative_position_index_simple",
    "window_shift_mask",
]


@functools.lru_cache(maxsize=32)
def relative_coords_table_all(ws: Tuple[int, int],
                              df: int = 1) -> np.ndarray:
    """Continuous log-scaled relative coordinate table
    (ops.py:225-271). Returns [1, th, tw, 2] float32."""
    aws = [w // df for w in ws]
    ts_p = [w1 - 1 - (w1 - w2) // 2 for w1, w2 in zip(ws, aws)]
    ts_n = [-(w2 - 1) - (w1 - w2) // 2 for w1, w2 in zip(ws, aws)]
    coord_h = np.arange(ts_n[0], ts_p[0] + 1, dtype=np.float64)
    coord_w = np.arange(ts_n[1], ts_p[1] + 1, dtype=np.float64)
    table = np.stack(np.meshgrid(coord_h, coord_w, indexing="ij"))
    table = table.transpose(1, 2, 0)[None]  # 1, th, tw, 2
    table[..., 0] /= ts_p[0]
    table[..., 1] /= ts_p[1]
    table *= 8
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)
    return table.astype(np.float32)


def _meshgrid_coords(end: Sequence[int]) -> np.ndarray:
    ch = np.arange(end[0])
    cw = np.arange(end[1])
    coords = np.stack(np.meshgrid(ch, cw, indexing="ij"))
    return coords.reshape(2, -1)  # 2, H*W


@functools.lru_cache(maxsize=64)
def relative_position_index_simple(ws: Tuple[int, int], df: int = 1,
                                   window_to_anchor: bool = True) -> np.ndarray:
    """Window<->anchor relative position index (ops.py:352-380)."""
    aws = [w // df for w in ws]
    coords = _meshgrid_coords(ws)
    coords_anchor = _meshgrid_coords(aws)
    max_horizontal_diff = aws[1] + ws[1] - 1
    if window_to_anchor:
        offset = [w2 - 1 for w2 in aws]
        c1, c2 = coords, coords_anchor
    else:
        offset = [w1 - 1 for w1 in ws]
        c1, c2 = coords_anchor, coords
    diff = c1[:, :, None] - c2[:, None, :]       # 2, N1, N2
    diff = diff.transpose(1, 2, 0).astype(np.int64)
    diff[:, :, 0] += offset[0]
    diff[:, :, 1] += offset[1]
    diff[:, :, 0] *= max_horizontal_diff
    return diff.sum(-1).astype(np.int32)        # N1, N2


@functools.lru_cache(maxsize=256)
def window_shift_mask(h: int, w: int, window: int,
                      shift: int) -> Optional[np.ndarray]:
    """Shifted-window attention mask (ops.py:112-127); None if no shift."""
    from .window_attention import shifted_window_mask
    return shifted_window_mask(h, w, window, shift)
