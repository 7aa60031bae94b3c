"""Shared halo-DMA helper for spatially-tiled Pallas kernels.

The input stays in HBM (ANY memory space); each grid step DMAs a
(rh + 2*halo, rw + 2*halo, C) block into VMEM scratch, clamping the copy
origin at image edges and rolling back into alignment so local index r
holds global row (i*rh - halo + r); the returned mask marks in-image
positions (callers mask the tensor that must obey zero-padding, which
for a conv stack is the CONV INPUT, not necessarily x itself). Pattern
proven in ops/pallas_dwconv.py; reused by pallas_nafblock / pallas_cab.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["halo_block"]


def halo_block(x_hbm, buf, sem, bi, i, j, rh: int, rw: int,
               h: int, w: int, halo: int = 1):
    """DMA + align one halo block for tile (i, j) of batch bi.
    Returns (block in x.dtype, valid mask [rh+2halo, rw+2halo, 1])."""
    hh, ww = rh + 2 * halo, rw + 2 * halo
    start_h = i * rh - halo
    start_w = j * rw - halo
    ch = jnp.clip(start_h, 0, h - hh)
    cw = jnp.clip(start_w, 0, w - ww)
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ch, hh), pl.ds(cw, ww), :], buf, sem)
    cp.start()
    cp.wait()
    blk = pltpu.roll(pltpu.roll(buf[:], ch - start_h, axis=0),
                     cw - start_w, axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hh, ww, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hh, ww, 1), 1)
    valid = ((rows + start_h >= 0) & (rows + start_h < h)
             & (cols + start_w >= 0) & (cols + start_w < w))
    return blk, valid
