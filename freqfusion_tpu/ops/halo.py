"""Shared pipelined-stencil helper for spatially-tiled Pallas kernels.

Each halo kernel reads its input as NINE pipelined BlockSpec refs of the
SAME array — the (rh, rw) main tile plus clamped-index neighbor bands
(top/bottom of dh rows, left/right of dw cols, four corners) — and
assembles the (rh+2*halo, rw+2*halo) working block with static concats.
The returned mask marks in-image positions (callers mask the tensor that
must obey zero-padding, which for a conv stack is the CONV INPUT, not
necessarily x itself); out-of-image positions hold clamped-duplicate
garbage and MUST be masked via jnp.where (select, so any garbage is
safe).

Why not a manual halo DMA (the previous design): the PRODUCTION Mosaic
compiler behind the axon relay constrains `make_async_copy` slices to
lane extents that are multiples of 128 and sublane slices aligned to 8
— any NHWC activation with C not a multiple of 128 (64, 76, 180, 3, …)
is HBM-padded to 128 lanes and every halo window slice is rejected with
"Slice shape along dimension 3 must be aligned to tiling (128)" (and
the pltpu.roll realignment additionally hits "unsupported unaligned
shape" on tpu.dynamic_rotate). The locally-installed libtpu used for
AOT checks is newer and accepts both, so local AOT compile health does
NOT imply relay compile health. Standard Blocked pipelining has no such
constraint (every hardware-proven kernel in this repo uses it), costs
no manual semaphores, and double-buffers the fetches for free; with
band thickness ≈ halo the fetched bytes match the ideal halo window.

Band geometry: dh | rh | H and dw | rw | W, with dh, dw >= halo (bands
at least one halo thick). Wrappers pick the smallest divisor >= halo
and fall back to the XLA route when none exists (production shapes are
16-multiples, so 1/2/4/8/16 always divide).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["stencil_specs", "stencil_block", "pick_bands"]


def pick_bands(dim: int, halo: int, cap: int, align: int = 1):
    """Return (tile, band) with band | tile | dim, band >= halo, and
    both band and tile divisible by `align` (or equal to dim — the
    Pallas TPU block rule for the second-minor axis, align=8), tile <=
    max(cap, band) — or (None, None) if impossible (caller falls back
    to XLA)."""
    if halo == 0:
        halo = 1

    def ok(v):
        return v % align == 0 or v == dim

    band = next((x for x in range(halo, dim + 1) if dim % x == 0
                 and ok(x)), None)
    if band is None:
        return None, None
    tile = band
    for t in range(min(cap, dim), band - 1, -1):
        if dim % t == 0 and t % band == 0 and ok(t):
            tile = t
            break
    return tile, band


def stencil_specs(c: int, rh: int, rw: int, dh: int, dw: int):
    """The nine in_specs (main, top, bottom, left, right, tl, tr, bl,
    br) for one [B, H, W, C] array under grid (B, H//rh, W//rw). Pass
    the array itself nine times in the corresponding operand slots."""
    nh, nw = rh // dh, rw // dw

    def up(i):
        return jnp.maximum(i * nh - 1, 0)

    # The down/right clamps need H//dh (resp. W//dw) = grid * n, so
    # they read num_programs inside the maps.
    def bot_map(bi, i, j):
        gh = pl.num_programs(1)
        return (bi, jnp.minimum(i * nh + nh, gh * nh - 1), j, 0)

    def right_map(bi, i, j):
        gw = pl.num_programs(2)
        return (bi, i, jnp.minimum(j * nw + nw, gw * nw - 1), 0)

    def tl_map(bi, i, j):
        return (bi, up(i), jnp.maximum(j * nw - 1, 0), 0)

    def tr_map(bi, i, j):
        gw = pl.num_programs(2)
        return (bi, up(i), jnp.minimum(j * nw + nw, gw * nw - 1), 0)

    def bl_map(bi, i, j):
        gh = pl.num_programs(1)
        return (bi, jnp.minimum(i * nh + nh, gh * nh - 1),
                jnp.maximum(j * nw - 1, 0), 0)

    def br_map(bi, i, j):
        gh, gw = pl.num_programs(1), pl.num_programs(2)
        return (bi, jnp.minimum(i * nh + nh, gh * nh - 1),
                jnp.minimum(j * nw + nw, gw * nw - 1), 0)

    return [
        pl.BlockSpec((1, rh, rw, c), lambda bi, i, j: (bi, i, j, 0)),
        pl.BlockSpec((1, dh, rw, c),
                     lambda bi, i, j: (bi, up(i), j, 0)),
        pl.BlockSpec((1, dh, rw, c), bot_map),
        pl.BlockSpec((1, rh, dw, c),
                     lambda bi, i, j: (bi, i, jnp.maximum(j * nw - 1, 0),
                                       0)),
        pl.BlockSpec((1, rh, dw, c), right_map),
        pl.BlockSpec((1, dh, dw, c), tl_map),
        pl.BlockSpec((1, dh, dw, c), tr_map),
        pl.BlockSpec((1, dh, dw, c), bl_map),
        pl.BlockSpec((1, dh, dw, c), br_map),
    ]


def stencil_block(refs, rh: int, rw: int, dh: int, dw: int,
                  halo: int, h: int, w: int):
    """Assemble the (rh + 2*halo, rw + 2*halo, C) working block for grid
    step (bi=program_id(0), i=program_id(1), j=program_id(2)) from the
    nine refs of stencil_specs order. Returns (block, valid mask
    [rh+2halo, rw+2halo, 1])."""
    m, t, b, l, r, tl, tr, bl, br = refs
    i, j = pl.program_id(1), pl.program_id(2)
    top = jnp.concatenate([tl[0, dh - halo:, dw - halo:],
                           t[0, dh - halo:, :],
                           tr[0, dh - halo:, :halo]], axis=1)
    mid = jnp.concatenate([l[0, :, dw - halo:], m[0], r[0, :, :halo]],
                          axis=1)
    bot = jnp.concatenate([bl[0, :halo, dw - halo:],
                           b[0, :halo, :],
                           br[0, :halo, :halo]], axis=1)
    blk = jnp.concatenate([top, mid, bot], axis=0)
    hh, ww = rh + 2 * halo, rw + 2 * halo
    rows = jax.lax.broadcasted_iota(jnp.int32, (hh, ww, 1), 0) \
        + i * rh - halo
    cols = jax.lax.broadcasted_iota(jnp.int32, (hh, ww, 1), 1) \
        + j * rw - halo
    valid = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    return blk, valid
