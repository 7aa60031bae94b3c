"""Depthwise 3x3 convolution as a halo-DMA Pallas stencil.

XLA's grouped-conv lowering gives NAFNet's 36 depthwise convs the
conv-preferred {3,1,2,0} activation layout and inserts full-tensor
relayout copies on BOTH sides of each one (the 54 ms `copy` bucket of
the round-3 NAFNet trace); the 9-shift-FMA XLA rewrite was measured and
declined because XLA keeps the 9 shifted slice reads as 9 HBM passes.
This kernel reads each input element ONCE: the input stays in HBM (ANY
memory space) and each grid step DMAs a (rh+2, rw+2, C) halo block into
VMEM (edge blocks clamp the copy origin, then roll + mask to restore
zero-padding semantics), computes the nine per-channel FMAs in fp32
entirely in VMEM, and streams the (rh, rw, C) output block normally —
pure read-once/write-once traffic in the standard NHWC layout.

Param layout matches nn.Conv exactly (kernel [3, 3, 1, C], bias [C]).
Reference semantics: nafnet_arch.py:66-70 / mambair_arch.py conv2d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dwconv3x3_pallas"]


def _dw_kernel(x_hbm, w_ref, b_ref, o_ref, buf, sem, *, rh: int, rw: int,
               h: int, w: int, c: int):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    f32 = jnp.float32

    start_h = i * rh - 1
    start_w = j * rw - 1
    ch = jnp.clip(start_h, 0, h - (rh + 2))
    cw = jnp.clip(start_w, 0, w - (rw + 2))
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ch, rh + 2), pl.ds(cw, rw + 2), :], buf, sem)
    cp.start()
    cp.wait()
    # Re-align clamped edge blocks (shift in {-1, 0, +1}: local index r
    # must hold global row start_h + r = buf[r - (ch - start_h)]) and
    # zero the halo rows/cols outside the image (zero-pad semantics).
    blk = pltpu.roll(pltpu.roll(buf[:], ch - start_h, axis=0),
                     cw - start_w, axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (rh + 2, rw + 2, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rh + 2, rw + 2, 1), 1)
    valid = ((rows + start_h >= 0) & (rows + start_h < h)
             & (cols + start_w >= 0) & (cols + start_w < w))
    blk = jnp.where(valid, blk, jnp.zeros_like(blk)).astype(f32)

    acc = None
    for di in range(3):
        for dj in range(3):
            term = blk[di: di + rh, dj: dj + rw] * w_ref[di, dj, 0].astype(
                f32)
            acc = term if acc is None else acc + term
    o_ref[0] = (acc + b_ref[:].astype(f32)).astype(o_ref.dtype)


def _pick_tile(dim: int, cap: int) -> int:
    for t in range(min(cap, dim), 0, -1):
        if dim % t == 0:
            return t
    return dim


@functools.partial(jax.jit, static_argnames=("interpret",))
def dwconv3x3_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """x: [B, H, W, C]; kernel: [3, 3, 1, C]; bias: [C].
    SAME zero padding, stride 1. Returns [B, H, W, C] in x.dtype."""
    b, h, w, c = x.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    # tile budget: fp32 accumulator + halo block within a few MB
    budget = 3 * 1024 * 1024
    rw = _pick_tile(w, 256)
    rh = _pick_tile(h, 8)
    while (rh + 2) * (rw + 2) * c * (x.dtype.itemsize + 4) > budget and rw > 8:
        rw = _pick_tile(w, rw // 2)
    if h < 3 or w < 3 or (rh + 2) > h or (rw + 2) > w:
        # tiny inputs: the halo block would exceed the image; XLA conv
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c) + bias.astype(x.dtype)

    out_spec = pl.BlockSpec((1, rh, rw, c), lambda bi, i, j: (bi, i, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dw_kernel, rh=rh, rw=rw, h=h, w=w, c=c),
        grid=(b, h // rh, w // rw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(kernel.shape,
                               lambda bi, i, j: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((rh + 2, rw + 2, c), x.dtype),
                        pltpu.SemaphoreType.DMA],
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * c * 18,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, kernel, bias.reshape(1, c))
