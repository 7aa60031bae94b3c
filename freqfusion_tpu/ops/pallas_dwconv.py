"""Depthwise 3x3 convolution as a pipelined-stencil Pallas kernel.

XLA's grouped-conv lowering gives NAFNet's 36 depthwise convs the
conv-preferred {3,1,2,0} activation layout and inserts full-tensor
relayout copies on BOTH sides of each one (the 54 ms `copy` bucket of
the round-3 NAFNet trace); the 9-shift-FMA XLA rewrite was measured and
declined because XLA keeps the 9 shifted slice reads as 9 HBM passes.
This kernel reads each input element ~once: the input arrives as nine
pipelined BlockSpec refs (main tile + 1-thick neighbor bands + corners,
see ops/halo.py for why not a manual halo DMA), the nine per-channel
FMAs run in fp32 entirely in VMEM, and the (rh, rw, C) output block
streams out normally — read-once/write-once traffic in standard NHWC.

Param layout matches nn.Conv exactly (kernel [3, 3, 1, C], bias [C]).
Reference semantics: nafnet_arch.py:66-70 / mambair_arch.py conv2d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .halo import pick_bands, stencil_block, stencil_specs

__all__ = ["dwconv3x3_pallas"]


def _dw_kernel(*refs, rh: int, rw: int, dh: int, dw_: int,
               h: int, w: int, c: int):
    stencil, (w_ref, b_ref), o_ref = refs[:9], refs[9:11], refs[11]
    f32 = jnp.float32
    blk, valid = stencil_block(stencil, rh, rw, dh, dw_, 1, h, w)
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
    rh, dh = pick_bands(h, 1, rh)
    rw, dw_ = pick_bands(w, 1, rw, align=8)
    if rh is None or rw is None or h < 3 or w < 3:
        # tiny/indivisible inputs: XLA conv
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c) + bias.astype(x.dtype)

    out_spec = pl.BlockSpec((1, rh, rw, c), lambda bi, i, j: (bi, i, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dw_kernel, rh=rh, rw=rw, dh=dh, dw_=dw_,
                          h=h, w=w, c=c),
        grid=(b, h // rh, w // rw),
        in_specs=stencil_specs(c, rh, rw, dh, dw_)
        + [pl.BlockSpec(kernel.shape,
                        lambda bi, i, j: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * c * 18,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*([x] * 9), kernel, bias.reshape(1, c))
