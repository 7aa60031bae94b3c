"""Fused transformer-FFN Pallas kernel: LN + fc1 + GELU + fc2 + residual.

XLA cannot fuse two matmuls into one kernel, so every transformer MLP
materializes its hidden activation in HBM: at DRCT's mlp_ratio=4 the
FFN half of a Swin block moves ~(C + 4C + 4C + C + C) = ~11*C*P bytes
(read x, write hidden, read hidden, write out, re-read x for the
residual); GRL's ratio-2 FFN ~7*C*P. This kernel keeps the hidden in
VMEM and the whole FFN block becomes read-x-once / write-out-once =
2*C*P — a 3.5-5.5x traffic cut on the FFN half of every DRCT (60),
GRL (40), and HAT block.

Two norm orders cover the model zoo:
  prenorm  (DRCT/HAT, drct_arch.py:302-434):  out = x + fc2(gelu(fc1(LN(x))))
  postnorm (GRL, mixed_attn_block_efficient.py:406-560):
                                 out = x + res_scale * LN(fc2(gelu(fc1(x))))

No halo, no global dependency: the grid tiles flattened pixels and each
step is one resident (rows, C) block plus both weight matrices. GELU is
exact (erf), matching nn.gelu(approximate=False). LN/elementwise run
fp32; the two dots run in x.dtype with fp32 accumulation (same as the
XLA route under bf16). Gated by FREQFUSION_MLP=1, OFF by default
pending a hardware A/B (relay down since round 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kmath import gelu_exact

__all__ = ["fused_mlp_block"]


def _prod(t):
    r = 1
    for v in t:
        r *= int(v)
    return r


def _ln(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return d * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, lb_ref, o_ref,
            *, prenorm: bool, res_scale: float, eps: float, dtype):
    f32 = jnp.float32
    x = x_ref[:].astype(f32)
    t = _ln(x, ls_ref[0], lb_ref[0], eps) if prenorm else x
    h = jax.lax.dot_general(t.astype(dtype), w1_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    h = gelu_exact(h + b1_ref[0])  # erf-free: relay Mosaic lacks erfc
    y = jax.lax.dot_general(h.astype(dtype), w2_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    y = y + b2_ref[0]
    if not prenorm:
        y = _ln(y, ls_ref[0], lb_ref[0], eps)
    o_ref[:] = (x + res_scale * y).astype(o_ref.dtype)


def _pick_rows(m: int, c: int, ch: int, budget: int = 8 * 1024 * 1024):
    """Rows per grid step under a VMEM budget: x fp32 + hidden fp32 +
    out + weights resident."""
    rows = min(1024, max(8, -(-m // 8) * 8))
    while rows > 8:
        need = rows * (2 * c + ch) * 4 + (c * ch * 2 + ch + 3 * c) * 4
        if need <= budget:
            break
        rows //= 2
    return rows


@functools.partial(jax.jit, static_argnames=("prenorm", "res_scale", "eps",
                                              "interpret"))
def fused_mlp_block(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                    w2: jnp.ndarray, b2: jnp.ndarray,
                    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                    prenorm: bool = True, res_scale: float = 1.0,
                    eps: float = 1e-5,
                    interpret: bool = False) -> jnp.ndarray:
    """x: [..., C] (any leading shape); w1: [C, Ch]; w2: [Ch, C].
    Returns x + res_scale * FFN-branch(x) with the norm order above."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    orig_shape = x.shape
    c = x.shape[-1]
    ch = w1.shape[-1]
    m = _prod(orig_shape[:-1])
    x2 = x.reshape(m, c)
    rows = _pick_rows(m, c, ch)
    pad = (-m) % rows
    if pad:
        x2 = jnp.concatenate(
            [x2, jnp.ones((pad, c), x2.dtype)], axis=0)
    mp = m + pad

    dtype = x.dtype
    vec = lambda v: v.astype(jnp.float32).reshape(1, -1)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, prenorm=prenorm, res_scale=res_scale,
                          eps=eps, dtype=dtype),
        grid=(mp // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * c * ch * 2,
            bytes_accessed=2 * mp * c * dtype.itemsize,
            transcendentals=mp * ch),
        interpret=interpret,
    )(x2, w1.astype(dtype), vec(b1), w2.astype(dtype), vec(b2),
      vec(ln_scale), vec(ln_bias))
    if pad:
        out = out[:m]
    return out.reshape(orig_shape)
