"""One-pass fused LayerNorm as a Pallas TPU kernel — MEASURED AND
DECLINED for the shipped models (kept as a tested reference experiment).

Hypothesis: XLA lowers ``nn.LayerNorm`` on a bf16 tensor into separate
convert+reduce passes (the ~55-60 ms/expert fp32 ``convert_reduce``
buckets in the round-3 MambaIR/GRL traces at lane-misaligned widths
180/360); a one-pass kernel (both moments from the same VMEM tile, one
HBM read + one write) should beat that.

Measured (336x512 bf16, in-model, round 3): it LOSES everywhere —
MambaIR 0.981 -> 1.204 s/img, DRCT 0.465 -> 0.580, GRL 0.525 -> 0.622.
Each expert has ~110+ LN sites; a standalone custom call per site breaks
XLA's fusion of the LN passes into the surrounding elementwise work
(residual adds, skip scales, casts ride the same reduce passes for
free) and adds ~1-2 ms dispatch/materialization per call, swamping the
bandwidth saved. The models therefore keep ``nn.LayerNorm``; this file
stays as the parity-tested kernel + the receipt for that decision
(same measure-and-decline treatment as the fused conv+pixel_shuffle,
BENCH_NOTES round 2).

Numerics match flax.linen.LayerNorm (biased variance, two-moment
formula, fp32 accumulation, eps inside the rsqrt); pinned by
tests/test_fused_layernorm.py against nn.LayerNorm in interpret mode.

Reference LN sites: mambair_arch.py:391-422 (ln_1/ln_2), :369 (out_norm);
grl swin-v2 blocks; drct_arch.py RDG norms — all `nn.LayerNorm` there.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .dispatch import use_pallas

__all__ = ["fused_layernorm", "FusedLayerNorm"]


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) * (1.0 / c)
    m2 = jnp.sum(x * x, axis=-1, keepdims=True) * (1.0 / c)
    var = m2 - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _pick_rows_per_block(r: int, c: int) -> int:
    # fp32 working tile + bf16 in/out blocks, double-buffered: keep the
    # per-step footprint a few MB under the ~16 MB VMEM.
    budget = 2 * 1024 * 1024
    per_row = c * (4 + 2 + 2)
    rb = max(8, min(1024, budget // max(per_row, 1)))
    rb -= rb % 8
    for cand in range(rb, 7, -8):
        if r % cand == 0:
            return cand
    return 8 if r % 8 == 0 else 1


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    eps: float = 1e-5, interpret: bool = False
                    ) -> jnp.ndarray:
    """LayerNorm over the last axis; any leading shape."""
    c = x.shape[-1]
    lead = x.shape[:-1]
    r = 1
    for d in lead:
        r *= d
    x2 = x.reshape(r, c)
    rb = _pick_rows_per_block(r, c)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(*lead, c)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm``: identical param names/shapes
    ("scale"/"bias" over the last axis), so converters and state-dict
    layouts are unchanged. Dispatches to the Pallas kernel on TPU
    (ops/dispatch.py), the stock flax implementation elsewhere —
    parity between the two routes is pinned in tests."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if use_pallas():
            return fused_layernorm(x, scale, bias, eps=self.epsilon)
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(dtype)
