"""Per-pixel token attention as one Pallas TPU kernel.

The fusion network's TokenMultiheadAttention attends over a TINY token
axis (9 frequency bands / 4 experts) independently at every pixel —
[P, T, E] with P = B*H*W ~ 172k and T <= 9. XLA lowers the per-head
einsums to batched tiny matmuls/convolutions and materializes the
[P, nH, T, T] logits through HBM: the round-3 fusion trace prices the
block at ~130 ms/img (qk 25.6 + softmax 50 + out 25 + head copies ~29).

This kernel keeps one block of pixels entirely in VMEM:
    qkv  = x @ Win + b        (ONE MXU dot; the 1/sqrt(hd) scale is
                               folded into Win's q-section offline)
    T    = transpose to [T*3E, pb] — pixels on lanes, tokens/channels
           on sublanes, so every q_i.k_j product is a [hd, pb] slab
           multiply + sublane reduce (no batched tiny matmuls at all)
    softmax over the 9 logit rows per (i, head), fp32
    out  = sum_j w_j * v_j slabs, transpose back, @ Wout + b
Reference semantics: torch nn.MultiheadAttention as used at
src/models/large_kernel_attention.py:222-229 / :385-392 (eval mode —
the kernel route is only taken when dropout is inactive).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_token_attention"]


def _token_attn_kernel(x_ref, win_ref, bin_ref, wout_ref, bout_ref, o_ref,
                       *, t: int, e: int, nh: int, pb: int):
    hd = e // nh
    dt = x_ref.dtype
    f32 = jnp.float32
    x2 = x_ref[...].reshape(pb * t, e)
    qkv = jax.lax.dot_general(x2, win_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    qkv = (qkv + bin_ref[:].astype(f32)).astype(dt)      # [pb*T, 3E]
    xt = qkv.reshape(pb, t * 3 * e)
    xT = xt.T                                            # [T*3E, pb]

    out_rows = []
    for i in range(t):
        row_i = []
        for h in range(nh):
            q = xT[i * 3 * e + h * hd: i * 3 * e + (h + 1) * hd]
            logits = []
            for j in range(t):
                k = xT[j * 3 * e + e + h * hd:
                       j * 3 * e + e + (h + 1) * hd]
                logits.append(jnp.sum((q * k).astype(f32), axis=0,
                                      keepdims=True))    # [1, pb]
            L = jnp.concatenate(logits, axis=0)          # [T, pb]
            L = L - L.max(axis=0, keepdims=True)
            L = jnp.exp(L)
            W = (L / L.sum(axis=0, keepdims=True)).astype(dt)
            acc = None
            for j in range(t):
                v = xT[j * 3 * e + 2 * e + h * hd:
                       j * 3 * e + 2 * e + (h + 1) * hd]
                term = W[j: j + 1].astype(f32) * v.astype(f32)
                acc = term if acc is None else acc + term
            row_i.append(acc.astype(dt))                 # [hd, pb]
        out_rows.append(jnp.concatenate(row_i, axis=0))  # [E, pb]
    OT = jnp.concatenate(out_rows, axis=0)               # [T*E, pb]
    o2 = OT.T.reshape(pb * t, e)
    out = jax.lax.dot_general(o2, wout_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    out = (out + bout_ref[:].astype(f32)).astype(o_ref.dtype)
    o_ref[...] = out.reshape(pb, t, e)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_token_attention(x: jnp.ndarray,
                          in_proj_w: jnp.ndarray, in_proj_b: jnp.ndarray,
                          out_w: jnp.ndarray, out_b: jnp.ndarray,
                          num_heads: int,
                          interpret: bool = False) -> jnp.ndarray:
    """x: [P, T, E]; in_proj_w: [E, 3E] (torch MHA packed layout),
    in_proj_b: [3E]; out_w: [E, E], out_b: [E]. Returns
    out_proj(MHA(x)) (pre-residual), [P, T, E]."""
    p, t, e = x.shape
    hd = e // num_heads
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    # fold the 1/sqrt(hd) q-scale into the q-section of the projection
    scale = jnp.asarray(hd, jnp.float32) ** -0.5
    win = jnp.concatenate(
        [in_proj_w[:, :e].astype(jnp.float32) * scale,
         in_proj_w[:, e:].astype(jnp.float32)], axis=1).astype(x.dtype)
    bin_ = jnp.concatenate(
        [in_proj_b[:e].astype(jnp.float32) * scale,
         in_proj_b[e:].astype(jnp.float32)]).reshape(1, 3 * e).astype(
            x.dtype)
    wout = out_w.astype(x.dtype)
    bout = out_b.reshape(1, e).astype(x.dtype)

    pb = 512
    pp = -(-p // pb) * pb
    if pp != p:
        x = jnp.pad(x, [(0, pp - p), (0, 0), (0, 0)])

    def const(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_token_attn_kernel, t=t, e=e, nh=num_heads,
                          pb=pb),
        grid=(pp // pb,),
        in_specs=[pl.BlockSpec((pb, t, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  const(win), const(bin_), const(wout), const(bout)],
        out_specs=pl.BlockSpec((pb, t, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pp, t, e), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=pp * t * (2 * e * 3 * e + 2 * e * e)
            + pp * num_heads * t * t * hd * 4,
            bytes_accessed=2 * pp * t * e * x.dtype.itemsize,
            transcendentals=pp * num_heads * t * t,
        ),
        interpret=interpret,
    )(x, win, bin_, wout, bout)
    return out[:p]
