"""Per-pixel token attention as one Pallas TPU kernel.

The fusion network's TokenMultiheadAttention attends over a TINY token
axis (9 frequency bands / 4 experts) independently at every pixel —
[P, T, E] with P = B*H*W ~ 172k and T <= 9. XLA lowers the per-head
einsums to batched tiny matmuls/convolutions and materializes the
[P, nH, T, T] logits through HBM: the round-3 fusion trace prices the
block at ~130 ms/img (qk 25.6 + softmax 50 + out 25 + head copies ~29).

The kernel keeps one block of pixels entirely in VMEM, in a fully
TRANSPOSED formulation chosen for the production (relay) Mosaic
toolchain: the host hands the kernel [T, E, pb] tiles (tokens major,
channels on sublanes, pixels on lanes), the packed projection runs as
ONE batched dot over the token axis (winT broadcast to [T, 3E, E]), and
every per-(token, head) q/k/v slab is a CONTIGUOUS 16-aligned sublane
slice of the [T, 3E, pb] result. Nothing in the kernel reshapes
sublanes into lanes or transposes a minor dim — the first formulation
([pb*T, 3E] -> [pb, T*3E] reshape) was rejected by the relay's
older Mosaic with "infer-vector-layout: unsupported shape cast"
(MEASURE_r5f.log [F3]); major-dim collapses, batched dots and sublane
slices are the relay-proven vocabulary (ops/pallas_attention.py).

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
    x = x_ref[...]                                       # [T, E, pb]
    # qkvT[i] = winT @ x[i] + b : one batched dot over the token axis
    # (the 1/sqrt(hd) q-scale is folded into winT's q-rows offline)
    winb = jnp.broadcast_to(win_ref[:][None], (t,) + win_ref.shape)
    qkvT = jax.lax.dot_general(winb, x, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=f32)
    qkvT = (qkvT + bin_ref[:][None].astype(f32)).astype(dt)  # [T, 3E, pb]

    out_rows = []
    for i in range(t):
        row_i = []
        for h in range(nh):
            # every slice below is a 16-aligned sublane slab of qkvT's
            # middle dim; no extent-1 / unaligned slices (the relay's
            # Mosaic aborts on those — MEASURE_r5g.log [G0])
            q = qkvT[i, h * hd: (h + 1) * hd]            # [hd, pb]
            K = qkvT[:, e + h * hd: e + (h + 1) * hd]    # [T, hd, pb]
            L = jnp.sum((q[None] * K).astype(f32), axis=1)  # [T, pb]
            L = L - L.max(axis=0, keepdims=True)
            L = jnp.exp(L)
            W = L / L.sum(axis=0, keepdims=True)         # [T, pb] f32
            V = qkvT[:, 2 * e + h * hd: 2 * e + (h + 1) * hd]
            acc = jnp.sum(W[:, None] * V.astype(f32), axis=0)
            row_i.append(acc.astype(dt))                 # [hd, pb]
        out_rows.append(jnp.concatenate(row_i, axis=0))  # [E, pb]
    OT = jnp.stack(out_rows, axis=0)                     # [T, E, pb]
    woutb = jnp.broadcast_to(wout_ref[:][None], (t,) + wout_ref.shape)
    out = jax.lax.dot_general(woutb, OT, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=f32)
    o_ref[...] = (out + bout_ref[:][None].astype(f32)).astype(o_ref.dtype)


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

    # fold the 1/sqrt(hd) q-scale into the q-section of the projection;
    # the kernel consumes the TRANSPOSED weights ([3E, E] / [E, E]) and
    # column biases so its dots produce channel-on-sublane slabs directly
    scale = jnp.asarray(hd, jnp.float32) ** -0.5
    win = jnp.concatenate(
        [in_proj_w[:, :e].astype(jnp.float32) * scale,
         in_proj_w[:, e:].astype(jnp.float32)], axis=1).astype(x.dtype)
    win_t = win.T                                        # [3E, E]
    wout_t = out_w.astype(x.dtype).T                     # [E, E]

    pb = 512
    # biases pre-broadcast to full lane width: a [3E, 1]/[E, 1] block has
    # lane extent 1, which the relay's Mosaic rejects (hard abort,
    # MEASURE_r5g.log [G0]); [., pb] constants are tiny (<=196 KB) and
    # DMA'd once (constant index map)
    bin_ = jnp.broadcast_to(jnp.concatenate(
        [in_proj_b[:e].astype(jnp.float32) * scale,
         in_proj_b[e:].astype(jnp.float32)]).astype(x.dtype)[:, None],
        (3 * e, pb))
    bout = jnp.broadcast_to(out_b.astype(x.dtype)[:, None], (e, pb))
    pp = -(-p // pb) * pb
    if pp != p:
        x = jnp.pad(x, [(0, pp - p), (0, 0), (0, 0)])
    xt = x.transpose(1, 2, 0)                            # [T, E, pp]

    def const(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_token_attn_kernel, t=t, e=e, nh=num_heads,
                          pb=pb),
        grid=(pp // pb,),
        in_specs=[pl.BlockSpec((t, e, pb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  const(win_t), const(bin_), const(wout_t), const(bout)],
        out_specs=pl.BlockSpec((t, e, pb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, e, pp), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=pp * t * (2 * e * 3 * e + 2 * e * e)
            + pp * num_heads * t * t * hd * 4,
            bytes_accessed=2 * pp * t * e * x.dtype.itemsize,
            transcendentals=pp * num_heads * t * t,
        ),
        interpret=interpret,
    )(xt, win_t, bin_, wout_t, bout)
    return out.transpose(2, 0, 1)[:p]
