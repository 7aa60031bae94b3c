"""Fused window attention as a Pallas TPU kernel.

The XLA path (ops/window_attention.py) materializes the per-window
attention tensor [B*nW, nH, N, N] in HBM between the two matmuls — for a
512x352-class DIV2K image through DRCT (nW=704, nH=6, N=256) that's >1 GB
of HBM traffic per attention layer, 60 layers deep. This kernel keeps the
whole QK^T -> +bias/mask -> softmax -> @V chain resident in VMEM with fp32
accumulation on the MXU.

Grid granularity: one step per *group* of windows (windows_per_block),
not per window — per-step dispatch overhead dominates at one 256-token
window per step (measured ~9us/step on v5e), so windows are batched into
each step and iterated with a static Python loop inside the kernel.

The relative-position bias [nH, N, N] is shared by every window and rides
in VMEM; the shifted-window mask [nW, N, N] varies per window and streams
per grid step via its BlockSpec index map.

Used by DRCT's 16x16 windows (N=256) and HAT's windows; GRL's anchored
stripe attention (N1=64/N2=16) stays on the einsum path — its tensors are
too small for a kernel to pay off.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention", "fused_window_attention_nhwc"]


def _attn_body(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
               num_heads: int, scale: float, wpb: int):
    c = q_ref.shape[2]
    hd = c // num_heads
    in_dtype = q_ref.dtype  # bf16 inputs run the MXU at 2x; accum is fp32
    for w in range(wpb):
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            q = q_ref[w, :, sl] * jnp.asarray(scale, in_dtype)
            k = k_ref[w, :, sl]
            v = v_ref[w, :, sl]
            attn = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [N, N] fp32
            attn = attn + bias_ref[h].astype(jnp.float32)
            if mask_ref is not None:
                attn = attn + mask_ref[w].astype(jnp.float32)
            attn = attn - attn.max(axis=-1, keepdims=True)
            attn = jnp.exp(attn)
            attn = attn / attn.sum(axis=-1, keepdims=True)
            out = jnp.dot(attn.astype(in_dtype), v,
                          preferred_element_type=jnp.float32)
            o_ref[w, :, sl] = out.astype(o_ref.dtype)


def _kernel_nomask(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads: int,
                   scale: float, wpb: int):
    _attn_body(q_ref, k_ref, v_ref, bias_ref, None, o_ref, num_heads, scale,
               wpb)


def _kernel_mask(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                 num_heads: int, scale: float, wpb: int):
    _attn_body(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, num_heads,
               scale, wpb)


def _pick_wpb(b_: int, nw: Optional[int], n: int, c: int) -> int:
    """Largest group size that divides the batch (and the mask period),
    bounded by a VMEM budget for the q/k/v/o blocks (x2: the pipeline
    double-buffers blocks; ~16 MB VMEM total on v5e)."""
    budget = 4 * 1024 * 1024  # bytes for the 4 data blocks, pre-double-buffer
    per_window = 4 * n * c * 4
    cap = max(1, budget // per_window)
    for wpb in (16, 8, 4, 2, 1):
        if wpb > cap or b_ % wpb:
            continue
        if nw is not None and nw % wpb:
            continue
        return wpb
    return 1


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "interpret"))
def fused_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray,
                           mask: Optional[jnp.ndarray],
                           num_heads: int,
                           scale: Optional[float] = None,
                           interpret: bool = False) -> jnp.ndarray:
    """q, k, v: [B_, N, C]; bias: [nH, N, N]; mask: [nW, N, N] or None.

    B_ = B * nW with the nW windows of one image contiguous, matching
    ops/window_attention.window_partition.
    """
    b_, n, c = q.shape
    hd = c // num_heads
    scale = float(hd ** -0.5) if scale is None else float(scale)
    nw = None if mask is None else mask.shape[0]
    wpb = _pick_wpb(b_, nw, n, c)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # CPU has no Mosaic; tests force FREQFUSION_PALLAS=1

    qkv_spec = pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    if mask is None:
        kernel = functools.partial(_kernel_nomask, num_heads=num_heads,
                                   scale=scale, wpb=wpb)
        in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
        args = (q, k, v, bias)
    else:
        mask_period = nw // wpb
        mask_spec = pl.BlockSpec((wpb, n, n), lambda i: (i % mask_period, 0, 0),
                                 memory_space=pltpu.VMEM)
        kernel = functools.partial(_kernel_mask, num_heads=num_heads,
                                   scale=scale, wpb=wpb)
        in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec]
        args = (q, k, v, bias, mask)

    flops_per = num_heads * (2 * n * n * hd * 2)
    return pl.pallas_call(
        kernel,
        grid=(b_ // wpb,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b_, n, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * b_,
            bytes_accessed=3 * b_ * n * c * 4 + b_ * n * c * 4,
            transcendentals=b_ * num_heads * n * n,
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# NHWC-direct variant: window partition/reverse live INSIDE the kernel
# ---------------------------------------------------------------------------
#
# Profiling the XLA-side partition (reshape->transpose->reshape) showed it
# forces materialized layout-change copies around every attention call and
# pushes XLA into odd tilings (T(2,128)) for the surrounding residual adds
# — ~145 ms/image of pure copy time in DRCT at 336x512. Here the kernel
# reads [1, ws, ws*wpb, C] strips of the plain NHWC tensor via BlockSpec
# index maps and merges each [ws, ws, C] window to [N, C] in VMEM (a
# sublane-dim merge Mosaic accepts), so the surrounding graph stays in
# standard NHWC T(8,128) layout end to end.


def _attn_nhwc_body(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
                    num_heads: int, scale: float, ws: int, wpb: int):
    c = q_ref.shape[3]
    n = ws * ws
    hd = c // num_heads
    in_dtype = q_ref.dtype
    for w in range(wpb):
        sl_w = slice(w * ws, (w + 1) * ws)
        q_w = q_ref[0, :, sl_w, :].reshape(n, c)
        k_w = k_ref[0, :, sl_w, :].reshape(n, c)
        v_w = v_ref[0, :, sl_w, :].reshape(n, c)
        out_heads = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            q = q_w[:, sl] * jnp.asarray(scale, in_dtype)
            attn = jax.lax.dot_general(
                q, k_w[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [N, N] fp32
            attn = attn + bias_ref[h].astype(jnp.float32)
            if mask_ref is not None:
                attn = attn + mask_ref[w].astype(jnp.float32)
            attn = attn - attn.max(axis=-1, keepdims=True)
            attn = jnp.exp(attn)
            attn = attn / attn.sum(axis=-1, keepdims=True)
            out = jnp.dot(attn.astype(in_dtype), v_w[:, sl],
                          preferred_element_type=jnp.float32)
            out_heads.append(out.astype(o_ref.dtype))
        o_w = jnp.concatenate(out_heads, axis=-1)             # [N, C]
        o_ref[0, :, sl_w, :] = o_w.reshape(ws, ws, c)


def _nhwc_kernel_nomask(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                        num_heads: int, scale: float, ws: int, wpb: int):
    _attn_nhwc_body(q_ref, k_ref, v_ref, bias_ref, None, o_ref,
                    num_heads, scale, ws, wpb)


def _nhwc_kernel_mask(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                      num_heads: int, scale: float, ws: int, wpb: int):
    _attn_nhwc_body(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
                    num_heads, scale, ws, wpb)


def _pick_wpb_nhwc(nww: int, ws: int, c: int, itemsize: int) -> int:
    """Windows per grid step, bounded so the 4 double-buffered data blocks
    stay within ~8 MB of VMEM (16 MB/core on v5e)."""
    budget = 8 * 1024 * 1024
    per_window = 4 * 2 * ws * ws * c * itemsize  # q/k/v/o, double-buffered
    cap = max(1, budget // per_window)
    for wpb in (16, 8, 4, 2, 1):
        if wpb <= cap and nww % wpb == 0:
            return wpb
    return 1


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "window_size", "interpret"))
def fused_window_attention_nhwc(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, bias: jnp.ndarray,
                                mask: Optional[jnp.ndarray],
                                num_heads: int, window_size: int,
                                scale: Optional[float] = None,
                                interpret: bool = False) -> jnp.ndarray:
    """q, k, v: [B, H, W, C] with H % ws == 0 == W % ws; bias [nH, N, N];
    mask [nW, N, N] (row-major window order) or None. Returns [B, H, W, C].

    Semantically identical to window_partition -> fused_window_attention ->
    window_reverse (drct_arch.py:127-222 attention), with the partition
    done by BlockSpec tiling instead of XLA reshapes."""
    b, hh, ww_, c = q.shape
    ws = window_size
    n = ws * ws
    hd = c // num_heads
    scale = float(hd ** -0.5) if scale is None else float(scale)
    nwh, nww = hh // ws, ww_ // ws
    wpb = _pick_wpb_nhwc(nww, ws, c, q.dtype.itemsize)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    steps_w = nww // wpb
    data_spec = pl.BlockSpec((1, ws, ws * wpb, c),
                             lambda bi, i, j: (bi, i, j, 0),
                             memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, n, n), lambda bi, i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    if mask is None:
        kernel = functools.partial(_nhwc_kernel_nomask, num_heads=num_heads,
                                   scale=scale, ws=ws, wpb=wpb)
        in_specs = [data_spec, data_spec, data_spec, bias_spec]
        args = (q, k, v, bias)
    else:
        mask_spec = pl.BlockSpec(
            (wpb, n, n), lambda bi, i, j: (i * steps_w + j, 0, 0),
            memory_space=pltpu.VMEM)
        kernel = functools.partial(_nhwc_kernel_mask, num_heads=num_heads,
                                   scale=scale, ws=ws, wpb=wpb)
        in_specs = [data_spec, data_spec, data_spec, bias_spec, mask_spec]
        args = (q, k, v, bias, mask.astype(q.dtype))

    flops_per = num_heads * (2 * n * n * hd * 2)
    nw = nwh * nww
    return pl.pallas_call(
        kernel,
        grid=(b, nwh, steps_w),
        in_specs=in_specs,
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww_, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * b * nw,
            bytes_accessed=4 * b * hh * ww_ * c * q.dtype.itemsize,
            transcendentals=b * nw * num_heads * n * n,
        ),
        interpret=interpret,
    )(*args)
