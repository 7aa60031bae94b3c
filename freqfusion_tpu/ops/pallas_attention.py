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

__all__ = ["fused_window_attention", "fused_window_attention_nhwc",
           "fused_window_attention_qkv_nhwc",
           "fused_grl_mixed_attention_nhwc",
           "fused_grl_mixed_attention_qkv_nhwc"]


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


def _attn_heads(q_all, k_all, v_all, bias_ref, mask, num_heads: int,
                scale: float, out_dtype):
    """Batched per-head window attention over [W, N, C] tiles -> [W, N, C].
    All wpb windows ride a dot_general batch dimension (one dot pair per
    head, softmax vectorized over [wpb*N, N]) — per-(window, head)
    unrolled bodies measured ~5x slower in the GRL mixed kernel."""
    c = q_all.shape[-1]
    hd = c // num_heads
    in_dtype = q_all.dtype
    f32 = jnp.float32
    heads = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_all[:, :, sl] * jnp.asarray(scale, in_dtype)
        attn = jax.lax.dot_general(q, k_all[:, :, sl],
                                   dimension_numbers=_BATCHED_DOT,
                                   preferred_element_type=f32)  # [W,N,N]
        attn = attn + bias_ref[h].astype(f32)[None]
        if mask is not None:
            attn = attn + mask
        attn = attn - attn.max(axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / attn.sum(axis=-1, keepdims=True)
        heads.append(jax.lax.dot_general(
            attn.astype(in_dtype), v_all[:, :, sl],
            dimension_numbers=_BATCHED_PV,
            preferred_element_type=f32).astype(out_dtype))      # [W,N,hd]
    return jnp.concatenate(heads, -1)


def _attn_nhwc_body(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
                    num_heads: int, scale: float, ws: int, wpb: int):
    c = q_ref.shape[3]
    f32 = jnp.float32
    q_all = _tiles(q_ref, ws, wpb, c)
    k_all = _tiles(k_ref, ws, wpb, c)
    v_all = _tiles(v_ref, ws, wpb, c)
    mask = None if mask_ref is None else mask_ref[...].astype(f32)
    out = _attn_heads(q_all, k_all, v_all, bias_ref, mask, num_heads,
                      scale, o_ref.dtype)
    o_ref[0] = _untile(out, ws, wpb, c)[0]


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
    PLUS the window-batched body's fp32 attention scratch (attn + softmax
    temps live across the whole batched softmax) stay within ~8 MB of
    VMEM (16 MB/core on v5e)."""
    budget = 8 * 1024 * 1024
    n = ws * ws
    per_window = (4 * 2 * n * c * itemsize   # q/k/v/o blocks, double-buffered
                  + 3 * n * n * 4)           # [W,N,N] fp32 attn scratch
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


# ---------------------------------------------------------------------------
# GRL mixed attention: window + anchored-stripe halves in ONE NHWC pass
# ---------------------------------------------------------------------------
#
# GRL-B's 8x8 windows were measured too small for the window-only NHWC
# kernel to beat the einsum route (0.72 vs 0.67 s/img), because the stripe
# half still paid XLA window_partition/window_reverse + head transposes
# regardless — the round-3 GRL trace shows a 218 ms copy bucket (a third
# of the expert) plus 54 ms of fp32 softmax/norm reduction materialization.
# GRL-B pins stripe_size == window_size == 8 (grl/__init__.py:76-160), so
# both halves share tile geometry: this kernel computes, per 8x8 tile,
#   - the cosine window attention (bias + optional shift mask), and
#   - the two-step anchored stripe attention (anchor<-window over the 4x4
#     anchor tile, then query<-anchor; mixed_attn_block_efficient.py:177-279)
# entirely in VMEM, so the surrounding graph keeps plain NHWC layout and
# every partition/head copy disappears. L2 normalization and the clamped
# logit scales are folded into the q/anchor operands outside (elementwise,
# XLA-fused); softmax accumulates fp32 like the einsum path.


_BATCHED_DOT = (((2,), (2,)), ((0,), (0,)))   # [W,N,hd] x [W,M,hd] -> [W,N,M]
_BATCHED_PV = (((2,), (1,)), ((0,), (0,)))    # [W,N,M] x [W,M,hd] -> [W,N,hd]


def _tiles(ref, tile: int, wpb: int, c: int):
    """[1, t, t*wpb, C] block -> [wpb, t*t, C] window-batched form.
    The merge touches only leading/sublane dims (lanes stay C-contiguous),
    which Mosaic relayouts cheaply."""
    x = ref[0].reshape(tile, wpb, tile, c)
    return x.transpose(1, 0, 2, 3).reshape(wpb, tile * tile, c)


def _untile(x, tile: int, wpb: int, c: int):
    """[wpb, t*t, C] -> [1, t, t*wpb, C] (inverse of _tiles)."""
    x = x.reshape(wpb, tile, tile, c).transpose(1, 0, 2, 3)
    return x.reshape(1, tile, tile * wpb, c)


def _bsoftmax(attn):
    attn = attn - attn.max(axis=-1, keepdims=True)
    attn = jnp.exp(attn)
    return attn / attn.sum(axis=-1, keepdims=True)


def _head_seg(c: int, nh: int) -> jnp.ndarray:
    """[C, nH] 0/1 head-membership matrix, built from iota in-kernel."""
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, nh), 0)
    hi = jax.lax.broadcasted_iota(jnp.int32, (c, nh), 1)
    return (ci // (c // nh) == hi).astype(jnp.float32)


def _cosnorm(x, seg, dt):
    """Per-head L2 normalization of [W, N, C] in VMEM (torch F.normalize
    eps semantics). The per-head sum-of-squares and its broadcast back to
    channels ride two tiny MXU dots against the 0/1 segment matrix —
    no lane-misaligned reductions (hd=30 blocks are not lane-aligned)."""
    xf = x.astype(jnp.float32)
    ss = jax.lax.dot_general(xf * xf, seg,
                             (((2,), (0,)), ((), ())))        # [W, N, nH]
    inv = 1.0 / jnp.maximum(jnp.sqrt(ss), 1e-12)
    invc = jax.lax.dot_general(inv, seg,
                               (((2,), (1,)), ((), ())))      # [W, N, C]
    return (xf * invc).astype(dt)


def _grl_mixed_core(qw, kw, vw, qs, ks, vs, an,
                    sw_ref, s1_ref, s2_ref,
                    bias_w_ref, bias_s1_ref, bias_s2_ref,
                    mask, ow_ref, os_ref, num_heads_w: int,
                    num_heads_s: int, ws: int, wpb: int):
    """Mixed window + anchored-stripe attention over already-tiled
    [wpb, N, C2] values (and [wpb, Na, C2] anchor)."""
    c = qw.shape[-1]
    hdw = c // num_heads_w
    hds = c // num_heads_s
    dt = qw.dtype
    f32 = jnp.float32
    seg_w = _head_seg(c, num_heads_w)
    seg_s = _head_seg(c, num_heads_s)

    # All wpb windows of the step ride a batch dimension: one dot_general
    # pair per head instead of per (window, head), and softmax vectorizes
    # over [wpb*N, N] — per-step instruction count drops ~wpb-fold. The
    # clamped logit scale is a per-head scalar, so it commutes with the
    # cosine dot and multiplies the attention logits here instead of q.
    qw = _cosnorm(qw, seg_w, dt)
    kw = _cosnorm(kw, seg_w, dt)
    heads = []
    for h in range(num_heads_w):
        sl = slice(h * hdw, (h + 1) * hdw)
        attn = jax.lax.dot_general(qw[:, :, sl], kw[:, :, sl],
                                   dimension_numbers=_BATCHED_DOT,
                                   preferred_element_type=f32)  # [W,N,N]
        attn = attn * sw_ref[h].astype(f32)
        attn = attn + bias_w_ref[h].astype(f32)[None]
        if mask is not None:
            attn = attn + mask
        heads.append(jax.lax.dot_general(
            _bsoftmax(attn).astype(dt), vw[:, :, sl],
            dimension_numbers=_BATCHED_PV,
            preferred_element_type=f32).astype(dt))             # [W,N,hd]
    ow_ref[0] = _untile(jnp.concatenate(heads, -1), ws, wpb, c)[0]

    qs = _cosnorm(qs, seg_s, dt)
    ks = _cosnorm(ks, seg_s, dt)
    an = _cosnorm(an, seg_s, dt)
    heads = []
    for h in range(num_heads_s):
        sl = slice(h * hds, (h + 1) * hds)
        # stage 1: anchor queries attend to the window keys/values
        attn1 = jax.lax.dot_general(an[:, :, sl], ks[:, :, sl],
                                    dimension_numbers=_BATCHED_DOT,
                                    preferred_element_type=f32)  # [W,Na,N]
        attn1 = attn1 * s1_ref[h].astype(f32)
        x1 = jax.lax.dot_general(
            _bsoftmax(attn1 + bias_s1_ref[h].astype(f32)[None]).astype(dt),
            vs[:, :, sl], dimension_numbers=_BATCHED_PV,
            preferred_element_type=f32).astype(dt)               # [W,Na,hd]
        # stage 2: window queries attend to the anchor summary
        attn2 = jax.lax.dot_general(qs[:, :, sl], an[:, :, sl],
                                    dimension_numbers=_BATCHED_DOT,
                                    preferred_element_type=f32)  # [W,N,Na]
        attn2 = attn2 * s2_ref[h].astype(f32)
        heads.append(jax.lax.dot_general(
            _bsoftmax(attn2 + bias_s2_ref[h].astype(f32)[None]).astype(dt),
            x1, dimension_numbers=_BATCHED_PV,
            preferred_element_type=f32).astype(dt))              # [W,N,hd]
    os_ref[0] = _untile(jnp.concatenate(heads, -1), ws, wpb, c)[0]


def _grl_mixed_body(qw_ref, kw_ref, vw_ref, qs_ref, ks_ref, vs_ref,
                    a_ref, sw_ref, s1_ref, s2_ref,
                    bias_w_ref, bias_s1_ref, bias_s2_ref,
                    mask_ref, ow_ref, os_ref, num_heads_w: int,
                    num_heads_s: int, ws: int, df: int, wpb: int):
    c = qw_ref.shape[3]
    aws = ws // df
    f32 = jnp.float32
    mask = None if mask_ref is None else mask_ref[...].astype(f32)
    _grl_mixed_core(_tiles(qw_ref, ws, wpb, c), _tiles(kw_ref, ws, wpb, c),
                    _tiles(vw_ref, ws, wpb, c), _tiles(qs_ref, ws, wpb, c),
                    _tiles(ks_ref, ws, wpb, c), _tiles(vs_ref, ws, wpb, c),
                    _tiles(a_ref, aws, wpb, c),
                    sw_ref, s1_ref, s2_ref,
                    bias_w_ref, bias_s1_ref, bias_s2_ref,
                    mask, ow_ref, os_ref, num_heads_w, num_heads_s, ws, wpb)


def _grl_kernel_nomask(qw, kw, vw, qs, ks, vs, a, sw, s1, s2, bw, b1, b2,
                       ow, os_, *, num_heads_w, num_heads_s, ws, df, wpb):
    _grl_mixed_body(qw, kw, vw, qs, ks, vs, a, sw, s1, s2, bw, b1, b2,
                    None, ow, os_, num_heads_w, num_heads_s, ws, df, wpb)


def _grl_kernel_mask(qw, kw, vw, qs, ks, vs, a, sw, s1, s2, bw, b1, b2,
                     mask, ow, os_, *, num_heads_w, num_heads_s, ws, df,
                     wpb):
    _grl_mixed_body(qw, kw, vw, qs, ks, vs, a, sw, s1, s2, bw, b1, b2,
                    mask, ow, os_, num_heads_w, num_heads_s, ws, df, wpb)


def _grl_qkv_body(x_ref, xr_ref, a_ref, wq_ref, bq_ref,
                  sw_ref, s1_ref, s2_ref,
                  bias_w_ref, bias_s1_ref, bias_s2_ref,
                  mask_ref, ow_ref, os_ref, num_heads_w: int,
                  num_heads_s: int, ws: int, df: int, wpb: int,
                  c2: int, cseg: int):
    """Mixed attention with the 6-way qkv projection IN-KERNEL: the
    window half projects from the (pre-rolled, for shifted blocks)
    x strip, the stripe half from the unrolled strip — one MXU dot each
    against lane-tile-aligned packed weight segments."""
    cin = x_ref.shape[3]
    aws = ws // df
    n = ws * ws
    dt = x_ref.dtype
    f32 = jnp.float32

    def proj3(ref, lo):
        xt = _tiles(ref, ws, wpb, cin).reshape(wpb * n, cin)
        out = jax.lax.dot_general(
            xt, wq_ref[:, lo: lo + 3 * cseg], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        out = (out + bq_ref[:, lo: lo + 3 * cseg].astype(f32)).astype(dt)
        return tuple(out[:, i * cseg: i * cseg + c2].reshape(wpb, n, c2)
                     for i in range(3))

    qw, kw, vw = proj3(xr_ref, 0)
    qs, ks, vs = proj3(x_ref, 3 * cseg)
    an = _tiles(a_ref, aws, wpb, c2)
    mask = None if mask_ref is None else mask_ref[...].astype(f32)
    _grl_mixed_core(qw, kw, vw, qs, ks, vs, an,
                    sw_ref, s1_ref, s2_ref,
                    bias_w_ref, bias_s1_ref, bias_s2_ref,
                    mask, ow_ref, os_ref, num_heads_w, num_heads_s, ws, wpb)


def _grl_qkv_kernel_nomask(x, a, wq, bq, sw, s1, s2, bw, b1, b2, ow, os_,
                           **kw):
    _grl_qkv_body(x, x, a, wq, bq, sw, s1, s2, bw, b1, b2, None, ow, os_,
                  **kw)


def _grl_qkv_kernel_mask(x, xr, a, wq, bq, sw, s1, s2, bw, b1, b2, mask,
                         ow, os_, **kw):
    _grl_qkv_body(x, xr, a, wq, bq, sw, s1, s2, bw, b1, b2, mask, ow, os_,
                  **kw)


def _pick_wpb_grl(nww: int, ws: int, aws: int, c: int, itemsize: int) -> int:
    """Tiles per grid step: 8 window-sized + 1 anchor-sized data blocks,
    double-buffered, within ~8 MB of VMEM."""
    budget = 8 * 1024 * 1024
    per_window = (8 * ws * ws + aws * aws) * c * itemsize * 2
    cap = max(1, budget // per_window)
    for wpb in (32, 16, 8, 4, 2, 1):
        if wpb <= cap and nww % wpb == 0:
            return wpb
    return 1


def _pick_wpb_grl_qkv(nww: int, ws: int, aws: int, cin: int, c2: int,
                      cseg: int, itemsize: int, shifted: bool,
                      num_heads_w: int, num_heads_s: int) -> int:
    """VMEM bound for the qkv-in-kernel GRL route (ADVICE r3): x
    (+x_rolled when shifted) and the two C/2 outputs double-buffered,
    the fp32 [wpb*N, 3*cseg] projection intermediates for BOTH halves
    plus their io-dtype q/k/v values, and the fp32 attention scratch
    ([N,N] window + [Na,N]/[N,Na] stripe) — none of which _pick_wpb_grl
    counts. ADVICE r4: also count the shifted-mode [wpb,N,N] mask block
    (double-buffered like the data) and the resident fp32 attention-bias
    tables bias_w [nHw,N,N] / bias_s1 [nHs,Na,N] / bias_s2 [nHs,N,Na]."""
    budget = 8 * 1024 * 1024
    n, na = ws * ws, aws * aws
    x_blocks = (2 if shifted else 1) * n * cin
    mask_blk = n * n if shifted else 0               # io-dtype mask block
    data = (x_blocks + mask_blk + na * c2 + 2 * n * c2) * itemsize * 2
    proj = n * 6 * cseg * 4 + n * 6 * c2 * itemsize  # fp32 dots + dt cast
    attn = (n * n + na * n + n * na) * 4
    per_window = data + proj + attn
    fixed = ((cin + 1) * 6 * cseg * itemsize         # packed weights+bias
             + (num_heads_w * n * n + num_heads_s * 2 * na * n) * 4)
    cap = max(1, (budget - fixed) // per_window)
    for wpb in (32, 16, 8, 4, 2, 1):
        if wpb <= cap and nww % wpb == 0:
            return wpb
    return 1


@functools.partial(jax.jit, static_argnames=(
    "num_heads_w", "num_heads_s", "window_size", "down_factor", "interpret"))
def fused_grl_mixed_attention_nhwc(
        qw: jnp.ndarray, kw: jnp.ndarray, vw: jnp.ndarray,
        qs: jnp.ndarray, ks: jnp.ndarray, vs: jnp.ndarray,
        anchor: jnp.ndarray,
        scale_w: jnp.ndarray, scale_s1: jnp.ndarray, scale_s2: jnp.ndarray,
        bias_w: jnp.ndarray, bias_s1: jnp.ndarray, bias_s2: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        num_heads_w: int, num_heads_s: int, window_size: int,
        down_factor: int = 2, interpret: bool = False):
    """GRL mixed attention over plain NHWC tensors.

    qw/kw/vw, qs/ks/vs: [B, H, W, C/2] raw window and stripe halves
    (qw/kw/vw pre-rolled for shifted blocks); anchor [B, H/df, W/df, C/2]
    raw. Per-head L2 normalization happens in-kernel; the clamped logit
    scales (scale_* [nH, 1, 1]) multiply the attention logits (a per-head
    scalar commutes with the cosine dot). bias_w [nHw, N, N], bias_s1
    [nHs, Na, N], bias_s2 [nHs, N, Na]; mask [nW, N, N] or None.
    Returns (window_out, stripe_out), each [B, H, W, C/2]."""
    b, hh, ww_, c = qw.shape
    ws = window_size
    aws = ws // down_factor
    n = ws * ws
    na = aws * aws
    nwh, nww = hh // ws, ww_ // ws
    wpb = _pick_wpb_grl(nww, ws, aws, c, qw.dtype.itemsize)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    steps_w = nww // wpb
    win_spec = pl.BlockSpec((1, ws, ws * wpb, c),
                            lambda bi, i, j: (bi, i, j, 0),
                            memory_space=pltpu.VMEM)
    anc_spec = pl.BlockSpec((1, aws, aws * wpb, c),
                            lambda bi, i, j: (bi, i, j, 0),
                            memory_space=pltpu.VMEM)
    scale_w_spec = pl.BlockSpec((num_heads_w, 1, 1),
                                lambda bi, i, j: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    scale_s_spec = pl.BlockSpec((num_heads_s, 1, 1),
                                lambda bi, i, j: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    bw_spec = pl.BlockSpec((num_heads_w, n, n), lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((num_heads_s, na, n), lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((num_heads_s, n, na), lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    static = dict(num_heads_w=num_heads_w, num_heads_s=num_heads_s, ws=ws,
                  df=down_factor, wpb=wpb)
    common_specs = [win_spec] * 6 + [anc_spec, scale_w_spec, scale_s_spec,
                                     scale_s_spec, bw_spec, b1_spec, b2_spec]
    common_args = (qw, kw, vw, qs, ks, vs, anchor, scale_w, scale_s1,
                   scale_s2, bias_w, bias_s1, bias_s2)
    if mask is None:
        kernel = functools.partial(_grl_kernel_nomask, **static)
        in_specs = common_specs
        args = common_args
    else:
        mask_spec = pl.BlockSpec(
            (wpb, n, n), lambda bi, i, j: (i * steps_w + j, 0, 0),
            memory_space=pltpu.VMEM)
        kernel = functools.partial(_grl_kernel_mask, **static)
        in_specs = common_specs + [mask_spec]
        args = common_args + (mask.astype(qw.dtype),)

    nw = nwh * nww
    hdw, hds = c // num_heads_w, c // num_heads_s
    flops_per = (num_heads_w * 2 * n * n * hdw * 2
                 + num_heads_s * 2 * (na * n + n * na) * hds * 2)
    return pl.pallas_call(
        kernel,
        grid=(b, nwh, steps_w),
        in_specs=in_specs,
        out_specs=(win_spec, win_spec),
        out_shape=(jax.ShapeDtypeStruct((b, hh, ww_, c), qw.dtype),
                   jax.ShapeDtypeStruct((b, hh, ww_, c), qw.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * b * nw,
            bytes_accessed=8 * b * hh * ww_ * c * qw.dtype.itemsize,
            transcendentals=b * nw * (num_heads_w * n * n
                                      + num_heads_s * 2 * na * n),
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# qkv + output projection INSIDE the window-attention kernel
# ---------------------------------------------------------------------------
#
# The NHWC kernel still pays an XLA boundary per layer: the packed qkv
# projection materializes three [B, H, W, C] tensors (write + kernel
# re-read ~500 MB/layer at DRCT geometry), their bias adds run as
# separate elementwise passes (45 ms/img across DRCT's 60 layers in the
# r3 trace), and the output projection re-reads the attention output.
# This variant reads x once per block and computes
#     qkv  = x @ Wqkv + b      (ONE dot; q/k/v segments zero-padded to
#                               lane-tile-aligned 128-multiple columns)
#     attn = window attention  (shared _attn_heads body)
#     out  = attn @ Wproj + b  (one more dot)
# entirely in VMEM. Param layout matches SplitQKV/Dense so the converted
# torch weights feed both routes. Gated by FREQFUSION_ATTN_QKV (default
# OFF until the hardware A/B lands — the scan-v6 experience says per-
# block dots on reshaped operands can carry fixed costs).


def _qkv_kernel_body(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                     mask_ref, o_ref, *, num_heads: int, scale: float,
                     ws: int, wpb: int, c: int, cseg: int):
    cin = x_ref.shape[3]
    n = ws * ws
    dt = x_ref.dtype
    f32 = jnp.float32
    x_all = _tiles(x_ref, ws, wpb, cin)                  # [W, N, Cin]
    x2 = x_all.reshape(wpb * n, cin)
    qkv = jax.lax.dot_general(x2, wqkv_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    qkv = (qkv + bqkv_ref[:].astype(f32)).astype(dt)     # [W*N, 3*Cseg]
    q_all = qkv[:, :c].reshape(wpb, n, c)
    k_all = qkv[:, cseg: cseg + c].reshape(wpb, n, c)
    v_all = qkv[:, 2 * cseg: 2 * cseg + c].reshape(wpb, n, c)
    mask = None if mask_ref is None else mask_ref[...].astype(f32)
    out = _attn_heads(q_all, k_all, v_all, bias_ref, mask, num_heads,
                      scale, dt)
    out = jax.lax.dot_general(out.reshape(wpb * n, c), wp_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    out = (out + bp_ref[:].astype(f32)).astype(o_ref.dtype)
    o_ref[0] = _untile(out.reshape(wpb, n, c), ws, wpb, c)[0]


def _qkv_kernel_nomask(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                       o_ref, **kw):
    _qkv_kernel_body(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                     None, o_ref, **kw)


def _qkv_kernel_mask(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                     mask_ref, o_ref, **kw):
    _qkv_kernel_body(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                     mask_ref, o_ref, **kw)


def _pick_wpb_qkv(nww: int, ws: int, c: int, cseg: int, itemsize: int) -> int:
    """VMEM bound: x/o blocks (double-buffered), the [W*N, 3*Cseg] qkv
    value, fp32 attention scratch, and the two weight operands."""
    budget = 8 * 1024 * 1024
    n = ws * ws
    per_window = (2 * 2 * n * c * itemsize          # x/o blocks, dbuf
                  + 3 * n * cseg * itemsize         # qkv value
                  + 3 * n * n * 4)                  # fp32 attn scratch
    cap = max(1, (budget - 4 * c * cseg * itemsize) // per_window)
    for wpb in (16, 8, 4, 2, 1):
        if wpb <= cap and nww % wpb == 0:
            return wpb
    return 1


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "window_size", "interpret"))
def fused_window_attention_qkv_nhwc(x: jnp.ndarray,
                                    wqkv: jnp.ndarray, bqkv: jnp.ndarray,
                                    wproj: jnp.ndarray, bproj: jnp.ndarray,
                                    bias: jnp.ndarray,
                                    mask: Optional[jnp.ndarray],
                                    num_heads: int, window_size: int,
                                    scale: Optional[float] = None,
                                    interpret: bool = False) -> jnp.ndarray:
    """x: [B, H, W, Cin]; wqkv: [Cin, 3C] (torch MHA packed layout),
    bqkv: [3C]; wproj: [C, C], bproj: [C]; bias [nH, N, N];
    mask [nW, N, N] or None. Returns proj(window_attention(qkv(x))),
    [B, H, W, C]."""
    b, hh, ww_, cin = x.shape
    c = wqkv.shape[1] // 3
    ws = window_size
    n = ws * ws
    hd = c // num_heads
    scale = float(hd ** -0.5) if scale is None else float(scale)
    nwh, nww = hh // ws, ww_ // ws
    cseg = -(-c // 128) * 128
    wpb = _pick_wpb_qkv(nww, ws, c, cseg, x.dtype.itemsize)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    # lane-tile-aligned q|k|v segments (zero-padded to Cseg columns each)
    def seg(i):
        return jnp.pad(wqkv[:, i * c: (i + 1) * c], [(0, 0), (0, cseg - c)])

    wq_packed = jnp.concatenate([seg(0), seg(1), seg(2)], 1).astype(x.dtype)
    bq_packed = jnp.concatenate(
        [jnp.pad(bqkv[i * c: (i + 1) * c], [(0, cseg - c)])
         for i in range(3)]).reshape(1, 3 * cseg).astype(x.dtype)
    wp = wproj.astype(x.dtype)
    bp = bproj.reshape(1, c).astype(x.dtype)

    steps_w = nww // wpb
    x_spec = pl.BlockSpec((1, ws, ws * wpb, cin),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, ws, ws * wpb, c),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, n, n), lambda bi, i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    def const(arr):
        return pl.BlockSpec(arr.shape, lambda bi, i, j: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    static = dict(num_heads=num_heads, scale=scale, ws=ws, wpb=wpb, c=c,
                  cseg=cseg)
    common_specs = [x_spec, const(wq_packed), const(bq_packed), const(wp),
                    const(bp), bias_spec]
    common_args = (x, wq_packed, bq_packed, wp, bp, bias)
    if mask is None:
        kernel = functools.partial(_qkv_kernel_nomask, **static)
        in_specs = common_specs
        args = common_args
    else:
        mask_spec = pl.BlockSpec(
            (wpb, n, n), lambda bi, i, j: (i * steps_w + j, 0, 0),
            memory_space=pltpu.VMEM)
        kernel = functools.partial(_qkv_kernel_mask, **static)
        in_specs = common_specs + [mask_spec]
        args = common_args + (mask.astype(x.dtype),)

    nw = nwh * nww
    flops_per = (num_heads * 2 * n * n * hd * 2
                 + 2 * n * (cin * 3 * c + c * c))
    return pl.pallas_call(
        kernel,
        grid=(b, nwh, steps_w),
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww_, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * b * nw,
            bytes_accessed=2 * b * hh * ww_ * c * x.dtype.itemsize,
            transcendentals=b * nw * num_heads * n * n,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=(
    "num_heads_w", "num_heads_s", "window_size", "down_factor", "interpret"))
def fused_grl_mixed_attention_qkv_nhwc(
        x: jnp.ndarray, x_rolled: Optional[jnp.ndarray],
        anchor: jnp.ndarray,
        wqkv: jnp.ndarray, bqkv: jnp.ndarray,
        scale_w: jnp.ndarray, scale_s1: jnp.ndarray, scale_s2: jnp.ndarray,
        bias_w: jnp.ndarray, bias_s1: jnp.ndarray, bias_s2: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        num_heads_w: int, num_heads_s: int, window_size: int,
        down_factor: int = 2, interpret: bool = False):
    """GRL mixed attention with the 6-way qkv projection in-kernel.

    x: [B, H, W, C] (post-norm input); x_rolled: the (-s, -s) roll of x
    for shifted blocks, or None (mask must be None too) — the window
    half projects from x_rolled, the stripe half from x, so only the
    C-wide input streams instead of six C/2 q/k/v tensors. wqkv
    [C, 3C] / bqkv [3C] use _SplitQKV6's layout (qw|kw|vw|qs|ks|vs,
    each C/2). anchor/scales/biases/mask as in
    fused_grl_mixed_attention_nhwc. Returns (window_out, stripe_out)."""
    b, hh, ww_, cin = x.shape
    c2 = wqkv.shape[1] // 6
    ws = window_size
    aws = ws // down_factor
    n = ws * ws
    na = aws * aws
    nwh, nww = hh // ws, ww_ // ws
    cseg = -(-c2 // 128) * 128
    wpb = _pick_wpb_grl_qkv(nww, ws, aws, cin, c2, cseg,
                            x.dtype.itemsize, shifted=mask is not None,
                            num_heads_w=num_heads_w,
                            num_heads_s=num_heads_s)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if (x_rolled is None) != (mask is None):
        raise ValueError("x_rolled and mask must both be set (shifted) "
                         "or both be None")

    def seg(i):
        return jnp.pad(wqkv[:, i * c2: (i + 1) * c2],
                       [(0, 0), (0, cseg - c2)])

    wq_packed = jnp.concatenate([seg(i) for i in range(6)],
                                1).astype(x.dtype)            # [C, 6*cseg]
    bq_packed = jnp.concatenate(
        [jnp.pad(bqkv[i * c2: (i + 1) * c2], [(0, cseg - c2)])
         for i in range(6)]).reshape(1, 6 * cseg).astype(x.dtype)

    steps_w = nww // wpb
    x_spec = pl.BlockSpec((1, ws, ws * wpb, cin),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ws, ws * wpb, c2),
                            lambda bi, i, j: (bi, i, j, 0),
                            memory_space=pltpu.VMEM)
    anc_spec = pl.BlockSpec((1, aws, aws * wpb, c2),
                            lambda bi, i, j: (bi, i, j, 0),
                            memory_space=pltpu.VMEM)

    def const(arr):
        return pl.BlockSpec(arr.shape, lambda bi, i, j: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    scale_w_spec = const(scale_w)
    scale_s_spec = const(scale_s1)
    bw_spec = pl.BlockSpec((num_heads_w, n, n), lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((num_heads_s, na, n), lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((num_heads_s, n, na), lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    static = dict(num_heads_w=num_heads_w, num_heads_s=num_heads_s, ws=ws,
                  df=down_factor, wpb=wpb, c2=c2, cseg=cseg)
    tail_specs = [anc_spec, const(wq_packed), const(bq_packed),
                  scale_w_spec, scale_s_spec, scale_s_spec,
                  bw_spec, b1_spec, b2_spec]
    tail_args = (anchor, wq_packed, bq_packed, scale_w, scale_s1,
                 scale_s2, bias_w, bias_s1, bias_s2)
    if mask is None:
        kernel = functools.partial(_grl_qkv_kernel_nomask, **static)
        in_specs = [x_spec] + tail_specs
        args = (x,) + tail_args
    else:
        mask_spec = pl.BlockSpec(
            (wpb, n, n), lambda bi, i, j: (i * steps_w + j, 0, 0),
            memory_space=pltpu.VMEM)
        kernel = functools.partial(_grl_qkv_kernel_mask, **static)
        in_specs = [x_spec, x_spec] + tail_specs + [mask_spec]
        args = (x, x_rolled) + tail_args + (mask.astype(x.dtype),)

    nw = nwh * nww
    hdw, hds = c2 // num_heads_w, c2 // num_heads_s
    flops_per = (num_heads_w * 2 * n * n * hdw * 2
                 + num_heads_s * 2 * (na * n + n * na) * hds * 2
                 + 2 * n * cin * 6 * c2)
    return pl.pallas_call(
        kernel,
        grid=(b, nwh, steps_w),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, hh, ww_, c2), x.dtype),
                   jax.ShapeDtypeStruct((b, hh, ww_, c2), x.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * b * nw,
            bytes_accessed=4 * b * hh * ww_ * cin * x.dtype.itemsize,
            transcendentals=b * nw * (num_heads_w * n * n
                                      + num_heads_s * 2 * na * n),
        ),
        interpret=interpret,
    )(*args)
