"""Fused CAB (conv-attention block) Pallas kernel, two passes.

The RCAN-style local-conv branch appears 76 times across the ensemble:
GRL's CAB (mixed_attn_block.py:948-984; compress 4, reduction 18, 40
blocks) and MambaIR's CAB (mambair_arch.py:40-62; compress 3, squeeze
30, 36 blocks):

    y = conv3x3(gelu(conv3x3(x)))          # C -> C/cr -> C
    a = sigmoid(1x1(relu(1x1(avgpool(y)))))  # global pool -> [B, C]
    out = y * a

The global pool is the only non-local op — same structure as the
NAFBlock SCA, so the same two-pass recompute template applies
(ops/pallas_nafblock.py): pass A computes y per 2-halo tile and emits
channel partials; the tiny squeeze MLP runs outside; pass B recomputes
y and scales. Traffic: 3 activation touches vs the XLA route's ~9
(conv-layout copies on both sides of both 3x3 convs plus y/pool/scale
round trips).

Each 3x3 conv runs as NINE dots sharing ONE operand (the resident halo
region) with shift-accumulated outputs — the formulation BENCH_NOTES'
"small dots sharing an operand" receipt calls for; if the per-dot fixed
cost shows up on hardware, the documented next step is packing the nine
weights into one [C, 9*seg] dot with lane-aligned segments.

Optional pre-LN and skip-scale residual fold MambaIR's whole
`x*skip2 + CAB(LN2(x))` half-block into the kernel (read x once per
pass, write out once). Gated by FREQFUSION_CAB=1, OFF pending a
hardware A/B.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .halo import pick_bands, stencil_block, stencil_specs
from .kmath import gelu_exact

__all__ = ["cab_fused"]


def _ln(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return d * jax.lax.rsqrt(var + eps) * scale + bias


def _conv_bank(t, w_ref, rows_out, cols_out, c_out, dtype):
    """9-tap dense 3x3 conv on a resident region: nine dots sharing the
    operand `t` ([H, W, Cin]); output shift-accumulated on the
    (rows_out, cols_out) interior. w_ref: [9, Cin, Cout]."""
    f32 = jnp.float32
    hh, ww, cin = t.shape
    t2 = t.reshape(hh * ww, cin).astype(dtype)
    acc = None
    for di in range(3):
        for dj in range(3):
            seg = jax.lax.dot_general(
                t2, w_ref[di * 3 + dj], (((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(hh, ww, c_out)
            part = seg[di: di + rows_out, dj: dj + cols_out]
            acc = part if acc is None else acc + part
    return acc


def _y_tile(blk, valid, w1_ref, b1_ref, w2_ref, b2_ref, ln_ref,
            rh, rw, ccr, c, dtype, use_ln, eps):
    """y = conv2(gelu(conv1(maybe_LN(x)))) on the tile interior, fp32.
    Zero-padding: mask the INPUT of each conv outside the image."""
    t = blk
    if use_ln:
        t = _ln(t, ln_ref[0], ln_ref[1], eps)
    t = jnp.where(valid, t, jnp.zeros_like(t))
    u = _conv_bank(t, w1_ref, rh + 2, rw + 2, ccr, dtype) + b1_ref[0]
    u = gelu_exact(u)  # erf-free: relay Mosaic lacks erfc (kmath.py)
    u = jnp.where(valid[1:-1, 1:-1], u, jnp.zeros_like(u))
    return _conv_bank(u, w2_ref, rh, rw, c, dtype) + b2_ref[0]


def _pool_kernel(*refs, rh, rw, dh, dw_, h, w, ccr, c, dtype, use_ln,
                 eps):
    stencil = refs[:9]
    w1_ref, b1_ref, w2_ref, b2_ref, ln_ref = refs[9:14]
    o_ref = refs[14]
    blk, valid = stencil_block(stencil, rh, rw, dh, dw_, 2, h, w)
    y = _y_tile(blk.astype(jnp.float32), valid, w1_ref, b1_ref, w2_ref,
                b2_ref, ln_ref, rh, rw, ccr, c, dtype, use_ln, eps)
    o_ref[0, 0, 0] = jnp.sum(y, axis=(0, 1))


def _apply_kernel(*refs, rh, rw, dh, dw_, h, w, ccr, c, dtype, use_ln,
                  use_skip, eps):
    stencil = refs[:9]
    w1_ref, b1_ref, w2_ref, b2_ref, ln_ref, a_ref, sk_ref = refs[9:16]
    o_ref = refs[16]
    blk, valid = stencil_block(stencil, rh, rw, dh, dw_, 2, h, w)
    blk = blk.astype(jnp.float32)
    y = _y_tile(blk, valid, w1_ref, b1_ref, w2_ref, b2_ref, ln_ref,
                rh, rw, ccr, c, dtype, use_ln, eps)
    out = y * a_ref[0]
    if use_skip:
        out = out + blk[2: 2 + rh, 2: 2 + rw] * sk_ref[0]
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_tile(dim: int, cap: int) -> int:
    for t in range(min(cap, dim), 0, -1):
        if dim % t == 0:
            return t
    return dim


def _tiles(h: int, w: int, c: int, ccr: int, itemsize: int,
           budget: int = 8 * 1024 * 1024):
    # 8M budget (not the 16M scoped-vmem cap): the model below still
    # understates Mosaic's stack residency ~2x — the C=180 probe measured
    # 20.79M actual against a 9.4M modeled cost. 8M keeps actual ~11M.
    weights = 9 * (c * ccr + ccr * c) * itemsize + (2 * c + ccr) * 4

    def cost(rh, rw):
        hh, ww = rh + 4, rw + 4
        # 2x on the input-block term: the 9 pipelined stencil refs are
        # double-buffered, so ~2 tiles of x.dtype are resident beyond the
        # assembled fp32 block (hardware receipt: C=180 probe hit 20.79M
        # actual vs 16M scoped-vmem limit under the old 12M model).
        return (hh * ww * c * (2 * itemsize + 4)  # stencil bufs + fp32 blk
                + hh * ww * max(c, ccr) * 4      # dot-segment temp
                + hh * ww * ccr * 4              # gelu'd u
                + rh * rw * c * 4 * 2            # y + out
                + weights)

    rw = _pick_tile(w, 256)
    rh = _pick_tile(h, 8)
    while cost(rh, rw) > budget and rw > 8:
        rw = _pick_tile(w, rw // 2)
    while cost(rh, rw) > budget and rh > 1:
        rh = _pick_tile(h, rh // 2)
    return rh, rw


def _cab_xla(x, w, ln, skip_scale, eps):
    f32 = jnp.float32
    t = x.astype(f32)
    if ln is not None:
        t = _ln(t, ln["scale"].astype(f32), ln["bias"].astype(f32), eps)
    c = x.shape[-1]

    def conv(v, key, groups=1):
        return jax.lax.conv_general_dilated(
            v, w[key]["kernel"].astype(f32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups) + w[key]["bias"].astype(f32)

    y = conv(t, "cab_0")
    y = conv(jax.nn.gelu(y, approximate=False), "cab_2")
    pool = jnp.mean(y, axis=(1, 2), keepdims=True)
    a = pool @ w["ca_1"]["kernel"][0, 0].astype(f32) + w["ca_1"]["bias"].astype(f32)
    a = jax.nn.relu(a) @ w["ca_3"]["kernel"][0, 0].astype(f32) + w["ca_3"]["bias"].astype(f32)
    out = y * jax.nn.sigmoid(a)
    if skip_scale is not None:
        out = out + x.astype(f32) * skip_scale.astype(f32)
    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def cab_fused(x: jnp.ndarray, w: Dict[str, Any],
              ln: Optional[Dict[str, jnp.ndarray]] = None,
              skip_scale: Optional[jnp.ndarray] = None,
              eps: float = 1e-5,
              interpret: bool = False) -> jnp.ndarray:
    """x: [B, H, W, C]; w: flax CAB param tree (cab_0, cab_2, ca_1, ca_3).
    ln: optional pre-LN params {scale, bias} folded in-kernel (MambaIR's
    ln_2). skip_scale: optional [C] residual scale — returns
    x*skip_scale + CAB(...) when given, else just the CAB branch."""
    b, h, w_, c = x.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    dtype = x.dtype
    ccr = w["cab_0"]["kernel"].shape[-1]
    rh, rw = _tiles(h, w_, c, ccr, dtype.itemsize)
    if h < 5 or w_ < 5 or (rh + 4) > h or (rw + 4) > w_:
        return _cab_xla(x, w, ln, skip_scale, eps)

    f32 = jnp.float32
    # [3,3,Cin,Cout] -> [9, Cin, Cout] in compute dtype
    w1 = w["cab_0"]["kernel"].reshape(9, c, ccr).astype(dtype)
    w2 = w["cab_2"]["kernel"].reshape(9, ccr, c).astype(dtype)
    b1 = w["cab_0"]["bias"].astype(f32).reshape(1, ccr)
    b2 = w["cab_2"]["bias"].astype(f32).reshape(1, c)
    if ln is not None:
        ln_tab = jnp.stack([ln["scale"].astype(f32),
                            ln["bias"].astype(f32)])
    else:
        ln_tab = jnp.zeros((2, c), f32)

    rh, dh = pick_bands(h, 2, rh)
    rw, dw_ = pick_bands(w_, 2, rw, align=8)
    if rh is None or rw is None:
        return _cab_xla(x, w, ln, skip_scale, eps)
    gh, gw = h // rh, w_ // rw
    grid = (b, gh, gw)
    fixed_specs = stencil_specs(c, rh, rw, dh, dw_) + [
        pl.BlockSpec(w1.shape, lambda bi, i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(b1.shape, lambda bi, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w2.shape, lambda bi, i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(b2.shape, lambda bi, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(ln_tab.shape, lambda bi, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kw = dict(rh=rh, rw=rw, dh=dh, dw_=dw_, h=h, w=w_, ccr=ccr, c=c,
              dtype=dtype, use_ln=ln is not None, eps=eps)
    npix = h * w_
    flops_y = npix * (2 * 9 * c * ccr * 2)

    partials = pl.pallas_call(
        functools.partial(_pool_kernel, **kw),
        grid=grid,
        in_specs=fixed_specs,
        # [B, gh*gw, 1, C] layout: the production Mosaic checker needs
        # the last two block dims 8/128-divisible OR equal to the array
        # dims (see ops/pallas_nafblock.py pool receipt).
        out_specs=pl.BlockSpec((1, 1, 1, c),
                               lambda bi, i, j: (bi, i * gw + j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, gh * gw, 1, c), f32),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_y,
            bytes_accessed=b * npix * c * dtype.itemsize,
            transcendentals=b * npix * ccr),
        interpret=interpret,
    )(*([x] * 9), w1, b1, w2, b2, ln_tab)

    mean = jnp.sum(partials, axis=(1, 2)) / np.float32(npix)   # [B, C]
    a = mean @ w["ca_1"]["kernel"][0, 0].astype(f32) + w["ca_1"]["bias"].astype(f32)
    a = jax.nn.relu(a) @ w["ca_3"]["kernel"][0, 0].astype(f32) + w["ca_3"]["bias"].astype(f32)
    a = jax.nn.sigmoid(a).reshape(b, 1, c)  # [B,1,C]: legal block @ b>1

    use_skip = skip_scale is not None
    sk = (skip_scale.astype(f32).reshape(1, c) if use_skip
          else jnp.zeros((1, c), f32))
    return pl.pallas_call(
        functools.partial(_apply_kernel, use_skip=use_skip, **kw),
        grid=grid,
        in_specs=fixed_specs + [
            pl.BlockSpec((1, 1, c), lambda bi, i, j: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rh, rw, c),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_y,
            bytes_accessed=2 * b * npix * c * dtype.itemsize,
            transcendentals=b * npix * ccr),
        interpret=interpret,
    )(*([x] * 9), w1, b1, w2, b2, ln_tab, a, sk)
