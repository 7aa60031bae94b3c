"""Fused LKABlock Pallas kernel (one halo-12 pass).

The LKA block (models/fusion/lka.py:66-90, reference
large_kernel_attention.py:112-149) appears at 13 fusion call sites:
9 per-band invocations in Phase 3 (dim 64) and 4 per-expert invocations
in Phase 4 (dim 128), costing ~0.9-1.2 GB each on the XLA route
(scripts/fusion_bytes2.py) — the chain BN -> 5x5 DW -> 1x21 DW ->
21x1 DW -> 1x1 PW -> BN -> sigmoid-gate -> residual -> BN -> FFN ->
residual round-trips ~15 activation tensors through HBM.

In EVAL mode every BatchNorm is a per-channel affine (fold
gamma/sqrt(var+eps) and beta - mean*that), so the whole block is
spatially LOCAL: receptive field 5x5 (+2) then 1x21 (+10 in W) then
21x1 (+10 in H) -> halo 12 in both dims. One pass reads x once and
writes the block output once; the depthwise taps are shift-accumulated
VPU FMAs (67 taps), the 1x1s are resident dots.

Zero-padding semantics: XLA pads each conv's INPUT with zeros beyond
the image, so the kernel re-masks out-of-image halo positions before
every dwconv stage — anisotropically, since the 1x21/21x1 stages
consume margin in one axis only.

EVAL-ONLY twice over: no VJP, and train-mode BN needs batch stats.
Gated by FREQFUSION_LKA=1 (the LKABlock route additionally requires
train=False); OFF by default pending a hardware A/B.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .halo import pick_bands, stencil_block, stencil_specs
from .kmath import gelu_exact

__all__ = ["lka_block_fused"]

_HALO = 12  # 5x5 (2 both axes) + 1x21 (10 in W) + 21x1 (10 in H)
_EPS = 1e-5


def _gelu(x):
    # exact-erf GELU in erf-free form (relay Mosaic lacks erfc,
    # ops/kmath.py); matches jax.nn.gelu(approximate=False) to ~1e-6.
    return gelu_exact(x)


def _kernel(*refs, rh, rw, dh, dw_, h, w, c, dtype):
    stencil = refs[:9]
    (w5_ref, wh_ref, wv_ref, pw_ref, f0_ref, f2_ref, vb_ref,
     sc_ref) = refs[9:17]
    o_ref = refs[17]
    f32 = jnp.float32
    blk, valid = stencil_block(stencil, rh, rw, dh, dw_, _HALO, h, w)
    blk = blk.astype(f32)

    def vslice(mh, mw):
        dh, dw_ = _HALO - mh, _HALO - mw
        rs = slice(dh, -dh) if dh else slice(None)
        cs = slice(dw_, -dw_) if dw_ else slice(None)
        return valid[rs, cs]

    # norm1 (eval-BN affine)
    t = blk * vb_ref[0, :c] + vb_ref[1, :c]
    # 5x5 depthwise (mask the CONV INPUT at margin 12/12)
    ti = jnp.where(vslice(12, 12), t, jnp.zeros_like(t))
    hh, ww = ti.shape[0], ti.shape[1]
    a = None
    for di in range(5):
        for dj in range(5):
            part = ti[di: di + hh - 4, dj: dj + ww - 4] * w5_ref[di * 5 + dj]
            a = part if a is None else a + part
    # 1x21 depthwise along W (margin 10/10 -> 10/0)
    a = jnp.where(vslice(10, 10), a, jnp.zeros_like(a))
    ww2 = a.shape[1]
    acc = None
    for dj in range(21):
        part = a[:, dj: dj + ww2 - 20] * wh_ref[dj]
        acc = part if acc is None else acc + part
    # 21x1 depthwise along H (margin 10/0 -> 0/0)
    acc = jnp.where(vslice(10, 0), acc, jnp.zeros_like(acc))
    hh2 = acc.shape[0]
    a = None
    for di in range(21):
        part = acc[di: di + hh2 - 20] * wv_ref[di]
        a = part if a is None else a + part
    # 1x1 pointwise + LKA-internal eval-BN affine
    a2 = jax.lax.dot_general(
        a.reshape(rh * rw, c).astype(dtype), pw_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(rh, rw, c)
    a2 = a2 * vb_ref[2, :c] + vb_ref[3, :c]
    # gate + residual 1
    xc = blk[_HALO:-_HALO, _HALO:-_HALO]
    tc = t[_HALO:-_HALO, _HALO:-_HALO]
    x1 = xc + sc_ref[0, 0] * (tc * jax.nn.sigmoid(a2))
    # norm2 affine + FFN (1x1 -> gelu -> 1x1) + residual 2
    t2 = x1 * vb_ref[4, :c] + vb_ref[5, :c]
    hid = jax.lax.dot_general(
        t2.reshape(rh * rw, c).astype(dtype), f0_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    hid = _gelu(hid + vb_ref[6, : f0_ref.shape[-1]])
    f = jax.lax.dot_general(
        hid.astype(dtype), f2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(rh, rw, c) + vb_ref[7, :c]
    o_ref[0] = (x1 + sc_ref[0, 1] * f).astype(o_ref.dtype)


def _affine(bn):
    s = bn["scale"].astype(jnp.float32) / jnp.sqrt(
        bn["var"].astype(jnp.float32) + _EPS)
    return s, bn["bias"].astype(jnp.float32) - bn["mean"].astype(
        jnp.float32) * s


def _lka_xla(x, p, dtype):
    """Plain-XLA eval fallback for tiny inputs; mirrors
    models/fusion/lka.py LKABlock (eval mode) exactly."""
    f32 = jnp.float32
    c = x.shape[-1]
    x = x.astype(f32)

    def dw(t, key):
        k = p["lka"][key]["kernel"].astype(f32)
        kh, kw = k.shape[0], k.shape[1]
        return jax.lax.conv_general_dilated(
            t, k, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    a1, b1 = _affine(p["norm1"])
    t = x * a1 + b1
    a = dw(dw(dw(t, "local_conv"), "h_conv"), "v_conv")
    a = a @ p["lka"]["pw_conv"]["kernel"][0, 0].astype(f32)
    abn, bbn = _affine(p["lka"]["bn"])
    a = a * abn + bbn
    x1 = x + p["scale1"].astype(f32) * (t * jax.nn.sigmoid(a))
    a2, b2 = _affine(p["norm2"])
    t2 = x1 * a2 + b2
    hid = _gelu(t2 @ p["ffn_0"]["kernel"][0, 0].astype(f32)
                + p["ffn_0"]["bias"].astype(f32))
    f = hid @ p["ffn_2"]["kernel"][0, 0].astype(f32) \
        + p["ffn_2"]["bias"].astype(f32)
    return (x1 + p["scale2"].astype(f32) * f).astype(dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lka_block_fused(x: jnp.ndarray, p: Dict[str, Any],
                    interpret: bool = False) -> jnp.ndarray:
    """One LKABlock (eval mode) in a single halo-12 pass. x: [B,H,W,C];
    p: flax tree {norm1, lka{local_conv,h_conv,v_conv,pw_conv,bn},
    scale1, norm2, ffn_0, ffn_2} with BN stats merged in (see
    models/param_decl.BNParams)."""
    b, h, w_, c = x.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    dtype = x.dtype
    # caps calibrated to the relay's scoped-vmem limit: (24, 128) hit
    # 26.91M vs the 16M cap on hardware (probe_c1); (16, 64) ~halves
    # the resident halo-block area.
    rh, dh = pick_bands(h, _HALO, 16)
    rw, dw_ = pick_bands(w_, _HALO, 64, align=8)
    if rh is None or rw is None or rh >= h or rw >= w_:
        return _lka_xla(x, p, dtype)

    f32 = jnp.float32
    w5 = p["lka"]["local_conv"]["kernel"].reshape(25, c).astype(f32)
    wh = p["lka"]["h_conv"]["kernel"].reshape(21, c).astype(f32)
    wv = p["lka"]["v_conv"]["kernel"].reshape(21, c).astype(f32)
    pw = p["lka"]["pw_conv"]["kernel"][0, 0].astype(dtype)
    f0 = p["ffn_0"]["kernel"][0, 0].astype(dtype)
    f2 = p["ffn_2"]["kernel"][0, 0].astype(dtype)
    chid = f0.shape[-1]

    a1, b1 = _affine(p["norm1"])
    abn, bbn = _affine(p["lka"]["bn"])
    a2, b2 = _affine(p["norm2"])
    vb = jnp.zeros((8, max(chid, c, 64)), f32)
    vb = vb.at[0, :c].set(a1)
    vb = vb.at[1, :c].set(b1)
    vb = vb.at[2, :c].set(abn)
    vb = vb.at[3, :c].set(bbn)
    vb = vb.at[4, :c].set(a2)
    vb = vb.at[5, :c].set(b2)
    vb = vb.at[6, :chid].set(p["ffn_0"]["bias"].astype(f32))
    vb = vb.at[7, :c].set(p["ffn_2"]["bias"].astype(f32))
    sc = jnp.stack([p["scale1"].astype(f32),
                    p["scale2"].astype(f32)]).reshape(1, 2)

    gh, gw = h // rh, w_ // rw
    vmem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, rh=rh, rw=rw, dh=dh, dw_=dw_,
                          h=h, w=w_, c=c, dtype=dtype),
        grid=(b, gh, gw),
        in_specs=stencil_specs(c, rh, rw, dh, dw_)
        + [vmem(w5.shape), vmem(wh.shape), vmem(wv.shape),
           vmem(pw.shape), vmem(f0.shape), vmem(f2.shape),
           vmem(vb.shape), vmem(sc.shape)],
        out_specs=pl.BlockSpec((1, rh, rw, c),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * h * w_ * (2 * 67 * c + 2 * (c * c + 2 * c * chid)),
            bytes_accessed=b * h * w_ * 2 * c * dtype.itemsize,
            transcendentals=b * h * w_ * (c + chid)),
        interpret=interpret,
    )(*([x] * 9), w5, wh, wv, pw, f0, f2, vb, sc)


def _pick_tile(dim: int, cap: int) -> int:
    for t in range(min(cap, dim), 0, -1):
        if dim % t == 0:
            return t
    return dim
