"""Fused Laplacian-edge-refinement Pallas kernels (two passes total).

Module-level byte attribution (`scripts/fusion_bytes.py`, v5e cost
analysis) puts LaplacianPyramidRefinement at 57.4 GB/img — the largest
fusion subgraph after the hierarchical stage (which has its own gated
kernel, ops/pallas_hier.py). The bill is NOT the 3-channel pyramid
build (blur/pool/upsample, left in XLA) but the 32-channel HR-resolution
intermediates: the per-level EdgeRefineBlock's 6-op conv chain and the
96-channel concat + fusion/gate chain (reference
edge_enhancement.py:92-260, rebuild models/fusion/edge.py). Both
subgraphs are spatially local, so two halo-4 kernels suffice:

1. `edge_refine_fused` — one EdgeRefineBlock (conv1-gelu-conv2-gelu-
   conv3 + 1x1 proj residual + spatial-attention gate) per pass: read
   the 3-channel Laplacian level once, write the 32-channel features
   once. Applied at each pyramid level (HR, HR/2, HR/4).
2. `edge_fuse_fused` — level weighting + 96-channel concat + fusion
   convs + edge gate + final `clip(sr + gate*strength*edge)` in one
   pass: read sr (3ch) + three 32ch feature maps once, write the
   3-channel output once. The level-weight multiply commutes with the
   (linear) bilinear upsample, so weighting moves inside the kernel.

Zero-padding semantics: XLA pads each conv's INPUT with zeros beyond
the image, so the kernel re-masks out-of-image halo positions before
every conv (same discipline as ops/pallas_hier.py / pallas_nafblock.py).

EVAL-ONLY: no VJP — `FREQFUSION_EDGE=1` is for the inference bench
path; training leaves it unset. Gated OFF pending a hardware A/B.
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

__all__ = ["edge_refine_fused", "edge_fuse_fused"]

_HALO = 4  # refine: conv1+conv2+conv3 chained (3) + attn_2 (1)
#            fuse:   fusion_0 + fusion_2 + gate_0 + gate_2


def _gelu(x):
    # torch nn.GELU() default = exact erf (17 sites across the
    # reference's fusion modules); matches models/fusion/_gelu to ~1e-6.
    # erf-free form: the relay's Mosaic toolchain has no erfc lowering
    # (ops/kmath.py); shared with the tiny-input XLA fallback for
    # route consistency.
    return gelu_exact(x)


def _make_conv(valid, halo, dtype):
    """3x3 conv as nine shift-accumulated dots over a resident block,
    masking the INPUT at margin m to zero outside the image first."""

    def vslice(m):
        d = halo - m
        if d == 0:
            return valid
        return valid[d:-d, d:-d]

    def conv(t, m, w_ref, b):
        t = jnp.where(vslice(m), t, jnp.zeros_like(t))
        hh, ww, cin = t.shape
        t2 = t.reshape(hh * ww, cin).astype(dtype)
        cout = w_ref.shape[-1]
        acc = None
        for di in range(3):
            for dj in range(3):
                seg = jax.lax.dot_general(
                    t2, w_ref[di * 3 + dj], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(hh, ww, cout)
                part = seg[di: di + hh - 2, dj: dj + ww - 2]
                acc = part if acc is None else acc + part
        return acc if b is None else acc + b

    return conv


# ---------------------------------------------------------------- refine

def _refine_kernel(*refs, rh, rw, dh, dw_, h, w, feat, dtype):
    stencil = refs[:9]
    (w1_ref, w2_ref, w3_ref, pj_ref, a0_ref, a2_ref, vb_ref) = refs[9:16]
    o_ref = refs[16]
    f32 = jnp.float32
    blk, valid = stencil_block(stencil, rh, rw, dh, dw_, _HALO, h, w)
    blk = blk.astype(f32)
    conv = _make_conv(valid, _HALO, dtype)
    fc = feat
    t = _gelu(conv(blk, 4, w1_ref, vb_ref[0, :fc]))          # margin 3
    t = _gelu(conv(t, 3, w2_ref, vb_ref[1, :fc]))            # margin 2
    t = conv(t, 2, w3_ref, vb_ref[2, :fc])                   # margin 1
    # identity = 1x1 proj of the raw input (margin 1)
    pb = blk[3:-3, 3:-3]
    hh, ww, cin = pb.shape
    idn = jax.lax.dot_general(
        pb.reshape(hh * ww, cin).astype(dtype), pj_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(hh, ww, fc) + vb_ref[3, :fc]
    hid = t + idn                                            # margin 1
    # spatial attention: 1x1 squeeze -> gelu -> 3x3 -> sigmoid
    ca = a0_ref.shape[-1]
    a = jax.lax.dot_general(
        hid.reshape(hh * ww, fc).astype(dtype), a0_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(hh, ww, ca) + vb_ref[4, :ca]
    a = conv(_gelu(a), 1, a2_ref, vb_ref[5, :1])             # margin 0
    o_ref[0] = (hid[1:-1, 1:-1] * jax.nn.sigmoid(a)).astype(o_ref.dtype)


def _refine_xla(lap, p, dtype):
    """Plain-XLA fallback for tiny levels; mirrors
    models/fusion/edge.py EdgeRefineBlock exactly."""
    f32 = jnp.float32

    def conv(x, key):
        out = jax.lax.conv_general_dilated(
            x, p[key]["kernel"].astype(f32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + p[key]["bias"].astype(f32)

    x = lap.astype(f32)
    idn = x @ p["proj"]["kernel"][0, 0].astype(f32) \
        + p["proj"]["bias"].astype(f32)
    t = _gelu(conv(x, "conv1"))
    t = _gelu(conv(t, "conv2"))
    t = conv(t, "conv3") + idn
    a = t @ p["attn_0"]["kernel"][0, 0].astype(f32) \
        + p["attn_0"]["bias"].astype(f32)
    a = conv(_gelu(a), "attn_2")
    return (t * jax.nn.sigmoid(a)).astype(dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def edge_refine_fused(lap: jnp.ndarray, p: Dict[str, Any],
                      interpret: bool = False) -> jnp.ndarray:
    """One EdgeRefineBlock (models/fusion/edge.py:44-60, reference
    edge_enhancement.py:92-119) in a single halo-4 pass. lap: [B,H,W,3]
    Laplacian level; p: flax tree {proj, conv1..3, attn_0, attn_2}.
    Returns [B,H,W,feat_ch]."""
    b, h, w_, cin = lap.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    dtype = lap.dtype
    feat = p["conv1"]["kernel"].shape[-1]
    # (16, 64) caps: the relay's scoped-vmem limit rejected the
    # sibling halo kernels at (24-32, 128)-class tiles (probe_c1).
    rh, dh = pick_bands(h, _HALO, 16)
    rw, dw_ = pick_bands(w_, _HALO, 64, align=8)
    if rh is None or rw is None or rh >= h or rw >= w_:
        return _refine_xla(lap, p, dtype)

    f32 = jnp.float32

    def bank(key):
        k = p[key]["kernel"]
        return k.reshape(9, k.shape[2], k.shape[3]).astype(dtype)

    w1, w2, w3, a2 = bank("conv1"), bank("conv2"), bank("conv3"), \
        bank("attn_2")
    pj = p["proj"]["kernel"][0, 0].astype(dtype)
    a0 = p["attn_0"]["kernel"][0, 0].astype(dtype)
    ca = a0.shape[-1]
    vb = jnp.zeros((8, max(64, feat)), f32)
    vb = vb.at[0, :feat].set(p["conv1"]["bias"].astype(f32))
    vb = vb.at[1, :feat].set(p["conv2"]["bias"].astype(f32))
    vb = vb.at[2, :feat].set(p["conv3"]["bias"].astype(f32))
    vb = vb.at[3, :feat].set(p["proj"]["bias"].astype(f32))
    vb = vb.at[4, :ca].set(p["attn_0"]["bias"].astype(f32))
    vb = vb.at[5, :1].set(p["attn_2"]["bias"].astype(f32))

    gh, gw = h // rh, w_ // rw
    vmem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_refine_kernel, rh=rh, rw=rw, dh=dh, dw_=dw_,
                          h=h, w=w_, feat=feat, dtype=dtype),
        grid=(b, gh, gw),
        in_specs=stencil_specs(cin, rh, rw, dh, dw_)
        + [vmem(w1.shape), vmem(w2.shape), vmem(w3.shape),
           vmem(pj.shape), vmem(a0.shape), vmem(a2.shape),
           vmem(vb.shape)],
        out_specs=pl.BlockSpec((1, rh, rw, feat),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_, feat), dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * h * w_ * (9 * 2 * (cin * feat + 2 * feat * feat
                                         + ca * 1)
                                + 2 * (cin * feat + feat * ca)),
            bytes_accessed=b * h * w_ * (cin + feat) * dtype.itemsize,
            transcendentals=b * h * w_ * 3 * feat),
        interpret=interpret,
    )(*([lap] * 9), w1, w2, w3, pj, a0, a2, vb)


# ------------------------------------------------------------------ fuse

def _fuse_kernel(*refs, rh, rw, dh, dw_, h, w, feat, dtype):
    sten_s, sten_0, sten_1, sten_2 = (refs[:9], refs[9:18], refs[18:27],
                                      refs[27:36])
    wf0_ref, wf2_ref, wg0_ref, wg2_ref, vb_ref, sc_ref = refs[36:42]
    o_ref = refs[42]
    f32 = jnp.float32
    sblk, valid = stencil_block(sten_s, rh, rw, dh, dw_, _HALO, h, w)
    f0b, _ = stencil_block(sten_0, rh, rw, dh, dw_, _HALO, h, w)
    f1b, _ = stencil_block(sten_1, rh, rw, dh, dw_, _HALO, h, w)
    f2b, _ = stencil_block(sten_2, rh, rw, dh, dw_, _HALO, h, w)
    sblk = sblk.astype(f32)
    conv = _make_conv(valid, _HALO, dtype)
    # weighted concat (level weights commute with the linear upsample)
    cat = jnp.concatenate(
        [f0b.astype(f32) * sc_ref[0, 0], f1b.astype(f32) * sc_ref[0, 1],
         f2b.astype(f32) * sc_ref[0, 2]], axis=-1)
    e = _gelu(conv(cat, 4, wf0_ref, vb_ref[0, :feat]))       # margin 3
    edge = conv(e, 3, wf2_ref, vb_ref[1, :3])                # margin 2
    gcat = jnp.concatenate([sblk[2:-2, 2:-2], edge], axis=-1)
    cg = wg0_ref.shape[-1]
    g = _gelu(conv(gcat, 2, wg0_ref, vb_ref[2, :cg]))        # margin 1
    gate = jax.nn.sigmoid(conv(g, 1, wg2_ref, vb_ref[3, :1]))  # margin 0
    out = sblk[4:-4, 4:-4] + gate * sc_ref[0, 3] * edge[2:-2, 2:-2]
    o_ref[0] = jnp.clip(out, 0.0, 1.0).astype(o_ref.dtype)


def _fuse_xla(sr, f0, f1, f2, lw, strength, p, dtype):
    """Plain-XLA fallback; mirrors models/fusion/edge.py:107-119."""
    f32 = jnp.float32

    def conv(x, key):
        out = jax.lax.conv_general_dilated(
            x, p[key]["kernel"].astype(f32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + p[key]["bias"].astype(f32)

    allf = jnp.concatenate([f0.astype(f32) * lw[0], f1.astype(f32) * lw[1],
                            f2.astype(f32) * lw[2]], axis=-1)
    edge = conv(_gelu(conv(allf, "fusion_0")), "fusion_2")
    g = conv(jnp.concatenate([sr.astype(f32), edge], axis=-1),
             "edge_gate_0")
    gate = jax.nn.sigmoid(conv(_gelu(g), "edge_gate_2"))
    out = sr.astype(f32) + gate * strength * edge
    return jnp.clip(out, 0.0, 1.0).astype(dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def edge_fuse_fused(sr: jnp.ndarray, f0: jnp.ndarray, f1: jnp.ndarray,
                    f2: jnp.ndarray, lw: jnp.ndarray,
                    strength: jnp.ndarray, p: Dict[str, Any],
                    interpret: bool = False) -> jnp.ndarray:
    """Level weighting + concat + fusion convs + edge gate + final
    residual/clip (models/fusion/edge.py:105-119, reference
    edge_enhancement.py:222-260) in one halo-4 pass. sr: [B,H,W,3];
    f0/f1/f2: [B,H,W,feat] refined levels ALREADY upsampled to HR
    (unweighted); lw: [3] softmaxed level weights; strength: scalar."""
    b, h, w_, _ = sr.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    dtype = sr.dtype
    feat = f0.shape[-1]
    # (16, 64) caps: the relay's scoped-vmem limit rejected the
    # sibling halo kernels at (24-32, 128)-class tiles (probe_c1).
    rh, dh = pick_bands(h, _HALO, 16)
    rw, dw_ = pick_bands(w_, _HALO, 64, align=8)
    if rh is None or rw is None or rh >= h or rw >= w_:
        return _fuse_xla(sr, f0, f1, f2, lw, strength, p, dtype)

    f32 = jnp.float32

    def bank(key):
        k = p[key]["kernel"]
        return k.reshape(9, k.shape[2], k.shape[3]).astype(dtype)

    wf0, wf2 = bank("fusion_0"), bank("fusion_2")
    wg0, wg2 = bank("edge_gate_0"), bank("edge_gate_2")
    cg = wg0.shape[-1]
    vb = jnp.zeros((8, max(64, feat)), f32)
    vb = vb.at[0, :feat].set(p["fusion_0"]["bias"].astype(f32))
    vb = vb.at[1, :3].set(p["fusion_2"]["bias"].astype(f32))
    vb = vb.at[2, :cg].set(p["edge_gate_0"]["bias"].astype(f32))
    vb = vb.at[3, :1].set(p["edge_gate_2"]["bias"].astype(f32))
    sc = jnp.concatenate([lw.astype(f32).reshape(3),
                          strength.astype(f32).reshape(1)]).reshape(1, 4)

    gh, gw = h // rh, w_ // rw
    vmem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fuse_kernel, rh=rh, rw=rw, dh=dh, dw_=dw_,
                          h=h, w=w_, feat=feat, dtype=dtype),
        grid=(b, gh, gw),
        in_specs=(stencil_specs(3, rh, rw, dh, dw_)
                  + stencil_specs(feat, rh, rw, dh, dw_)
                  + stencil_specs(feat, rh, rw, dh, dw_)
                  + stencil_specs(feat, rh, rw, dh, dw_)
                  + [vmem(wf0.shape), vmem(wf2.shape), vmem(wg0.shape),
                     vmem(wg2.shape), vmem(vb.shape), vmem(sc.shape)]),
        out_specs=pl.BlockSpec((1, rh, rw, 3),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_, 3), dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * h * w_ * 9 * 2 * (3 * feat * feat + feat * 3
                                        + 6 * cg + cg),
            bytes_accessed=b * h * w_ * (6 + 3 * feat) * dtype.itemsize,
            transcendentals=b * h * w_ * 2 * feat),
        interpret=interpret,
    )(*([sr] * 9), *([f0] * 9), *([f1] * 9), *([f2] * 9),
      wf0, wf2, wg0, wg2, vb, sc)


def _pick_tile(dim: int, cap: int) -> int:
    for t in range(min(cap, dim), 0, -1):
        if dim % t == 0:
            return t
    return dim
