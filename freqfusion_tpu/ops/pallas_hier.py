"""Fused hierarchical stage-3 + to_rgb Pallas kernel (single pass).

Module-level attribution (`scripts/fusion_bytes2.py`) puts
HierarchicalMultiResolutionFusion at 54.9 GB/img — the largest fusion
subgraph after the token-MHA (which already has its gated kernel) — and
nearly all of it is the full-HR stage 3: a chain of six 3x3 convs with
GELUs, a per-pixel 1x1 spatial gate, a residual block, a cross-stage
residual, and to_rgb + sigmoid (models/fusion/hierarchical.py:83-99,
reference hierarchical_fusion.py:67-201). Every op is spatially LOCAL —
no global pool — so one halo-6 pass suffices: read s3_in once, write the
3-channel RGB once.

Zero-padding semantics: XLA pads each conv's INPUT with zeros beyond the
image, so after every conv+activation the kernel re-masks out-of-image
halo positions to zero before the next conv (same discipline as
ops/pallas_nafblock.py).

EVAL-ONLY: pallas_call has no VJP here, and this subgraph is part of the
TRAINED fusion net — the flag (`FREQFUSION_HIER=1`) is for the inference
bench path; training must leave it unset. Gated OFF pending hardware A/B.
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

__all__ = ["hier_stage3_fused"]

_HALO = 6  # six 3x3 convs in the chain


def _kernel(*refs, rh, rw, dh, dw_, h, w, dtype):
    stencil = refs[:9]
    (w0_ref, w2_ref, g0_ref, g2_ref, r0_ref, r2_ref, t0_ref, t2_ref,
     vb_ref, sc_ref) = refs[9:19]
    o_ref = refs[19]
    f32 = jnp.float32
    blk, valid = stencil_block(stencil, rh, rw, dh, dw_, _HALO, h, w)
    blk = blk.astype(f32)

    def vslice(m):
        d = _HALO - m
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
                    preferred_element_type=f32).reshape(hh, ww, cout)
                part = seg[di: di + hh - 2, dj: dj + ww - 2]
                acc = part if acc is None else acc + part
        return acc if b is None else acc + b

    gelu = gelu_exact  # erf-free exact GELU: relay Mosaic lacks erfc
    c1 = w0_ref.shape[-1]     # bc
    c2 = w2_ref.shape[-1]     # bc // 2
    cg = g0_ref.shape[-1]     # bc // 8 (SpatialGate squeeze = c2 // 4)
    ct = t0_ref.shape[-1]     # bc // 4
    # _conv_gelu_pair: conv(bc) -> gelu -> conv(bc//2) -> gelu
    a = gelu(conv(blk, 6, w0_ref, vb_ref[0, :c1]))          # margin 5
    a = gelu(conv(a, 5, w2_ref, vb_ref[1, :c2]))            # margin 4
    # SpatialGate: 1x1 squeeze -> gelu -> 1x1 -> sigmoid -> mult
    hh, ww, _ = a.shape
    a2 = a.reshape(hh * ww, c2).astype(dtype)
    g = jax.lax.dot_general(a2, g0_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    g = gelu(g + vb_ref[2, :cg])
    g = jax.lax.dot_general(g.astype(dtype), g2_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32) + vb_ref[3, :1]
    f = a * jax.nn.sigmoid(g.reshape(hh, ww, 1))            # margin 4
    # FusionResBlock: conv -> gelu -> conv, + scale*h
    rb = conv(f, 4, r0_ref, None)                           # margin 3
    rb = conv(gelu(rb), 3, r2_ref, None)                    # margin 2
    f3 = f[2:-2, 2:-2] + sc_ref[0, 0] * rb
    # cross-stage residual: + rw23 * f2_up[..., :bc//2] (= s3_in[:, :c2])
    f3 = f3 + sc_ref[0, 1] * blk[4:-4, 4:-4, :c2]           # margin 2
    # to_rgb: conv(bc//4) -> gelu -> conv(3) -> sigmoid
    r = gelu(conv(f3, 2, t0_ref, vb_ref[4, :ct]))           # margin 1
    r = conv(r, 1, t2_ref, vb_ref[5, :3])                   # margin 0
    o_ref[0] = jax.nn.sigmoid(r).astype(o_ref.dtype)


def _pick_tile(dim: int, cap: int) -> int:
    for t in range(min(cap, dim), 0, -1):
        if dim % t == 0:
            return t
    return dim


def _hier_stage3_xla(s3_in, p, dtype):
    """Plain-XLA fallback for tiny inputs; mirrors
    models/fusion/hierarchical.py stage 3 exactly."""
    f32 = jnp.float32
    gelu = functools.partial(jax.nn.gelu, approximate=False)

    def conv(x, key, bias=True):
        w = p[key]["kernel"].astype(f32)
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias:
            out = out + p[key]["bias"].astype(f32)
        return out

    x = s3_in.astype(f32)
    a = gelu(conv(x, "stage3_conv_0"))
    a = gelu(conv(a, "stage3_conv_2"))
    g = a @ p["stage3_gate"]["gate_0"]["kernel"][0, 0].astype(f32) \
        + p["stage3_gate"]["gate_0"]["bias"].astype(f32)
    g = gelu(g) @ p["stage3_gate"]["gate_2"]["kernel"][0, 0].astype(f32) \
        + p["stage3_gate"]["gate_2"]["bias"].astype(f32)
    f = a * jax.nn.sigmoid(g)
    def rconv(x2, key):
        return jax.lax.conv_general_dilated(
            x2, p["stage3_res"][key]["kernel"].astype(f32), (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    rb = rconv(gelu(rconv(f, "block_0")), "block_2")
    f3 = f + p["stage3_res"]["scale"].astype(f32) * rb
    c2 = p["stage3_conv_2"]["kernel"].shape[-1]
    f3 = f3 + p["rw23"].astype(f32) * x[..., :c2]
    r = gelu(conv(f3, "to_rgb_0"))
    r = conv(r, "to_rgb_2")
    return jax.nn.sigmoid(r).astype(dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hier_stage3_fused(s3_in: jnp.ndarray, p: Dict[str, Any],
                      interpret: bool = False) -> jnp.ndarray:
    """s3_in: [B, H, W, 76] (f2_up 64ch ++ expert stack 12ch); p: param
    dict with stage3_conv_0/2, stage3_gate{gate_0,gate_2},
    stage3_res{block_0,block_2,scale}, rw23, to_rgb_0/2 (flax trees).
    Returns sigmoid(to_rgb) [B, H, W, 3]. base_channels=64 geometry."""
    b, h, w_, cin = s3_in.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    dtype = s3_in.dtype
    # (16, 64) caps: the relay's scoped-vmem limit rejected the
    # sibling halo kernels at (24-32, 128)-class tiles (probe_c1).
    rh, dh = pick_bands(h, _HALO, 16)
    rw, dw_ = pick_bands(w_, _HALO, 64, align=8)
    if rh is None or rw is None or rh >= h or rw >= w_:
        return _hier_stage3_xla(s3_in, p, dtype)

    f32 = jnp.float32

    def bank(key, sub=None):
        k = (p[key][sub]["kernel"] if sub else p[key]["kernel"])
        return k.reshape(9, k.shape[2], k.shape[3]).astype(dtype)

    w0 = bank("stage3_conv_0")
    w2 = bank("stage3_conv_2")
    r0 = bank("stage3_res", "block_0")
    r2 = bank("stage3_res", "block_2")
    t0 = bank("to_rgb_0")
    t2 = bank("to_rgb_2")
    g0 = p["stage3_gate"]["gate_0"]["kernel"][0, 0].astype(dtype)
    g2 = p["stage3_gate"]["gate_2"]["kernel"][0, 0].astype(dtype)
    # bias table rows: conv_0(bc), conv_2(bc/2), gate_0(bc/8), gate_2(1),
    # to_rgb_0(bc/4), to_rgb_2(3) — one padded [8, bc] fp32 table
    c1 = w0.shape[-1]
    vb = jnp.zeros((8, max(64, c1)), f32)
    vb = vb.at[0, :c1].set(p["stage3_conv_0"]["bias"].astype(f32))
    vb = vb.at[1, :w2.shape[-1]].set(p["stage3_conv_2"]["bias"].astype(f32))
    vb = vb.at[2, :g0.shape[-1]].set(
        p["stage3_gate"]["gate_0"]["bias"].astype(f32))
    vb = vb.at[3, :1].set(p["stage3_gate"]["gate_2"]["bias"].astype(f32))
    vb = vb.at[4, :t0.shape[-1]].set(p["to_rgb_0"]["bias"].astype(f32))
    vb = vb.at[5, :3].set(p["to_rgb_2"]["bias"].astype(f32))
    sc = jnp.stack([p["stage3_res"]["scale"].astype(f32),
                    p["rw23"].astype(f32)]).reshape(1, 2)

    gh, gw = h // rh, w_ // rw
    vmem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, rh=rh, rw=rw, dh=dh, dw_=dw_,
                          h=h, w=w_, dtype=dtype),
        grid=(b, gh, gw),
        in_specs=stencil_specs(cin, rh, rw, dh, dw_)
        + [vmem(w0.shape), vmem(w2.shape), vmem(g0.shape),
           vmem(g2.shape), vmem(r0.shape), vmem(r2.shape),
           vmem(t0.shape), vmem(t2.shape), vmem(vb.shape),
           vmem(sc.shape)],
        out_specs=pl.BlockSpec((1, rh, rw, 3),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_, 3), dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * h * w_ * 9 * 2 * (76 * 64 + 64 * 32 + 32 * 32 * 2
                                        + 32 * 16 + 16 * 3),
            bytes_accessed=b * h * w_ * (cin + 3) * dtype.itemsize,
            transcendentals=b * h * w_ * 120),
        interpret=interpret,
    )(*([s3_in] * 9), w0, w2, g0, g2, r0, r2, t0, t2, vb, sc)
