"""Whole-NAFBlock fused Pallas kernel: the byte-floor restructure.

Roofline v2 (BENCH_NOTES round 4) shows NAFNet at 71% of HBM peak with
185 GB/img of XLA-route traffic — every one of the 36 NAFBlocks
(reference nafnet_arch.py:58-131) round-trips its activation through HBM
~8-10x (conv1 out at 2C, dw-conv layout copies on both sides, gate out,
SCA scale, conv3 out, FFN's conv4/gate/conv5, two LayerNorm moment
passes). The gated DWCONV kernel only removes the layout copies; this
kernel removes the round trips themselves.

Structure: one NAFBlock = attention branch (LN1 -> 1x1 (C->2C) -> dw3x3
-> SimpleGate -> SCA -> 1x1 -> +beta*residual) + FFN branch (LN2 -> 1x1
(C->2C) -> SimpleGate -> 1x1 -> +gamma*residual). Everything is local
EXCEPT the SCA global average pool over the full spatial extent, so a
spatially-tiled single pass cannot be exact. Two passes, both fully
fused in VMEM, with the gate recomputed in pass B instead of spilled:

  pass A (pool):  per tile, assemble a 1-halo stencil block, compute
                  g = SG(dw(conv1(LN1(x)))) and emit the per-tile
                  channel sum. Reads x once, writes gh*gw*C partials.
  host-side:      s = sca_kernel @ mean(g) + sca_bias   (per batch, [C])
  pass B (apply): recompute g on the tile (FLOPs are free — NAFNet is
                  8.7% MXU), then x3 = conv3(g*s); y = x + beta*x3;
                  out = y + gamma*conv5(SG(conv4(LN2(y)))). Reads x
                  once, writes the output tile once.

HBM traffic per block: ~3x P*C*itemsize (+ 2 halo rows/cols per tile)
plus one weight stream — vs the XLA route's ~8-10x P*C (measured per
level by scripts/nafblock_bytes.py). SimpleGate's non-lane-aligned
channel split (2C -> C at C=64) never materializes: conv1/conv4 kernels
and the dw kernel are pre-split into per-half operands, so each half is
its own lane-aligned tensor.

Weight packing (see pack_nafblock_weights): matrices [6, C, C] in x's
compute dtype (W1a W1b W3 W4a W4b W5), dw taps [2, 3, 3, C], per-channel
vectors [16, C] fp32 (LN eps folded at fp32), SCA scale s [B, C] fp32.

Param layout consumed is exactly the flax NAFBlock tree (models/
nafnet.py) = the torch state-dict structure, so converted checkpoints
drop in. Gated by FREQFUSION_NAFBLOCK=1 (OFF by default pending a
hardware A/B — relay down since round 3).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nafblock_fused", "pack_nafblock_weights", "nafblock_xla_ref"]

# rows of the packed per-channel vector table
_LN1_S, _LN1_B, _B1A, _B1B, _DWB_A, _DWB_B, _B3, _BETA = range(8)
_LN2_S, _LN2_B, _B4A, _B4B, _B5, _GAMMA = range(8, 14)
_NVEC = 16  # padded to a sublane multiple

# rows of the packed [6, C, C] matrix stack
_W1A, _W1B, _W3, _W4A, _W4B, _W5 = range(6)


def pack_nafblock_weights(w: Dict[str, Any], c: int, dtype) -> tuple:
    """Flax NAFBlock param tree -> (mats [6,C,C], dwk [2,3,3,C],
    vecs [16,C] fp32, sca_kernel [C,C] fp32, sca_bias [C] fp32).

    conv1/conv4 (C -> 2C) and the dw kernel are split into SimpleGate
    halves here, at trace time, so the kernel never slices the lane axis
    at the (sub-128 for C=64) half-channel boundary."""
    f32 = jnp.float32

    def k2d(name):  # [1,1,Cin,Cout] -> [Cin,Cout]
        return w[name]["kernel"][0, 0]

    w1 = k2d("conv1")
    w4 = k2d("conv4")
    mats = jnp.stack([w1[:, :c], w1[:, c:], k2d("conv3"),
                      w4[:, :c], w4[:, c:], k2d("conv5")]).astype(dtype)
    dwk_full = w["conv2"]["kernel"][:, :, 0, :]  # [3,3,2C]
    dwk = jnp.stack([dwk_full[:, :, :c], dwk_full[:, :, c:]]).astype(f32)
    b1 = w["conv1"]["bias"]
    b4 = w["conv4"]["bias"]
    dwb = w["conv2"]["bias"]
    vecs = jnp.zeros((_NVEC, c), f32)
    rows = {
        _LN1_S: w["norm1"]["scale"], _LN1_B: w["norm1"]["bias"],
        _B1A: b1[:c], _B1B: b1[c:], _DWB_A: dwb[:c], _DWB_B: dwb[c:],
        _B3: w["conv3"]["bias"], _BETA: w["beta"],
        _LN2_S: w["norm2"]["scale"], _LN2_B: w["norm2"]["bias"],
        _B4A: b4[:c], _B4B: b4[c:], _B5: w["conv5"]["bias"],
        _GAMMA: w["gamma"],
    }
    for r, v in rows.items():
        vecs = vecs.at[r].set(v.astype(f32))
    return mats, dwk, vecs, k2d("sca").astype(f32), w["sca"]["bias"].astype(f32)


def _ln(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return d * jax.lax.rsqrt(var + eps) * scale + bias


from .halo import pick_bands, stencil_block, stencil_specs  # noqa: E402


def _gate_tile(blk, valid, m_ref, k_ref, v_ref, rh, rw, c, dtype):
    """g = SimpleGate(dw3x3(conv1(LN1(x)))) on the tile interior, fp32.

    blk: fp32 (rh+2, rw+2, C) halo block; dw zero-padding is enforced by
    masking conv1's output u outside the image (the dw input is zero
    there), NOT by masking x — LN/conv1 of clamped garbage is finite and
    then masked."""
    f32 = jnp.float32
    xn = _ln(blk, v_ref[_LN1_S], v_ref[_LN1_B])
    p2 = (rh + 2) * (rw + 2)
    xn2 = xn.reshape(p2, c).astype(dtype)
    halves = []
    for wrow, brow, krow, dwbrow in ((_W1A, _B1A, 0, _DWB_A),
                                     (_W1B, _B1B, 1, _DWB_B)):
        u = jax.lax.dot_general(
            xn2, m_ref[wrow], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        u = (u.reshape(rh + 2, rw + 2, c) + v_ref[brow])
        u = jnp.where(valid, u, jnp.zeros_like(u))
        acc = None
        for di in range(3):
            for dj in range(3):
                t = u[di: di + rh, dj: dj + rw] * k_ref[krow, di, dj]
                acc = t if acc is None else acc + t
        halves.append(acc + v_ref[dwbrow])
    return halves[0] * halves[1]


def _pool_kernel(*refs, rh, rw, dh, dw_, h, w, c, dtype):
    stencil, (m_ref, k_ref, v_ref), o_ref = refs[:9], refs[9:12], refs[12]
    blk, valid = stencil_block(stencil, rh, rw, dh, dw_, 1, h, w)
    g = _gate_tile(blk.astype(jnp.float32), valid, m_ref, k_ref, v_ref,
                   rh, rw, c, dtype)
    o_ref[0, 0, 0] = jnp.sum(g, axis=(0, 1))


def _apply_kernel(*refs, rh, rw, dh, dw_, h, w, c, dtype):
    stencil, (m_ref, k_ref, v_ref, s_ref), o_ref = (refs[:9], refs[9:13],
                                                    refs[13])
    f32 = jnp.float32
    blk, valid = stencil_block(stencil, rh, rw, dh, dw_, 1, h, w)
    blk = blk.astype(f32)
    g = _gate_tile(blk, valid, m_ref, k_ref, v_ref, rh, rw, c, dtype)

    p = rh * rw
    gs = (g * s_ref[0]).reshape(p, c).astype(dtype)
    x3 = jax.lax.dot_general(gs, m_ref[_W3], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    x3 = x3.reshape(rh, rw, c) + v_ref[_B3]
    y = blk[1: 1 + rh, 1: 1 + rw] + x3 * v_ref[_BETA]

    t2 = _ln(y, v_ref[_LN2_S], v_ref[_LN2_B]).reshape(p, c).astype(dtype)
    ua = jax.lax.dot_general(t2, m_ref[_W4A], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    ub = jax.lax.dot_general(t2, m_ref[_W4B], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    g2 = ((ua.reshape(rh, rw, c) + v_ref[_B4A])
          * (ub.reshape(rh, rw, c) + v_ref[_B4B]))
    g2 = g2.reshape(p, c).astype(dtype)
    o = jax.lax.dot_general(g2, m_ref[_W5], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    o = o.reshape(rh, rw, c) + v_ref[_B5]
    o_ref[0] = (y + o * v_ref[_GAMMA]).astype(o_ref.dtype)


def _pick_tile(dim: int, cap: int) -> int:
    for t in range(min(cap, dim), 0, -1):
        if dim % t == 0:
            return t
    return dim


def _tiles(h: int, w: int, c: int, itemsize: int,
           budget: int = 12 * 1024 * 1024):
    """Pick (rh, rw) under a VMEM budget. Accounting (ADVICE r4: count
    everything resident): halo block in x.dtype + fp32 halo block + two
    fp32 halo-region gate halves + ~4 fp32 tile temps + the full weight
    stack."""
    weights = (6 * c * c * itemsize + 2 * 9 * c * 4 + _NVEC * c * 4
               + 2 * c * 4)

    def cost(rh, rw):
        halo = (rh + 2) * (rw + 2) * c
        tile = rh * rw * c
        return halo * (itemsize + 4 + 2 * 4) + tile * 4 * 4 + weights

    rw = _pick_tile(w, 256)
    rh = _pick_tile(h, 8)
    while cost(rh, rw) > budget and rw > 8:
        rw = _pick_tile(w, rw // 2)
    while cost(rh, rw) > budget and rh > 1:
        rh = _pick_tile(h, rh // 2)
    return rh, rw, cost(rh, rw)


def nafblock_xla_ref(x: jnp.ndarray, w: Dict[str, Any]) -> jnp.ndarray:
    """Plain-XLA composition of the same param tree (tiny-input fallback;
    parity oracle is the flax module in tests/test_pallas_nafblock.py)."""
    c = x.shape[-1]
    f32 = jnp.float32
    xn = _ln(x.astype(f32), w["norm1"]["scale"].astype(f32),
             w["norm1"]["bias"].astype(f32))
    u = xn @ w["conv1"]["kernel"][0, 0].astype(f32) + w["conv1"]["bias"].astype(f32)
    u = jax.lax.conv_general_dilated(
        u, w["conv2"]["kernel"].astype(f32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2 * c) + w["conv2"]["bias"].astype(f32)
    g = u[..., :c] * u[..., c:]
    pool = jnp.mean(g, axis=(1, 2), keepdims=True)
    s = pool @ w["sca"]["kernel"][0, 0].astype(f32) + w["sca"]["bias"].astype(f32)
    x3 = (g * s) @ w["conv3"]["kernel"][0, 0].astype(f32) + w["conv3"]["bias"].astype(f32)
    y = x.astype(f32) + x3 * w["beta"].astype(f32)
    t2 = _ln(y, w["norm2"]["scale"].astype(f32), w["norm2"]["bias"].astype(f32))
    u2 = t2 @ w["conv4"]["kernel"][0, 0].astype(f32) + w["conv4"]["bias"].astype(f32)
    g2 = u2[..., :c] * u2[..., c:]
    o = g2 @ w["conv5"]["kernel"][0, 0].astype(f32) + w["conv5"]["bias"].astype(f32)
    return (y + o * w["gamma"].astype(f32)).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nafblock_fused(x: jnp.ndarray, w: Dict[str, Any],
                   interpret: bool = False) -> jnp.ndarray:
    """One full NAFBlock, two fused passes. x: [B, H, W, C]; w: the flax
    NAFBlock param tree (converted torch weights drop in). Exact
    semantics incl. the SCA global pool (nafnet_arch.py:75-84)."""
    b, h, w_, c = x.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    dtype = x.dtype
    rh, rw, _ = _tiles(h, w_, c, dtype.itemsize)
    if h < 3 or w_ < 3 or (rh + 2) > h or (rw + 2) > w_:
        return nafblock_xla_ref(x, w)

    rh, dh = pick_bands(h, 1, rh)
    rw, dw_ = pick_bands(w_, 1, rw, align=8)
    if rh is None or rw is None:
        return nafblock_xla_ref(x, w)
    mats, dwk, vecs, sca_k, sca_b = pack_nafblock_weights(w, c, dtype)
    gh, gw = h // rh, w_ // rw
    grid = (b, gh, gw)
    fixed_specs = stencil_specs(c, rh, rw, dh, dw_) + [
        pl.BlockSpec(mats.shape, lambda bi, i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(dwk.shape, lambda bi, i, j: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(vecs.shape, lambda bi, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kw = dict(rh=rh, rw=rw, dh=dh, dw_=dw_, h=h, w=w_, c=c, dtype=dtype)
    npix = h * w_
    flops_gate = npix * c * (2 * 2 * c + 2 * 18 + 1)

    # partials laid out [B, gh*gw, 1, C]: the production Mosaic checker
    # requires each of the last two block dims to be 8/128-divisible OR
    # equal to the full array dim — (1, c) over (gh, c) fails, (1, c)
    # over (1, c) passes (probe receipt MEASURE_r5c / probe_c0).
    partials = pl.pallas_call(
        functools.partial(_pool_kernel, **kw),
        grid=grid,
        in_specs=fixed_specs,
        out_specs=pl.BlockSpec((1, 1, 1, c),
                               lambda bi, i, j: (bi, i * gw + j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, gh * gw, 1, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_gate,
            bytes_accessed=b * npix * c * dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*([x] * 9), mats, dwk, vecs)

    mean = jnp.sum(partials, axis=(1, 2)) / np.float32(npix)   # [B, C]
    s = (mean @ sca_k + sca_b).reshape(b, 1, c)  # [B,1,C]: legal block

    return pl.pallas_call(
        functools.partial(_apply_kernel, **kw),
        grid=grid,
        in_specs=fixed_specs + [
            pl.BlockSpec((1, 1, c), lambda bi, i, j: (bi, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rh, rw, c),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * (flops_gate + npix * c * (2 * 3 * c + 8)),
            bytes_accessed=2 * b * npix * c * dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*([x] * 9), mats, dwk, vecs, s)
