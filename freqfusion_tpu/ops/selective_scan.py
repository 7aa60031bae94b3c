"""Selective scan (Mamba S6 recurrence), TPU-native.

Replaces the CUDA kernel ``mamba_ssm.ops.selective_scan_interface.
selective_scan_fn`` the reference imports at src/models/mambair/
mambair_arch.py:11 and drives from SS2D.forward_core (:339-369).

Recurrence (per batch b, channel d, state n over sequence position t):
    delta = softplus(dt + dt_bias)
    h_t   = exp(delta_t * A) * h_{t-1} + delta_t * B_t * u_t
    y_t   = sum_n C_t[n] * h_t[n] + D * u_t

TPU-first formulation: the first-order linear recurrence
``h_t = a_t h_{t-1} + b_t`` is associative under
``(a1,b1) o (a2,b2) = (a1 a2, a2 b1 + b2)`` so it parallelizes with
``jax.lax.associative_scan`` (log-depth on the VPU). To bound memory at
long L (full-image SR: L = H*W can exceed 10^5), the sequence is processed
in fixed-size chunks under ``lax.scan``: each chunk runs an associative
scan locally and the carry state is stitched in with the chunk's cumulative
decay — O(B*D*N*chunk) live memory instead of O(B*D*N*L).

State is kept fp32 like the reference forces (mambair_arch.py:349-363).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["selective_scan", "selective_scan_pallas",
           "selective_scan_pallas_dirs", "selective_scan_pallas_bidir",
           "selective_scan_pallas_spatial", "selective_scan_pallas_chain",
           "selective_scan_pallas_chain_proj",
           "selective_scan_pallas_chain_fused", "chain_fused_fits"]


def _scan_combine(c1, c2):
    a1, b1 = c1
    a2, b2 = c2
    return a1 * a2, a2 * b1 + b2


def selective_scan(u: jnp.ndarray,
                   delta: jnp.ndarray,
                   A: jnp.ndarray,
                   B: jnp.ndarray,
                   C: jnp.ndarray,
                   D: Optional[jnp.ndarray] = None,
                   delta_bias: Optional[jnp.ndarray] = None,
                   delta_softplus: bool = True,
                   chunk: int = 512) -> jnp.ndarray:
    """Selective scan over layout [batch, L, D] / [batch, L, N].

    Args:
      u:     [B, L, D] inputs
      delta: [B, L, D] pre-softplus timestep
      A:     [D, N]    (already negated, i.e. -exp(A_log))
      B:     [B, L, N]
      C:     [B, L, N]
      D:     [D] skip, optional
      delta_bias: [D], optional
      chunk: chunk length for the sequential-over-chunks scan
    Returns:
      y: [B, L, D] float32
    """
    b, l, d = u.shape
    n = A.shape[-1]

    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    # Pad L to a multiple of chunk (zero delta => identity transition).
    num_chunks = -(-l // chunk)
    lp = num_chunks * chunk
    if lp != l:
        pad = [(0, 0), (0, lp - l), (0, 0)]
        u = jnp.pad(u, pad)
        delta = jnp.pad(delta, pad)
        B = jnp.pad(B, pad)
        C = jnp.pad(C, pad)

    # Chunked layout: [num_chunks, B, chunk, ...]
    def chunked(x):
        return x.reshape(b, num_chunks, chunk, -1).transpose(1, 0, 2, 3)

    u_c, dt_c, b_c, c_c = map(chunked, (u, delta, B, C))

    A = A.astype(jnp.float32)
    dfloat = None if D is None else D.astype(jnp.float32)

    def step(h_carry, inputs):
        u_k, dt_k, b_k, c_k = inputs            # [B, chunk, D/N]
        # Transition/input terms for this chunk:
        #   a = exp(dt * A)      [B, chunk, D, N]
        #   b = dt * B * u       [B, chunk, D, N]
        a = jnp.exp(dt_k[..., None] * A)        # broadcast A [D, N]
        bu = (dt_k * u_k)[..., None] * b_k[:, :, None, :]
        # Local prefix scan within the chunk (log-depth).
        a_cum, h_local = lax.associative_scan(_scan_combine, (a, bu), axis=1)
        h = a_cum * h_carry[:, None] + h_local  # stitch carry in
        y = jnp.einsum("bln,bldn->bld", c_k, h,
                       preferred_element_type=jnp.float32)
        return h[:, -1], y

    h0 = jnp.zeros((b, d, n), jnp.float32)
    _, ys = lax.scan(step, h0, (u_c, dt_c, b_c, c_c))
    y = ys.transpose(1, 0, 2, 3).reshape(b, lp, d)[:, :l]
    if dfloat is not None:
        y = y + u[:, :l] * dfloat
    return y


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------
#
# The XLA path above round-trips the [B, chunk, D, N] transition tensors
# through HBM between the elementwise ops, the associative scan tree, and
# the output einsum. This kernel keeps one chunk's whole recurrence resident
# in VMEM and carries the running state h[D, N] in scratch across the
# sequential grid steps.
#
# Layout note: (N, D) is flattened to one lane axis of size N*D (n-major:
# index n*D + d). With d_state N=16 a 3-D layout would pad the minor dim
# 16 -> 128 on TPU (8x memory and VPU waste). The n-major flattening is
# built purely from static concats / column broadcasts — no reshapes, which
# Mosaic's vector layout inference rejects for [T, D, N] -> [T, D*N].


def _ss_kernel(u_ref, dt_ref, b_ref, c_ref, a_ref, dskip_ref, bias_ref,
               y_ref, h_ref, *, d: int, n: int, inner: int = 8):
    t = u_ref.shape[1]
    chunk_idx = pl.program_id(1)

    @pl.when(chunk_idx == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    # Blocked inclusive scan: the whole pipeline (softplus -> n-major
    # expansion -> exp -> Hillis-Steele over R rows -> carry stitch ->
    # output contraction) runs per R-row group, so peak VMEM is a handful
    # of [R, N*D] arrays rather than six [T, N*D] ones — which lets the
    # grid chunk T grow to 1024 (8x fewer grid steps at R=8).
    # Hillis-Steele uses pltpu.roll + mask (lax.associative_scan lowers to
    # strided sublane slices Mosaic rejects); blocked recurrence costs
    # T*log2(R) + T combine passes vs T*log2(T) for the full-width tree.
    R = min(inner, t)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    carry = h_ref[:]
    for g in range(t // R):
        sl = slice(g * R, (g + 1) * R)
        u_g = u_ref[0, sl].astype(jnp.float32)          # [R, D]
        delta_g = jax.nn.softplus(
            dt_ref[0, sl].astype(jnp.float32) + bias_ref[:])
        du_g = delta_g * u_g
        bb = b_ref[0, sl].astype(jnp.float32)           # [R, N]
        cc = c_ref[0, sl].astype(jnp.float32)

        dt_rep = jnp.concatenate([delta_g] * n, axis=1)  # [R, N*D]
        du_rep = jnp.concatenate([du_g] * n, axis=1)
        b_rep = jnp.concatenate(
            [jnp.broadcast_to(bb[:, i : i + 1], (R, d)) for i in range(n)],
            axis=1)
        c_rep = jnp.concatenate(
            [jnp.broadcast_to(cc[:, i : i + 1], (R, d)) for i in range(n)],
            axis=1)

        ag = jnp.exp(dt_rep * a_ref[:])                 # [R, N*D]
        bg = du_rep * b_rep
        s = 1
        while s < R:
            a_prev = pltpu.roll(ag, s, axis=0)
            b_prev = pltpu.roll(bg, s, axis=0)
            valid = row >= s
            a_prev = jnp.where(valid, a_prev, 1.0)
            b_prev = jnp.where(valid, b_prev, 0.0)
            bg = ag * b_prev + bg
            ag = ag * a_prev
            s *= 2
        hg = ag * carry + bg                            # [R, N*D]
        carry = hg[R - 1 :]

        z = hg * c_rep
        y = z[:, :d]
        for i in range(1, n):
            y = y + z[:, i * d : (i + 1) * d]           # [R, D]
        y_ref[0, sl] = y + u_g * dskip_ref[:]
    h_ref[:] = carry


@functools.partial(jax.jit, static_argnames=("chunk", "inner",
                                             "interpret"))
def selective_scan_pallas(u: jnp.ndarray,
                          delta: jnp.ndarray,
                          A: jnp.ndarray,
                          B: jnp.ndarray,
                          C: jnp.ndarray,
                          D: jnp.ndarray,
                          delta_bias: jnp.ndarray,
                          chunk: int = 64,
                          inner: int = 8,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused selective scan; same contract as ``selective_scan`` with
    delta_softplus=True. u/delta [B, L, D]; B/C [B, L, N]; A [D, N]."""
    b, l, d = u.shape
    n = A.shape[-1]
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # no Mosaic on CPU (tests force FREQFUSION_PALLAS=1)
    if chunk % min(inner, chunk) != 0:
        # the kernel's blocked scan iterates range(chunk // R) groups with
        # R = min(inner, chunk) — a non-divisor would silently drop
        # chunk % R rows per chunk and corrupt the carry
        raise ValueError(f"chunk ({chunk}) must be a multiple of inner "
                         f"({inner})")
    num_chunks = -(-l // chunk)
    lp = num_chunks * chunk
    if lp != l:
        pad = [(0, 0), (0, lp - l), (0, 0)]
        u, delta, B, C = (jnp.pad(x, pad) for x in (u, delta, B, C))

    # n-major flatten: A[d, n] -> [1, n*D] with index n*D + d
    a_flat = A.astype(jnp.float32).T.reshape(1, d * n)

    def blk(feat):
        return pl.BlockSpec((1, chunk, feat), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(_ss_kernel, d=d, n=n, inner=inner),
        grid=(b, num_chunks),
        in_specs=[blk(d), blk(d), blk(n), blk(n),
                  full((1, d * n)), full((1, d)), full((1, d))],
        out_specs=blk(d),
        out_shape=jax.ShapeDtypeStruct((b, lp, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, d * n), jnp.float32)],
        interpret=interpret,
    )(u, delta, B, C, a_flat,
      D.astype(jnp.float32).reshape(1, d),
      delta_bias.astype(jnp.float32).reshape(1, d))
    return y[:, :l]


# ---------------------------------------------------------------------------
# Direction-batched kernel (v2)
# ---------------------------------------------------------------------------
#
# SS2D runs FOUR independent scans per layer (row/col major + reversals,
# mambair_arch.py:339-369). v1 dispatched one pallas_call per direction
# (144 per image through MambaIR); here the direction axis joins the grid,
# with per-direction A/D/dt_bias streamed via index maps. The in-chunk
# compute keeps v1's per-group structure (everything at [R, N*D]): peak
# VMEM stays a few hundred KB per group, which measured faster than
# full-chunk-width [chunk, N*D] passes (those keep ~6 fp32 arrays of
# 2.9 MB live; measured 2.8 s vs 2.5 s per image in-model) and lets the
# grid chunk grow to 512+ rows for fewer sequential grid steps.


def _ss_group(u_g, dt_g, bb, cc, a_row, dskip, bias, carry, *,
              d: int, n: int, reverse: bool, use_exp2: bool = False):
    """One R-row group: build, Hillis-Steele combine, carry stitch,
    output contraction. carry is [1, N*D]; returns (y_g [R, D], carry').

    use_exp2: a_row is pre-scaled by log2(e); the decay uses the native
    exp2 (saves the ln2 multiply inside every transcendental)."""
    R = u_g.shape[0]
    u_g = u_g.astype(jnp.float32)
    delta_g = jax.nn.softplus(dt_g.astype(jnp.float32) + bias)
    du_g = delta_g * u_g
    bb = bb.astype(jnp.float32)
    cc = cc.astype(jnp.float32)

    # n-major lane flattening (index n*D + d) via static concats — Mosaic
    # rejects [R, D, N] -> [R, D*N] reshapes.
    dt_rep = jnp.concatenate([delta_g] * n, axis=1)          # [R, N*D]
    du_rep = jnp.concatenate([du_g] * n, axis=1)
    b_rep = jnp.concatenate(
        [jnp.broadcast_to(bb[:, i: i + 1], (R, d)) for i in range(n)], axis=1)
    c_rep = jnp.concatenate(
        [jnp.broadcast_to(cc[:, i: i + 1], (R, d)) for i in range(n)], axis=1)

    _exp = jnp.exp2 if use_exp2 else jnp.exp
    ag = _exp(dt_rep * a_row)                                # [R, N*D]
    bg = du_rep * b_rep
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    s = 1
    while s < R:
        if reverse:
            # suffix combine: row r absorbs row r+s
            a_o = pltpu.roll(ag, R - s, axis=0)
            b_o = pltpu.roll(bg, R - s, axis=0)
            valid = row <= R - 1 - s
        else:
            a_o = pltpu.roll(ag, s, axis=0)
            b_o = pltpu.roll(bg, s, axis=0)
            valid = row >= s
        a_o = jnp.where(valid, a_o, 1.0)
        b_o = jnp.where(valid, b_o, 0.0)
        bg = ag * b_o + bg
        ag = ag * a_o
        s *= 2

    hg = ag * carry + bg
    carry = hg[0:1] if reverse else hg[R - 1:]

    z = hg * c_rep
    y = z[:, :d]
    for i in range(1, n):
        y = y + z[:, i * d: (i + 1) * d]                    # [R, D]
    return y + u_g * dskip, carry


def _ss_dirs_kernel(u_ref, dt_ref, b_ref, c_ref, a_ref, dskip_ref, bias_ref,
                    y_ref, h_ref, *, d: int, n: int, inner: int = 8):
    t = u_ref.shape[2]
    chunk_idx = pl.program_id(2)

    @pl.when(chunk_idx == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    R = min(inner, t)
    carry = h_ref[:]
    for g in range(t // R):
        sl = slice(g * R, (g + 1) * R)
        y, carry = _ss_group(
            u_ref[0, 0, sl], dt_ref[0, 0, sl], b_ref[0, 0, sl],
            c_ref[0, 0, sl], a_ref[0], dskip_ref[0], bias_ref[0], carry,
            d=d, n=n, reverse=False)
        y_ref[0, 0, sl] = y
    h_ref[:] = carry


@functools.partial(jax.jit, static_argnames=("chunk", "inner", "interpret"))
def selective_scan_pallas_dirs(u: jnp.ndarray,
                               delta: jnp.ndarray,
                               A: jnp.ndarray,
                               B: jnp.ndarray,
                               C: jnp.ndarray,
                               D: jnp.ndarray,
                               delta_bias: jnp.ndarray,
                               chunk: int = 128,
                               inner: int = 8,
                               interpret: bool = False) -> jnp.ndarray:
    """All-direction selective scan (delta_softplus=True semantics).

    u/delta: [K, B, L, D]; B/C: [K, B, L, N]; A: [K, D, N];
    D/delta_bias: [K, D]. Returns y [K, B, L, D] float32.
    """
    k, b, l, d = u.shape
    n = A.shape[-1]
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # no Mosaic on CPU (tests force FREQFUSION_PALLAS=1)
    if chunk % min(inner, chunk) != 0:
        raise ValueError(f"chunk ({chunk}) must be a multiple of inner "
                         f"({inner})")
    num_chunks = -(-l // chunk)
    lp = num_chunks * chunk
    if lp != l:
        pad = [(0, 0), (0, 0), (0, lp - l), (0, 0)]
        u, delta, B, C = (jnp.pad(x, pad) for x in (u, delta, B, C))

    # per-direction n-major flatten: A[k, d, n] -> [k, 1, n*D] (the unit
    # middle axis keeps the VMEM block 2D-tileable)
    a_flat = A.astype(jnp.float32).transpose(0, 2, 1).reshape(k, 1, d * n)

    def blk(feat):
        return pl.BlockSpec((1, 1, chunk, feat),
                            lambda ki, bi, j: (ki, bi, j, 0),
                            memory_space=pltpu.VMEM)

    def per_dir(*feat):
        nd = len(feat) + 1
        return pl.BlockSpec((1,) + feat,
                            lambda ki, bi, j, _n=nd: (ki,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(_ss_dirs_kernel, d=d, n=n, inner=inner),
        grid=(k, b, num_chunks),
        in_specs=[blk(d), blk(d), blk(n), blk(n),
                  per_dir(1, d * n), per_dir(1, d), per_dir(1, d)],
        out_specs=blk(d),
        out_shape=jax.ShapeDtypeStruct((k, b, lp, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, d * n), jnp.float32)],
        interpret=interpret,
    )(u, delta, B, C, a_flat,
      D.astype(jnp.float32).reshape(k, 1, d),
      delta_bias.astype(jnp.float32).reshape(k, 1, d))
    return y[:, :, :l]


# ---------------------------------------------------------------------------
# Bidirectional kernel (v3): reversed directions run a *backward* recurrence
# ---------------------------------------------------------------------------
#
# SS2D's directions 2/3 are the row/col sequences reversed. Materializing
# the flips cost ~190 ms/image of `rev` ops plus stack copies (profiled).
# Instead the backward kernel walks the chunk grid in reverse via its index
# maps and runs the suffix recurrence h_t = a_t * h_{t+1} + b_t in-chunk,
# so both passes read the SAME unflipped arrays and both outputs come back
# in natural order (no un-flip either).


def _ss_dirs_kernel_rev(u_ref, dt_ref, b_ref, c_ref, a_ref, dskip_ref,
                        bias_ref, y_ref, h_ref, *, d: int, n: int,
                        inner: int = 8):
    t = u_ref.shape[2]
    chunk_idx = pl.program_id(2)

    @pl.when(chunk_idx == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    R = min(inner, t)
    carry = h_ref[:]
    for g in range(t // R - 1, -1, -1):
        sl = slice(g * R, (g + 1) * R)
        y, carry = _ss_group(
            u_ref[0, 0, sl], dt_ref[0, 0, sl], b_ref[0, 0, sl],
            c_ref[0, 0, sl], a_ref[0], dskip_ref[0], bias_ref[0], carry,
            d=d, n=n, reverse=True)
        y_ref[0, 0, sl] = y
    h_ref[:] = carry


@functools.partial(jax.jit, static_argnames=("chunk", "inner", "interpret"))
def selective_scan_pallas_bidir(u: jnp.ndarray,
                                delta: jnp.ndarray,
                                A: jnp.ndarray,
                                B: jnp.ndarray,
                                C: jnp.ndarray,
                                D: jnp.ndarray,
                                delta_bias: jnp.ndarray,
                                chunk: int = 128,
                                inner: int = 8,
                                interpret: bool = False):
    """SS2D's 4-direction scan from UNFLIPPED sequences.

    u: [2, b, l, d] (row-major, col-major). delta/B/C: [4, b, l, *] for
    directions (row-fwd, col-fwd, row-bwd, col-bwd), all computed from the
    unflipped sequences. A: [4, d, n]; D/delta_bias: [4, d].
    Returns (y_fwd [2, b, l, d], y_bwd [2, b, l, d]) float32, both in
    natural sequence order (backward outputs need no un-flip).
    """
    _, b, l, d = u.shape
    n = A.shape[-1]
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if chunk % min(inner, chunk) != 0:
        raise ValueError(f"chunk ({chunk}) must be a multiple of inner "
                         f"({inner})")
    num_chunks = -(-l // chunk)
    lp = num_chunks * chunk
    if lp != l:
        pad = [(0, 0), (0, 0), (0, lp - l), (0, 0)]
        u = jnp.pad(u, pad)
        delta, B, C = (jnp.pad(x, pad) for x in (delta, B, C))

    a_flat = A.astype(jnp.float32).transpose(0, 2, 1).reshape(4, 1, d * n)
    dskip = D.astype(jnp.float32).reshape(4, 1, d)
    bias = delta_bias.astype(jnp.float32).reshape(4, 1, d)

    def call(kernel, dir_idx, fwd: bool):
        if fwd:
            cmap = lambda ki, bi, j: (ki, bi, j, 0)
        else:
            cmap = lambda ki, bi, j: (ki, bi, num_chunks - 1 - j, 0)

        def blk(feat, index_map=None):
            return pl.BlockSpec((1, 1, chunk, feat), index_map or cmap,
                                memory_space=pltpu.VMEM)

        def per_dir(arr):
            shape = arr.shape[1:]
            return pl.BlockSpec((1,) + shape,
                                lambda ki, bi, j, _n=len(shape): (ki,) + (0,) * _n,
                                memory_space=pltpu.VMEM)

        sl = slice(dir_idx, dir_idx + 2)
        args = (u, delta[sl], B[sl], C[sl], a_flat[sl], dskip[sl], bias[sl])
        return pl.pallas_call(
            functools.partial(kernel, d=d, n=n, inner=inner),
            grid=(2, b, num_chunks),
            in_specs=[blk(d), blk(d), blk(n), blk(n),
                      per_dir(a_flat), per_dir(dskip), per_dir(bias)],
            out_specs=blk(d),
            out_shape=jax.ShapeDtypeStruct((2, b, lp, d), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, d * n), jnp.float32)],
            interpret=interpret,
        )(*args)

    y_fwd = call(_ss_dirs_kernel, 0, True)[:, :, :l]
    y_bwd = call(_ss_dirs_kernel_rev, 2, False)[:, :, :l]
    return y_fwd, y_bwd


# ---------------------------------------------------------------------------
# Spatial-direct kernels (v4): scan straight over the NHWC layout
# ---------------------------------------------------------------------------
#
# SS2D's row-major sequence is just the rows of the [B, H, W, D] tensor in
# order, and the column-major sequence is the rows of its [B, W, H, D]
# transpose. Reading one spatial row per grid step (carry flowing across
# rows in scratch) removes every layout materialization the [K, B, L, D]
# form needed: no per-direction sequence copies, no 4-way stack, and the
# outputs come back spatially so the direction sum needs a single
# transpose (profiled: ~0.2 s/img of copies in MambaIR). Forward and
# backward variants pair with the un-transposed/transposed inputs to cover
# all four directions in four dispatches per layer.


def _ss_sp_kernel(u_ref, dt_ref, b_ref, c_ref, a_ref, dskip_ref, bias_ref,
                  y_ref, h_ref, *, d: int, n: int, inner: int = 8,
                  reverse: bool = False, use_exp2: bool = False):
    t = u_ref.shape[2]
    row_idx = pl.program_id(1)

    @pl.when(row_idx == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    R = min(inner, t)
    carry = h_ref[:]
    groups = range(t // R - 1, -1, -1) if reverse else range(t // R)
    for g in groups:
        sl = slice(g * R, (g + 1) * R)
        y, carry = _ss_group(
            u_ref[0, 0, sl], dt_ref[0, 0, sl], b_ref[0, 0, sl],
            c_ref[0, 0, sl], a_ref[:], dskip_ref[:], bias_ref[:], carry,
            d=d, n=n, reverse=reverse, use_exp2=use_exp2)
        y_ref[0, 0, sl] = y.astype(y_ref.dtype)
    h_ref[:] = carry


@functools.partial(jax.jit, static_argnames=("inner", "reverse",
                                             "interpret", "use_exp2",
                                             "out_dtype"))
def selective_scan_pallas_spatial(u: jnp.ndarray,
                                  delta: jnp.ndarray,
                                  A: jnp.ndarray,
                                  B: jnp.ndarray,
                                  C: jnp.ndarray,
                                  D: jnp.ndarray,
                                  delta_bias: jnp.ndarray,
                                  inner: int = 8,
                                  reverse: bool = False,
                                  interpret: bool = False,
                                  use_exp2: bool = False,
                                  out_dtype=None) -> jnp.ndarray:
    """One scan direction over a spatially-laid-out sequence.

    u/delta: [B, R, T, D] — R row-chunks of T positions, rows in sequence
    order (row-major: the NHWC tensor itself; column-major: its [B, W, H,
    D] transpose). B/C: [B, R, T, N]; A: [D, N]; D/delta_bias: [D].
    reverse=True runs the suffix recurrence (sequence reversed) while
    reading and writing the SAME natural-order layout. T must be a
    multiple of ``inner``. Returns y [B, R, T, D] in ``out_dtype``
    (default float32; state math is fp32 in-kernel regardless).
    """
    b, r, t, d = u.shape
    n = A.shape[-1]
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if t % min(inner, t) != 0:
        raise ValueError(f"T ({t}) must be a multiple of inner ({inner})")
    out_dtype = out_dtype or jnp.float32

    a_flat = A.astype(jnp.float32).transpose(1, 0).reshape(1, d * n)
    if use_exp2:
        a_flat = a_flat * jnp.float32(1.4426950408889634)  # log2(e)

    if reverse:
        cmap = lambda bi, ri: (bi, r - 1 - ri, 0, 0)
    else:
        cmap = lambda bi, ri: (bi, ri, 0, 0)

    def blk(feat):
        return pl.BlockSpec((1, 1, t, feat), cmap, memory_space=pltpu.VMEM)

    def const(arr):
        return pl.BlockSpec(arr.shape, lambda bi, ri: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    dskip = D.astype(jnp.float32).reshape(1, d)
    bias = delta_bias.astype(jnp.float32).reshape(1, d)
    return pl.pallas_call(
        functools.partial(_ss_sp_kernel, d=d, n=n, inner=inner,
                          reverse=reverse, use_exp2=use_exp2),
        grid=(b, r),
        in_specs=[blk(d), blk(d), blk(n), blk(n),
                  const(a_flat), const(dskip), const(bias)],
        out_specs=blk(d),
        out_shape=jax.ShapeDtypeStruct((b, r, t, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((1, d * n), jnp.float32)],
        interpret=interpret,
    )(u, delta, B, C, a_flat, dskip, bias)


# ---------------------------------------------------------------------------
# Chain-parallel kernels (v5): 8 sublane-parallel chains, serial time steps
# ---------------------------------------------------------------------------
#
# The v4 kernels spend ~70% of their element work on the in-group
# Hillis-Steele structure (3 roll+select passes + stitch = ~19 of ~26
# vector ops per state element — the "3.5x minimum work" the round-2
# roofline identified). v5 removes the intra-group scan entirely: the
# TRANSPOSED spatial layout [B, T, R, D] puts 8 *consecutive chains*
# (image rows for the row-major direction / image columns for the
# column-major one — which is just the other of the two layouts SS2D
# already has) on the 8 sublanes, so a serial walk over the T time steps
# advances 8 chains per FMA at full vreg utilization. Exactness across
# chain boundaries (the sequence runs row 0, row 1, ... in order) is
# restored by a two-pass structure:
#   1. summary kernel: per chain, the total decay P = exp(A * sum(delta))
#      (the per-step decays telescope through exp) and the zero-init final
#      state F — ~6 ops/element, no output write;
#   2. an O(R) associative scan over chains in XLA composes (P, F) into
#      each chain's true initial state;
#   3. main kernel: the same serial walk seeded with the true inits,
#      emitting y — ~9 ops/element.
# Per-state math is slice-wise at [8, Dp] per state index n with D padded
# to a lane multiple (360 -> 384): every slice op is lane-aligned, there
# are no [R, N*D] concat/broadcast builds at all (round 2 measured
# slice-wise builds LOSING at d=360 — misaligned 2.8-vreg slices — which
# the pad fixes), and A streams in as [N, Dp] rows (sublane-broadcast-
# safe). State stays fp32 in-kernel; I/O follows the compute dtype.


def _ss_chain_step(u_w, dt_w, bb, a_ref, bias, hs, *, n: int, dp: int,
                   use_exp2: bool, cc=None, dskip=None):
    """One serial time step advancing 8 chains held in ``hs`` (a list of
    n [8, Dp] fp32 states). Returns (delta, y_or_None)."""
    _exp = jnp.exp2 if use_exp2 else jnp.exp
    u_w = u_w.astype(jnp.float32)
    delta = jax.nn.softplus(dt_w.astype(jnp.float32) + bias)
    du = delta * u_w
    bb = bb.astype(jnp.float32)
    y = None if cc is None else u_w * dskip
    for i in range(n):
        a_i = _exp(delta * a_ref[i: i + 1])
        bu_i = du * jnp.broadcast_to(bb[:, i: i + 1], du.shape)
        hs[i] = a_i * hs[i] + bu_i
        if cc is not None:
            y = y + hs[i] * jnp.broadcast_to(cc[:, i: i + 1], du.shape)
    return delta, y


def _ss_chain_summary_kernel(u_ref, dt_ref, b_ref, a_ref, bias_ref,
                             p_ref, f_ref, s_scr, f_scr, *, dp: int,
                             n: int, reverse: bool, use_exp2: bool,
                             unroll: int = 8):
    wc_idx = pl.program_id(2)
    nwc = pl.num_programs(2)
    wcount = u_ref.shape[1]

    @pl.when(wc_idx == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)
        f_scr[:] = jnp.zeros_like(f_scr)

    bias = bias_ref[:]

    U = unroll if wcount % unroll == 0 else 1

    def body(wi, carry):
        # fori_loop with a manually U-unrolled body (Mosaic supports only
        # unroll=1/full in its fori lowering): keeps the program ~U steps
        # long — the relay's remote-compile rejects fully-unrolled
        # 128-step bodies (HTTP 413) — while amortizing loop overhead
        S, hs = carry
        hs = list(hs)
        for k in range(U):
            w = wi * U + k
            idx = wcount - 1 - w if reverse else w
            delta, _ = _ss_chain_step(
                u_ref[0, idx], dt_ref[0, idx], b_ref[0, idx], a_ref, bias,
                hs, n=n, dp=dp, use_exp2=use_exp2)
            S = S + delta
        return S, tuple(hs)

    hs0 = tuple(f_scr[:, i * dp: (i + 1) * dp] for i in range(n))
    S, hs = jax.lax.fori_loop(0, wcount // U, body, (s_scr[:], hs0),
                              unroll=1)
    s_scr[:] = S
    f_scr[:] = jnp.concatenate(hs, axis=1)

    @pl.when(wc_idx == nwc - 1)
    def _():
        _exp = jnp.exp2 if use_exp2 else jnp.exp
        f_ref[0, 0] = f_scr[:]
        p_ref[0, 0] = jnp.concatenate(
            [_exp(s_scr[:] * a_ref[i: i + 1]) for i in range(n)], axis=1)


def _ss_chain_main_kernel(u_ref, dt_ref, b_ref, c_ref, init_ref, a_ref,
                          dskip_ref, bias_ref, y_ref, h_scr, *, dp: int,
                          n: int, reverse: bool, use_exp2: bool,
                          unroll: int = 8):
    wc_idx = pl.program_id(2)
    wcount = u_ref.shape[1]

    @pl.when(wc_idx == 0)
    def _():
        h_scr[:] = init_ref[0, 0]

    bias = bias_ref[:]
    dskip = dskip_ref[:]

    U = unroll if wcount % unroll == 0 else 1

    def body(wi, hs):
        hs = list(hs)
        for k in range(U):
            w = wi * U + k
            idx = wcount - 1 - w if reverse else w
            _, y = _ss_chain_step(
                u_ref[0, idx], dt_ref[0, idx], b_ref[0, idx], a_ref, bias,
                hs, n=n, dp=dp, use_exp2=use_exp2, cc=c_ref[0, idx],
                dskip=dskip)
            y_ref[0, idx] = y.astype(y_ref.dtype)
        return tuple(hs)

    hs0 = tuple(h_scr[:, i * dp: (i + 1) * dp] for i in range(n))
    hs = jax.lax.fori_loop(0, wcount // U, body, hs0, unroll=1)
    h_scr[:] = jnp.concatenate(hs, axis=1)



def _chain_init_kernel(p_ref, f_ref, init_ref, c_scr, *, reverse: bool):
    """Exclusive composition of chain maps s -> P*s + F in sequence order:
    init[i] = F'[i-1] with F'[i] = P[i]*F'[i-1] + F[i] (mirrored for
    reverse). One sequential pass in VMEM — the XLA associative_scan this
    replaces cost ~2.4 ms/layer in log-depth slice/concat stages (the
    dominant 'copy' bucket of the r3 MambaIR trace)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        c_scr[:] = jnp.zeros_like(c_scr)

    carry = c_scr[:]
    rows = range(7, -1, -1) if reverse else range(8)
    for s in rows:
        init_ref[0, 0, s: s + 1] = carry
        carry = p_ref[0, 0, s: s + 1] * carry + f_ref[0, 0, s: s + 1]
    c_scr[:] = carry


def _chain_chunk(t: int, cap: int = 160) -> int:
    for wc in range(min(cap, t), 0, -1):
        if t % wc == 0:
            return wc
    return t


@functools.partial(jax.jit, static_argnames=("reverse", "use_exp2",
                                             "out_dtype", "interpret",
                                             "approx_init"))
def selective_scan_pallas_chain(u: jnp.ndarray,
                                delta: jnp.ndarray,
                                A: jnp.ndarray,
                                B: jnp.ndarray,
                                C: jnp.ndarray,
                                D: jnp.ndarray,
                                delta_bias: jnp.ndarray,
                                reverse: bool = False,
                                use_exp2: bool = True,
                                out_dtype=None,
                                interpret: bool = False,
                                approx_init: bool = False) -> jnp.ndarray:
    """Chain-parallel selective scan over the TRANSPOSED spatial layout.

    u/delta: [B, T, R, D] — R chains (R % 8 == 0) of T steps each; the
    FULL sequence is chain 0, then chain 1, ... (exact S6 semantics across
    chain boundaries via the summary pass). B/C: [B, T, R, N]; A: [D, N];
    D/delta_bias: [D]. D must be a multiple of 128 (pad 360 -> 384; padded
    tail channels with A=0, D=0, bias=0 contribute exactly zero).
    reverse=True scans the whole sequence back-to-front. Returns y
    [B, T, R, D] in ``out_dtype`` (default float32).

    approx_init=True is the flag-gated APPROXIMATE variant (VERDICT r2
    item 9): every chain starts from a ZERO state — the summary pass and
    the init composition are skipped entirely (~6 of ~15 ops/element),
    at the cost of dropping cross-chain state carry-over (each image
    row/column scans independently). Quality impact is measured, not
    assumed — see tests/test_scan_approx.py and BENCH_NOTES; ships OFF.
    """
    b, t, r, d = u.shape
    n = A.shape[-1]
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if r % 8 != 0:
        raise ValueError(f"R ({r}) must be a multiple of 8")
    if d % 128 != 0:
        raise ValueError(f"D ({d}) must be a lane multiple (pad to 128s)")
    out_dtype = out_dtype or jnp.float32
    wc = _chain_chunk(t)
    g = r // 8

    a_rows = A.astype(jnp.float32).T  # [N, Dp]
    if use_exp2:
        a_rows = a_rows * jnp.float32(1.4426950408889634)  # log2(e)
    dskip = D.astype(jnp.float32).reshape(1, d)
    bias = delta_bias.astype(jnp.float32).reshape(1, d)

    # With reverse=True the kernels reverse steps WITHIN each time chunk;
    # the grid must then visit chunks back-to-front too, or the scratch
    # state carry crosses chunk boundaries in the wrong direction
    # (wrong output whenever t > wc, i.e. t > 160 — ADVICE r3, high).
    nwc = t // wc
    if reverse:
        tmap = lambda bi, j, wi: (bi, nwc - 1 - wi, j, 0)
    else:
        tmap = lambda bi, j, wi: (bi, wi, j, 0)

    def blk(feat):
        return pl.BlockSpec((1, wc, 8, feat), tmap,
                            memory_space=pltpu.VMEM)

    def const(arr):
        return pl.BlockSpec(arr.shape,
                            lambda bi, j, wi: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    out_pf = pl.BlockSpec((1, 1, 8, d * n),
                          lambda bi, j, wi: (bi, j, 0, 0),
                          memory_space=pltpu.VMEM)

    if approx_init:
        # Gated approximation: zero chain inits, no summary/compose work.
        init = jnp.zeros((b, g, 8, d * n), jnp.float32)
    else:
        p_sum, f_sum = pl.pallas_call(
            functools.partial(_ss_chain_summary_kernel, dp=d, n=n,
                              reverse=reverse, use_exp2=use_exp2),
            grid=(b, g, t // wc),
            in_specs=[blk(d), blk(d), blk(n), const(a_rows), const(bias)],
            out_specs=[out_pf, out_pf],
            out_shape=[jax.ShapeDtypeStruct((b, g, 8, d * n), jnp.float32),
                       jax.ShapeDtypeStruct((b, g, 8, d * n), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((8, d), jnp.float32),
                            pltpu.VMEM((8, d * n), jnp.float32)],
            interpret=interpret,
        )(u, delta, B, a_rows, bias)

        # Compose chain maps s -> P*s + F across the R chains (sequence
        # order) into each chain's exclusive init — one sequential in-VMEM
        # pallas pass over the tiny [R, N*D] summaries.
        if reverse:
            seq_map = lambda bi, j: (bi, g - 1 - j, 0, 0)
        else:
            seq_map = lambda bi, j: (bi, j, 0, 0)
        pf_spec = pl.BlockSpec((1, 1, 8, d * n), seq_map,
                               memory_space=pltpu.VMEM)
        init = pl.pallas_call(
            functools.partial(_chain_init_kernel, reverse=reverse),
            grid=(b, g),
            in_specs=[pf_spec, pf_spec],
            out_specs=pf_spec,
            out_shape=jax.ShapeDtypeStruct((b, g, 8, d * n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, d * n), jnp.float32)],
            interpret=interpret,
        )(p_sum, f_sum)

    init_spec = pl.BlockSpec((1, 1, 8, d * n),
                             lambda bi, j, wi: (bi, j, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ss_chain_main_kernel, dp=d, n=n,
                          reverse=reverse, use_exp2=use_exp2),
        grid=(b, g, t // wc),
        in_specs=[blk(d), blk(d), blk(n), blk(n), init_spec,
                  const(a_rows), const(dskip), const(bias)],
        out_specs=blk(d),
        out_shape=jax.ShapeDtypeStruct((b, t, r, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((8, d * n), jnp.float32)],
        interpret=interpret,
    )(u, delta, B, C, init, a_rows, dskip, bias)


# ---------------------------------------------------------------------------
# v6: chain kernels with IN-KERNEL silu + dt/B/C projections
# ---------------------------------------------------------------------------
#
# The v5 route computes silu(xc) and the three per-direction projection
# einsums (dt_low -> dt, B, C) in XLA before the kernels. The round-3
# MambaIR trace prices that boundary at ~170 ms/img: the 132 MB activation
# is re-read once per projection (42+34+34 ms for the three einsum
# families x 144 call sites), silu costs another 57 ms of elementwise +
# layout passes, and the projected dt/B/C round-trip through HBM only to
# be re-read by BOTH scan passes. Here each kernel computes, per streamed
# [wc, 8, Dp] time block in VMEM,
#     u  = silu(xc)                          (VPU, once per block)
#     dt = (u @ Wdl) @ Wdt,  B = u @ Wb,  C = u @ Wc   (tiny MXU dots)
# so the ONLY large tensor crossing HBM is xc itself (read once per pass)
# plus the y output. The projection FLOPs are negligible next to the
# VPU-bound recurrence, and the recurrence math is byte-identical to v5
# (_ss_chain_step is shared).
#
# Semantics (reference: mambair_arch.py:339-369 via SS2D.forward_core):
#     x_dbl = einsum(silu(conv(x)), x_proj_weight)   # dt_low | B | C
#     dt    = einsum(dt_low, dt_proj_weight)
# with fp32 accumulation (preferred_element_type). The two dt matmuls
# are linear maps, so they are composed OFFLINE into one [Dp, Dp] matrix
# (exact in fp32; in bf16 the composed weight rounds once where the XLA
# route rounds dt_low once — both autocast-equivalent).


def _proj_scratch(xc_ref, wf_ref, u_scr, dt_scr, b_scr, c_scr=None, *,
                  n: int):
    """Fill the per-block u/dt/B(/C) scratches from the raw conv output.

    ONE fused MXU dot per block: the fused weight packs [W_dt_full | Wb |
    Wc] at lane-tile-aligned column offsets (0 / Dp / Dp+128), where
    W_dt_full = Wdt_low @ Wdt is the exact composition of the two dt
    projections. Separate small dots measured ~18 us fixed cost EACH on
    hardware (~85 ms/img across the block prologs); one aligned
    [T8, Dp] @ [Dp, Dp+256] dot plus tile-aligned lane slices removes
    all of it."""
    blk = xc_ref[0]                                   # [wc, 8, Dp]
    wcnt, _, dp = blk.shape
    f32 = jnp.float32
    xf = blk.astype(f32)
    u = (xf * jax.nn.sigmoid(xf)).astype(blk.dtype)   # silu, io dtype
    u_scr[:] = u
    u2 = u.reshape(wcnt * 8, dp)
    proj = jax.lax.dot_general(
        u2, wf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32)                   # [T8, Dp + 256]
    dt_scr[:] = proj[:, :dp].reshape(wcnt, 8, dp)
    b_scr[:] = proj[:, dp: dp + n].reshape(wcnt, 8, n)
    if c_scr is not None:
        c_scr[:] = proj[:, dp + 128: dp + 128 + n].reshape(wcnt, 8, n)


def _ss_chainp_summary_kernel(xc_ref, wf_ref, a_ref,
                              bias_ref, p_ref, f_ref, u_scr, dt_scr, b_scr,
                              s_scr, f_scr, *, dp: int, n: int,
                              reverse: bool, use_exp2: bool,
                              unroll: int = 8):
    wc_idx = pl.program_id(2)
    nwc = pl.num_programs(2)
    wcount = xc_ref.shape[1]

    @pl.when(wc_idx == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)
        f_scr[:] = jnp.zeros_like(f_scr)

    _proj_scratch(xc_ref, wf_ref, u_scr, dt_scr, b_scr, n=n)
    bias = bias_ref[:]

    U = unroll if wcount % unroll == 0 else 1

    def body(wi, carry):
        S, hs = carry
        hs = list(hs)
        for k in range(U):
            w = wi * U + k
            idx = wcount - 1 - w if reverse else w
            delta, _ = _ss_chain_step(
                u_scr[idx], dt_scr[idx], b_scr[idx], a_ref, bias,
                hs, n=n, dp=dp, use_exp2=use_exp2)
            S = S + delta
        return S, tuple(hs)

    hs0 = tuple(f_scr[:, i * dp: (i + 1) * dp] for i in range(n))
    S, hs = jax.lax.fori_loop(0, wcount // U, body, (s_scr[:], hs0),
                              unroll=1)
    s_scr[:] = S
    f_scr[:] = jnp.concatenate(hs, axis=1)

    @pl.when(wc_idx == nwc - 1)
    def _():
        _exp = jnp.exp2 if use_exp2 else jnp.exp
        f_ref[0, 0] = f_scr[:]
        p_ref[0, 0] = jnp.concatenate(
            [_exp(s_scr[:] * a_ref[i: i + 1]) for i in range(n)], axis=1)


def _ss_chainp_main_kernel(xc_ref, wf_ref,
                           init_ref, a_ref, dskip_ref, bias_ref, y_ref,
                           u_scr, dt_scr, b_scr, c_scr, h_scr, *, dp: int,
                           n: int, reverse: bool, use_exp2: bool,
                           unroll: int = 8):
    wc_idx = pl.program_id(2)
    wcount = xc_ref.shape[1]

    @pl.when(wc_idx == 0)
    def _():
        h_scr[:] = init_ref[0, 0]

    _proj_scratch(xc_ref, wf_ref, u_scr, dt_scr, b_scr, c_scr, n=n)
    bias = bias_ref[:]
    dskip = dskip_ref[:]

    U = unroll if wcount % unroll == 0 else 1

    def body(wi, hs):
        hs = list(hs)
        for k in range(U):
            w = wi * U + k
            idx = wcount - 1 - w if reverse else w
            _, y = _ss_chain_step(
                u_scr[idx], dt_scr[idx], b_scr[idx], a_ref, bias,
                hs, n=n, dp=dp, use_exp2=use_exp2, cc=c_scr[idx],
                dskip=dskip)
            y_ref[0, idx] = y.astype(y_ref.dtype)
        return tuple(hs)

    hs0 = tuple(h_scr[:, i * dp: (i + 1) * dp] for i in range(n))
    hs = jax.lax.fori_loop(0, wcount // U, body, hs0, unroll=1)
    h_scr[:] = jnp.concatenate(hs, axis=1)


@functools.partial(jax.jit, static_argnames=("reverse", "use_exp2",
                                             "out_dtype", "interpret",
                                             "approx_init"))
def selective_scan_pallas_chain_proj(xc: jnp.ndarray,
                                     x_proj_w: jnp.ndarray,
                                     dt_proj_w: jnp.ndarray,
                                     A: jnp.ndarray,
                                     D: jnp.ndarray,
                                     delta_bias: jnp.ndarray,
                                     reverse: bool = False,
                                     use_exp2: bool = True,
                                     out_dtype=None,
                                     interpret: bool = False,
                                     approx_init: bool = False
                                     ) -> jnp.ndarray:
    """Chain-parallel selective scan with IN-KERNEL silu + projections.

    xc: [B, T, R, Dp] — the raw depthwise-conv output (PRE-activation;
    silu is applied in-kernel). x_proj_w: [dt_rank + 2N, Dp] (one
    direction's slice of SS2D's x_proj_weight, input dim pre-padded to
    Dp); dt_proj_w: [Dp, dt_rank]. A: [Dp, N]; D/delta_bias: [Dp].
    Layout/chunking/semantics otherwise identical to
    ``selective_scan_pallas_chain`` (R % 8 == 0, Dp % 128 == 0, exact
    cross-chain S6 seeding via the summary + compose passes,
    approx_init gated the same way).
    """
    b, t, r, d = xc.shape
    n = A.shape[-1]
    dtr = x_proj_w.shape[0] - 2 * n
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if r % 8 != 0:
        raise ValueError(f"R ({r}) must be a multiple of 8")
    if d % 128 != 0:
        raise ValueError(f"D ({d}) must be a lane multiple (pad to 128s)")
    out_dtype = out_dtype or jnp.float32
    wc = _chain_chunk(t)
    g = r // 8

    a_rows = A.astype(jnp.float32).T  # [N, Dp]
    if use_exp2:
        a_rows = a_rows * jnp.float32(1.4426950408889634)  # log2(e)
    dskip = D.astype(jnp.float32).reshape(1, d)
    bias = delta_bias.astype(jnp.float32).reshape(1, d)
    if n > 128 or dtr > d:
        raise ValueError(f"N ({n}) must be <= 128 and dt_rank <= D")
    # ONE fused weight for the in-kernel MXU dot, [Dp, Dp + 256]:
    # cols [0, Dp)         W_dt_full = Wdt_low @ Wdt (exact composition
    #                      of the two dt projections, fp32)
    # cols [Dp, Dp+128)    Wb zero-padded to a lane tile
    # cols [Dp+128, ...)   Wc zero-padded to a lane tile
    # so every in-kernel slice of the dot output is lane-tile-aligned.
    # Cast to the compute dtype (fp32 stays fp32 — the interpret/parity
    # path is exact; bf16 runs match the XLA route's autocast boundary).
    wdt_full = x_proj_w[:dtr].astype(jnp.float32).T @ \
        dt_proj_w.astype(jnp.float32).T                  # [Dp, Dp]
    wb = jnp.pad(x_proj_w[dtr: dtr + n].astype(jnp.float32).T,
                 [(0, 0), (0, 128 - n)])                 # [Dp, 128]
    wcw = jnp.pad(x_proj_w[dtr + n:].astype(jnp.float32).T,
                  [(0, 0), (0, 128 - n)])                # [Dp, 128]
    wf = jnp.concatenate([wdt_full, wb, wcw], axis=1).astype(xc.dtype)

    # Reverse chunk-grid order when reverse=True — same multi-chunk carry
    # fix as selective_scan_pallas_chain (ADVICE r3, high).
    nwc = t // wc
    if reverse:
        tmap = lambda bi, j, wi: (bi, nwc - 1 - wi, j, 0)
    else:
        tmap = lambda bi, j, wi: (bi, wi, j, 0)

    def blk(feat):
        return pl.BlockSpec((1, wc, 8, feat), tmap,
                            memory_space=pltpu.VMEM)

    def const(arr):
        return pl.BlockSpec(arr.shape,
                            lambda bi, j, wi: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    out_pf = pl.BlockSpec((1, 1, 8, d * n),
                          lambda bi, j, wi: (bi, j, 0, 0),
                          memory_space=pltpu.VMEM)
    proj_scratch = [pltpu.VMEM((wc, 8, d), xc.dtype),        # u
                    pltpu.VMEM((wc, 8, d), jnp.float32),     # dt
                    pltpu.VMEM((wc, 8, n), jnp.float32)]     # B

    if approx_init:
        init = jnp.zeros((b, g, 8, d * n), jnp.float32)
    else:
        p_sum, f_sum = pl.pallas_call(
            functools.partial(_ss_chainp_summary_kernel, dp=d, n=n,
                              reverse=reverse, use_exp2=use_exp2),
            grid=(b, g, t // wc),
            in_specs=[blk(d), const(wf), const(a_rows), const(bias)],
            out_specs=[out_pf, out_pf],
            out_shape=[jax.ShapeDtypeStruct((b, g, 8, d * n), jnp.float32),
                       jax.ShapeDtypeStruct((b, g, 8, d * n), jnp.float32)],
            scratch_shapes=proj_scratch + [
                pltpu.VMEM((8, d), jnp.float32),
                pltpu.VMEM((8, d * n), jnp.float32)],
            interpret=interpret,
        )(xc, wf, a_rows, bias)

        if reverse:
            seq_map = lambda bi, j: (bi, g - 1 - j, 0, 0)
        else:
            seq_map = lambda bi, j: (bi, j, 0, 0)
        pf_spec = pl.BlockSpec((1, 1, 8, d * n), seq_map,
                               memory_space=pltpu.VMEM)
        init = pl.pallas_call(
            functools.partial(_chain_init_kernel, reverse=reverse),
            grid=(b, g),
            in_specs=[pf_spec, pf_spec],
            out_specs=pf_spec,
            out_shape=jax.ShapeDtypeStruct((b, g, 8, d * n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, d * n), jnp.float32)],
            interpret=interpret,
        )(p_sum, f_sum)

    init_spec = pl.BlockSpec((1, 1, 8, d * n),
                             lambda bi, j, wi: (bi, j, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ss_chainp_main_kernel, dp=d, n=n,
                          reverse=reverse, use_exp2=use_exp2),
        grid=(b, g, t // wc),
        in_specs=[blk(d), const(wf),
                  init_spec, const(a_rows), const(dskip), const(bias)],
        out_specs=blk(d),
        out_shape=jax.ShapeDtypeStruct((b, t, r, d), out_dtype),
        scratch_shapes=proj_scratch + [
            pltpu.VMEM((wc, 8, n), jnp.float32),             # C
            pltpu.VMEM((8, d * n), jnp.float32)],            # h
        interpret=interpret,
    )(xc, wf, init, a_rows, dskip, bias)


# ---------------------------------------------------------------------------
# v7: single-dispatch fused chain scan (strips resident, correction pass)
# ---------------------------------------------------------------------------
#
# v6 still runs three pallas dispatches per direction (summary, compose,
# main), re-reads xc and re-runs the silu+projection prologue in both
# sweep kernels, and round-trips the per-chain (P, F) summaries and inits
# through HBM. v7 collapses everything into ONE kernel per direction:
# the grid is (B, R/8) and each step owns a whole 8-chain group. xc and y
# live in ANY (HBM) and move via explicit DMA; the prologue runs ONCE,
# materializing u / delta(post-softplus) / B / C strips for the full
# [T, 8] group in VMEM (~12 MB at T=512, Dp=384, N=16).
#
# The exact cross-chain seeding also gets cheaper. By linearity of
#     h_t = a_t h_{t-1} + b_t
# the seeded solution is  h_t = h0_t + (prod_{s<=t} a_s) * init,  so:
#   sweep 1: zero-init recurrence -> y0 strip, final states F, sum-of-
#            delta S (P = exp(A*S) by telescoping);
#   compose: sequential over the 8 rows with the cross-group carry
#            (carried in scratch across grid steps) -> per-chain init;
#   sweep 2: the HOMOGENEOUS recurrence z_t = a_t z_{t-1}, z_0 = init,
#            adding C_t . z_t into the y strip — no b_t build, no du,
#            ~2 fewer VPU ops per state element than re-scanning.
# Sweep 2 reuses the SAME stored delta as sweep 1, so the decomposition
# is deterministic; in fp32 it matches the seeded recurrence to ulp
# (pinned against v5/v6 by test_pallas_scan.py).


def _ss_chainf_step(u_w, delta, bb, cc, a_ref, hs, dskip, *, n: int,
                    use_exp2: bool):
    """One zero-init/main step over 8 chains: advances ``hs`` and returns
    y. All inputs already in fp32 except u_w/bb/cc (io dtype)."""
    _exp = jnp.exp2 if use_exp2 else jnp.exp
    u_w = u_w.astype(jnp.float32)
    du = delta * u_w
    bb = bb.astype(jnp.float32)
    y = u_w * dskip
    for i in range(n):
        a_i = _exp(delta * a_ref[i: i + 1])
        hs[i] = a_i * hs[i] + du * jnp.broadcast_to(bb[:, i: i + 1], du.shape)
        y = y + hs[i] * jnp.broadcast_to(
            cc[:, i: i + 1].astype(jnp.float32), du.shape)
    return y


def _ss_chain_fused_kernel(xc_hbm, wf_ref, a_ref, dskip_ref, bias_ref,
                           y_hbm, xbuf, u_scr, d_scr, b_scr, c_scr,
                           y_scr, f_scr, z_scr, carry_scr,
                           in_sem, out_sem, *, dp: int, n: int, wc: int,
                           reverse: bool, use_exp2: bool,
                           approx_init: bool, unroll: int = 8):
    bi = pl.program_id(0)
    j = pl.program_id(1)
    g = pl.num_programs(1)
    t = u_scr.shape[0]
    f32 = jnp.float32
    _exp = jnp.exp2 if use_exp2 else jnp.exp
    row_sl = pl.ds((g - 1 - j if reverse else j) * 8, 8)

    @pl.when(j == 0)
    def _():
        carry_scr[:] = jnp.zeros_like(carry_scr)

    bias = bias_ref[:]
    dskip = dskip_ref[:]

    # ---- prologue: DMA xc chunks; u / delta / B / C strips in VMEM ----
    for ci in range(t // wc):
        cp = pltpu.make_async_copy(
            xc_hbm.at[bi, pl.ds(ci * wc, wc), row_sl, :], xbuf, in_sem)
        cp.start()
        cp.wait()
        xf = xbuf[:].astype(f32)
        u = xf * jax.nn.sigmoid(xf)
        sl = pl.ds(ci * wc, wc)
        u_scr[sl] = u.astype(u_scr.dtype)
        proj = jax.lax.dot_general(
            u.astype(xbuf.dtype).reshape(wc * 8, dp), wf_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=f32)
        d_scr[sl] = jax.nn.softplus(
            proj[:, :dp] + bias).reshape(wc, 8, dp).astype(d_scr.dtype)
        b_scr[sl] = proj[:, dp: dp + n].reshape(wc, 8, n).astype(b_scr.dtype)
        c_scr[sl] = proj[:, dp + 128: dp + 128 + n].reshape(
            wc, 8, n).astype(c_scr.dtype)

    U = unroll if t % unroll == 0 else 1

    # ---- sweep 1: zero-init recurrence; y0, F, S ----
    def body1(wi, carry):
        S, hs = carry
        hs = list(hs)
        for k in range(U):
            w = wi * U + k
            idx = t - 1 - w if reverse else w
            delta = d_scr[idx].astype(f32)
            y = _ss_chainf_step(u_scr[idx], delta, b_scr[idx], c_scr[idx],
                                a_ref, hs, dskip, n=n, use_exp2=use_exp2)
            y_scr[idx] = y.astype(y_scr.dtype)
            S = S + delta
        return S, tuple(hs)

    hs0 = tuple(jnp.zeros((8, dp), f32) for _ in range(n))
    S, hs = jax.lax.fori_loop(0, t // U, body1,
                              (jnp.zeros((8, dp), f32), hs0), unroll=1)
    f_scr[:] = jnp.concatenate(hs, axis=1)

    if not approx_init:
        # ---- compose: P = exp(A*S) rows x carry -> per-chain inits ----
        p_rows = jnp.concatenate(
            [_exp(S * a_ref[i: i + 1]) for i in range(n)], axis=1)
        carry = carry_scr[:]
        rows = range(7, -1, -1) if reverse else range(8)
        for s in rows:
            z_scr[s: s + 1] = carry
            carry = p_rows[s: s + 1] * carry + f_scr[s: s + 1]
        carry_scr[:] = carry

        # ---- sweep 2: homogeneous recurrence from the inits ----
        def body2(wi, zs):
            zs = list(zs)
            for k in range(U):
                w = wi * U + k
                idx = t - 1 - w if reverse else w
                delta = d_scr[idx].astype(f32)
                cc = c_scr[idx]
                y = y_scr[idx].astype(f32)
                for i in range(n):
                    zs[i] = _exp(delta * a_ref[i: i + 1]) * zs[i]
                    y = y + zs[i] * jnp.broadcast_to(
                        cc[:, i: i + 1].astype(f32), zs[i].shape)
                y_scr[idx] = y.astype(y_scr.dtype)
            return tuple(zs)

        zs0 = tuple(z_scr[:, i * dp: (i + 1) * dp] for i in range(n))
        jax.lax.fori_loop(0, t // U, body2, zs0, unroll=1)

    cpo = pltpu.make_async_copy(
        y_scr, y_hbm.at[bi, :, row_sl, :], out_sem)
    cpo.start()
    cpo.wait()


@functools.partial(jax.jit, static_argnames=("reverse", "use_exp2",
                                             "out_dtype", "interpret",
                                             "approx_init"))
def selective_scan_pallas_chain_fused(xc: jnp.ndarray,
                                      x_proj_w: jnp.ndarray,
                                      dt_proj_w: jnp.ndarray,
                                      A: jnp.ndarray,
                                      D: jnp.ndarray,
                                      delta_bias: jnp.ndarray,
                                      reverse: bool = False,
                                      use_exp2: bool = True,
                                      out_dtype=None,
                                      interpret: bool = False,
                                      approx_init: bool = False
                                      ) -> jnp.ndarray:
    """v7 fused chain scan — one pallas dispatch per direction.

    Same contract as ``selective_scan_pallas_chain_proj`` (xc is the raw
    PRE-silu conv output [B, T, R, Dp]; projections happen in-kernel).
    Additional constraint: the whole [T, 8] group's u/delta/B/C/y strips
    must fit VMEM — use :func:`chain_fused_fits` before routing here.
    """
    b, t, r, d = xc.shape
    n = A.shape[-1]
    dtr = x_proj_w.shape[0] - 2 * n
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if r % 8 != 0:
        raise ValueError(f"R ({r}) must be a multiple of 8")
    if d % 128 != 0:
        raise ValueError(f"D ({d}) must be a lane multiple (pad to 128s)")
    if n > 128 or dtr > d:
        raise ValueError(f"N ({n}) must be <= 128 and dt_rank <= D")
    out_dtype = out_dtype or jnp.float32
    wc = _chain_chunk(t)
    g = r // 8

    a_rows = A.astype(jnp.float32).T  # [N, Dp]
    if use_exp2:
        a_rows = a_rows * jnp.float32(1.4426950408889634)
    dskip = D.astype(jnp.float32).reshape(1, d)
    bias = delta_bias.astype(jnp.float32).reshape(1, d)
    wdt_full = x_proj_w[:dtr].astype(jnp.float32).T @ \
        dt_proj_w.astype(jnp.float32).T
    wb = jnp.pad(x_proj_w[dtr: dtr + n].astype(jnp.float32).T,
                 [(0, 0), (0, 128 - n)])
    wcw = jnp.pad(x_proj_w[dtr + n:].astype(jnp.float32).T,
                  [(0, 0), (0, 128 - n)])
    wf = jnp.concatenate([wdt_full, wb, wcw], axis=1).astype(xc.dtype)

    def const(arr):
        return pl.BlockSpec(arr.shape, lambda bi, j: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    io = xc.dtype
    return pl.pallas_call(
        functools.partial(_ss_chain_fused_kernel, dp=d, n=n, wc=wc,
                          reverse=reverse, use_exp2=use_exp2,
                          approx_init=approx_init),
        grid=(b, g),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), const(wf),
                  const(a_rows), const(dskip), const(bias)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, t, r, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((wc, 8, d), io),            # xbuf (DMA chunk)
            pltpu.VMEM((t, 8, d), io),             # u
            pltpu.VMEM((t, 8, d), io),             # delta (post-softplus)
            pltpu.VMEM((t, 8, n), io),             # B
            pltpu.VMEM((t, 8, n), io),             # C
            pltpu.VMEM((t, 8, d), out_dtype),      # y strip
            pltpu.VMEM((8, d * n), jnp.float32),   # F
            pltpu.VMEM((8, d * n), jnp.float32),   # z inits
            pltpu.VMEM((1, d * n), jnp.float32),   # cross-group carry
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xc, wf, a_rows, dskip, bias)


def chain_fused_fits(t: int, d: int, n: int, itemsize: int = 2,
                     out_itemsize: int = 2,
                     budget: int = 13 * 1024 * 1024) -> bool:
    """Whether the v7 resident strips fit the VMEM budget (16 MB/core on
    v5e, minus weights/temporaries headroom)."""
    strips = t * 8 * d * (2 * itemsize + out_itemsize)   # u, delta, y
    strips += 2 * t * 8 * max(n, 128) * itemsize          # B, C (lane pad)
    strips += _chain_chunk(t) * 8 * d * itemsize          # xbuf
    strips += 3 * 8 * d * n * 4 + d * (d + 256) * itemsize
    return strips <= budget
