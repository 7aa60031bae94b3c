"""Pallas selective-scan kernel vs the XLA chunked scan (interpret mode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.ops.selective_scan import (  # noqa: E402
    selective_scan, selective_scan_pallas,
)


@pytest.mark.parametrize("l,chunk", [(100, 16), (64, 64), (130, 32)])
def test_pallas_scan_matches_xla(l, chunk):
    rng = np.random.default_rng(0)
    b, d, n = 2, 12, 4
    u = rng.normal(size=(b, l, d)).astype(np.float32)
    dt = rng.normal(size=(b, l, d)).astype(np.float32) * 0.5
    A = -np.exp(rng.normal(size=(d, n)).astype(np.float32) * 0.3)
    B = rng.normal(size=(b, l, n)).astype(np.float32)
    C = rng.normal(size=(b, l, n)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    bias = rng.normal(size=(d,)).astype(np.float32)

    y_ref = selective_scan(jnp.asarray(u), jnp.asarray(dt), jnp.asarray(A),
                           jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
                           delta_bias=jnp.asarray(bias), chunk=32)
    y = selective_scan_pallas(jnp.asarray(u), jnp.asarray(dt), jnp.asarray(A),
                              jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
                              jnp.asarray(bias), chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)


def test_selective_scan_pallas_dirs_matches_xla():
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan, selective_scan_pallas_dirs)

    rng = np.random.default_rng(3)
    k, b, l, d, n = 4, 2, 200, 24, 4
    u = rng.normal(size=(k, b, l, d)).astype(np.float32)
    dt = (rng.normal(size=(k, b, l, d)) * 0.5).astype(np.float32)
    A = -np.exp(rng.uniform(0, 2.7, (k, d, n))).astype(np.float32)
    B = rng.normal(size=(k, b, l, n)).astype(np.float32)
    C = rng.normal(size=(k, b, l, n)).astype(np.float32)
    D = rng.normal(size=(k, d)).astype(np.float32)
    bias = (rng.normal(size=(k, d)) * 0.2).astype(np.float32)

    got = selective_scan_pallas_dirs(
        *map(jnp.asarray, (u, dt, A, B, C, D, bias)),
        chunk=64, inner=8, interpret=True)
    for ki in range(k):
        ref = selective_scan(
            jnp.asarray(u[ki]), jnp.asarray(dt[ki]), jnp.asarray(A[ki]),
            jnp.asarray(B[ki]), jnp.asarray(C[ki]), jnp.asarray(D[ki]),
            delta_bias=jnp.asarray(bias[ki]), chunk=64)
        np.testing.assert_allclose(np.asarray(got[ki]), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_selective_scan_pallas_bidir_matches_flipped_scan():
    """Backward kernel over natural order == forward scan over flipped
    sequences (then un-flipped), the SS2D dirs-2/3 semantics."""
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan, selective_scan_pallas_bidir)

    rng = np.random.default_rng(7)
    b, l, d, n = 2, 200, 24, 4
    u = rng.normal(size=(2, b, l, d)).astype(np.float32)
    dt = (rng.normal(size=(4, b, l, d)) * 0.5).astype(np.float32)
    A = -np.exp(rng.uniform(0, 2.7, (4, d, n))).astype(np.float32)
    B = rng.normal(size=(4, b, l, n)).astype(np.float32)
    C = rng.normal(size=(4, b, l, n)).astype(np.float32)
    D = rng.normal(size=(4, d)).astype(np.float32)
    bias = (rng.normal(size=(4, d)) * 0.2).astype(np.float32)

    y_fwd, y_bwd = selective_scan_pallas_bidir(
        *map(jnp.asarray, (u, dt, A, B, C, D, bias)),
        chunk=64, inner=8, interpret=True)

    for i in range(2):
        ref = selective_scan(
            jnp.asarray(u[i]), jnp.asarray(dt[i]), jnp.asarray(A[i]),
            jnp.asarray(B[i]), jnp.asarray(C[i]), jnp.asarray(D[i]),
            delta_bias=jnp.asarray(bias[i]), chunk=64)
        np.testing.assert_allclose(np.asarray(y_fwd[i]), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
        # dirs 2/3: flip inputs, forward scan, flip output back
        kd = 2 + i
        ref_b = selective_scan(
            jnp.asarray(u[i][:, ::-1]), jnp.asarray(dt[kd][:, ::-1]),
            jnp.asarray(A[kd]), jnp.asarray(B[kd][:, ::-1]),
            jnp.asarray(C[kd][:, ::-1]), jnp.asarray(D[kd]),
            delta_bias=jnp.asarray(bias[kd]), chunk=64)[:, ::-1]
        np.testing.assert_allclose(np.asarray(y_bwd[i]), np.asarray(ref_b),
                                   atol=2e-5, rtol=1e-4)


def test_selective_scan_pallas_dirs_rejects_bad_inner():
    from freqfusion_tpu.ops.selective_scan import selective_scan_pallas_dirs

    z = jnp.zeros((1, 1, 8, 4), jnp.float32)
    zn = jnp.zeros((1, 1, 8, 2), jnp.float32)
    with pytest.raises(ValueError):
        selective_scan_pallas_dirs(
            z, z, jnp.zeros((1, 4, 2)), zn, zn, jnp.zeros((1, 4)),
            jnp.zeros((1, 4)), chunk=6, inner=4, interpret=True)


def test_selective_scan_pallas_spatial_matches_flat():
    """Spatial-direct kernel (rows read straight from the NHWC layout)
    == flat-sequence scan, forward and reverse."""
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan, selective_scan_pallas_spatial)

    rng = np.random.default_rng(11)
    b, r, t, d, n = 2, 5, 24, 12, 4
    l = r * t
    u = rng.normal(size=(b, r, t, d)).astype(np.float32)
    dt = (rng.normal(size=(b, r, t, d)) * 0.5).astype(np.float32)
    A = -np.exp(rng.uniform(0, 2.7, (d, n))).astype(np.float32)
    B = rng.normal(size=(b, r, t, n)).astype(np.float32)
    C = rng.normal(size=(b, r, t, n)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    bias = (rng.normal(size=(d,)) * 0.2).astype(np.float32)

    flat = lambda x: x.reshape(b, l, x.shape[-1])
    ref_f = selective_scan(
        jnp.asarray(flat(u)), jnp.asarray(flat(dt)), jnp.asarray(A),
        jnp.asarray(B.reshape(b, l, n)), jnp.asarray(C.reshape(b, l, n)),
        jnp.asarray(D), delta_bias=jnp.asarray(bias), chunk=32)
    got_f = selective_scan_pallas_spatial(
        *map(jnp.asarray, (u, dt, A, B, C, D, bias)), interpret=True)
    np.testing.assert_allclose(np.asarray(got_f).reshape(b, l, d),
                               np.asarray(ref_f), atol=2e-5, rtol=1e-4)

    # reverse: flip the flat sequence, scan, flip back
    rev = lambda x: x.reshape(b, l, x.shape[-1])[:, ::-1]
    ref_b = selective_scan(
        jnp.asarray(rev(u)), jnp.asarray(rev(dt)), jnp.asarray(A),
        jnp.asarray(rev(B)), jnp.asarray(rev(C)),
        jnp.asarray(D), delta_bias=jnp.asarray(bias), chunk=32)[:, ::-1]
    got_b = selective_scan_pallas_spatial(
        *map(jnp.asarray, (u, dt, A, B, C, D, bias)),
        reverse=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_b).reshape(b, l, d),
                               np.asarray(ref_b), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("t,r", [(32, 16), (24, 8)])
def test_selective_scan_pallas_chain_matches_flat(t, r, reverse):
    """Chain-parallel v5 kernel (transposed layout, summary + main pass)
    vs the XLA scan over the flattened chain-order sequence."""
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan, selective_scan_pallas_chain)

    rng = np.random.default_rng(7)
    b, d, n = 2, 128, 4
    u = rng.normal(size=(b, t, r, d)).astype(np.float32)
    dt = (rng.normal(size=(b, t, r, d)) * 0.3).astype(np.float32)
    A = -np.exp(rng.uniform(0, 2.7, (d, n))).astype(np.float32)
    B = rng.normal(size=(b, t, r, n)).astype(np.float32)
    C = rng.normal(size=(b, t, r, n)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    bias = (rng.normal(size=(d,)) * 0.1).astype(np.float32)

    def to_seq(x):
        return jnp.asarray(x).transpose(0, 2, 1, 3).reshape(
            b, r * t, x.shape[-1])

    sl = slice(None, None, -1) if reverse else slice(None)
    ref = selective_scan(to_seq(u)[:, sl], to_seq(dt)[:, sl], jnp.asarray(A),
                         to_seq(B)[:, sl], to_seq(C)[:, sl], jnp.asarray(D),
                         delta_bias=jnp.asarray(bias), chunk=32)[:, sl]
    ref = np.asarray(ref).reshape(b, r, t, d).transpose(0, 2, 1, 3)

    got = selective_scan_pallas_chain(
        jnp.asarray(u), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(D), jnp.asarray(bias), reverse=reverse,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=2e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_selective_scan_pallas_chain_multichunk(reverse):
    """Multi-time-chunk regression (ADVICE r3, high): at t=162 the chain
    kernels split time into 2 chunks of wc=81; with reverse=True the
    chunk grid must ALSO run back-to-front or the scratch state carry
    crosses the chunk boundary in the wrong direction. Pins both v5 and
    the v6 in-kernel-projection route against the XLA flat scan."""
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan, selective_scan_pallas_chain,
        selective_scan_pallas_chain_proj, _chain_chunk)

    t, r, b, d, n, dtr = 162, 8, 1, 128, 2, 8
    assert t // _chain_chunk(t) > 1  # the regression needs >= 2 chunks
    rng = np.random.default_rng(41)
    u = rng.normal(size=(b, t, r, d)).astype(np.float32)
    dt = (rng.normal(size=(b, t, r, d)) * 0.3).astype(np.float32)
    A = -np.exp(rng.uniform(0, 2.7, (d, n))).astype(np.float32)
    B = rng.normal(size=(b, t, r, n)).astype(np.float32)
    C = rng.normal(size=(b, t, r, n)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    bias = (rng.normal(size=(d,)) * 0.1).astype(np.float32)

    def to_seq(x):
        return jnp.asarray(x).transpose(0, 2, 1, 3).reshape(
            b, r * t, x.shape[-1])

    sl = slice(None, None, -1) if reverse else slice(None)
    ref = selective_scan(to_seq(u)[:, sl], to_seq(dt)[:, sl], jnp.asarray(A),
                         to_seq(B)[:, sl], to_seq(C)[:, sl], jnp.asarray(D),
                         delta_bias=jnp.asarray(bias), chunk=27)[:, sl]
    ref = np.asarray(ref).reshape(b, r, t, d).transpose(0, 2, 1, 3)

    got = selective_scan_pallas_chain(
        jnp.asarray(u), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(D), jnp.asarray(bias), reverse=reverse,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5, rtol=2e-5)

    # v6 route: build an xc whose in-kernel silu+projection reproduces the
    # same u/dt/B/C is impossible in general, so pin v6 directly against
    # the XLA reference computed from ITS xc-derived operands.
    xc = rng.normal(size=(b, t, r, d)).astype(np.float32)
    xpw = (rng.normal(size=(dtr + 2 * n, d)) * 0.2).astype(np.float32)
    dtw = (rng.normal(size=(d, dtr)) * 0.2).astype(np.float32)
    uu = jax.nn.silu(jnp.asarray(xc))
    dbl = jnp.einsum("btrd,kd->btrk", uu, jnp.asarray(xpw))
    dt6 = jnp.einsum("btrk,dk->btrd", dbl[..., :dtr], jnp.asarray(dtw))
    b6, c6 = dbl[..., dtr:dtr + n], dbl[..., dtr + n:]
    ref6 = selective_scan(to_seq(uu)[:, sl], to_seq(dt6)[:, sl],
                          jnp.asarray(A), to_seq(b6)[:, sl],
                          to_seq(c6)[:, sl], jnp.asarray(D),
                          delta_bias=jnp.asarray(bias), chunk=27)[:, sl]
    ref6 = np.asarray(ref6).reshape(b, r, t, d).transpose(0, 2, 1, 3)
    got6 = selective_scan_pallas_chain_proj(
        jnp.asarray(xc), jnp.asarray(xpw), jnp.asarray(dtw), jnp.asarray(A),
        jnp.asarray(D), jnp.asarray(bias), reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(got6), ref6, atol=5e-5, rtol=2e-5)


def test_selective_scan_pallas_chain_padded_tail_is_zero():
    """Zero-padded channels (A=D=bias=0) must contribute exactly zero and
    leave the real channels untouched (the 360->384 lane-alignment pad)."""
    from freqfusion_tpu.ops.selective_scan import selective_scan_pallas_chain

    rng = np.random.default_rng(8)
    b, t, r, d, n, pad = 1, 16, 8, 128, 4, 128
    u = rng.normal(size=(b, t, r, d)).astype(np.float32)
    dt = (rng.normal(size=(b, t, r, d)) * 0.3).astype(np.float32)
    A = -np.exp(rng.uniform(0, 2.7, (d, n))).astype(np.float32)
    B = rng.normal(size=(b, t, r, n)).astype(np.float32)
    C = rng.normal(size=(b, t, r, n)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    bias = (rng.normal(size=(d,)) * 0.1).astype(np.float32)

    base = selective_scan_pallas_chain(
        jnp.asarray(u), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(D), jnp.asarray(bias), interpret=True)

    pad_l = [(0, 0)] * 3 + [(0, pad)]
    got = selective_scan_pallas_chain(
        jnp.asarray(np.pad(u, pad_l)), jnp.asarray(np.pad(dt, pad_l)),
        jnp.asarray(np.pad(A, [(0, pad), (0, 0)])), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(np.pad(D, [(0, pad)])),
        jnp.asarray(np.pad(bias, [(0, pad)])), interpret=True)
    np.testing.assert_allclose(np.asarray(got[..., :d]), np.asarray(base),
                               atol=1e-6)
    assert float(jnp.abs(got[..., d:]).max()) == 0.0


@pytest.mark.parametrize("reverse", [False, True])
def test_selective_scan_pallas_chain_approx_is_per_chain(reverse):
    """approx_init=True == every chain scanned INDEPENDENTLY from a zero
    state (the gated approximation: summary/compose skipped). Pinned
    against the XLA scan run chain-by-chain."""
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan, selective_scan_pallas_chain)

    rng = np.random.default_rng(11)
    b, t, r, d, n = 2, 16, 16, 128, 4
    u = rng.normal(size=(b, t, r, d)).astype(np.float32)
    dt = (rng.normal(size=(b, t, r, d)) * 0.3).astype(np.float32)
    A = -np.exp(rng.uniform(0, 2.7, (d, n))).astype(np.float32)
    B = rng.normal(size=(b, t, r, n)).astype(np.float32)
    C = rng.normal(size=(b, t, r, n)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    bias = (rng.normal(size=(d,)) * 0.1).astype(np.float32)

    # reference: each chain ri is its own zero-init sequence of length t
    def per_chain(x):  # [B, T, R, F] -> [B*R, T, F]
        return jnp.asarray(x).transpose(0, 2, 1, 3).reshape(
            b * r, t, x.shape[-1])

    sl = slice(None, None, -1) if reverse else slice(None)
    ref = selective_scan(per_chain(u)[:, sl], per_chain(dt)[:, sl],
                         jnp.asarray(A), per_chain(B)[:, sl],
                         per_chain(C)[:, sl], jnp.asarray(D),
                         delta_bias=jnp.asarray(bias), chunk=16)[:, sl]
    ref = np.asarray(ref).reshape(b, r, t, d).transpose(0, 2, 1, 3)

    got = selective_scan_pallas_chain(
        jnp.asarray(u), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(D), jnp.asarray(bias), reverse=reverse,
        interpret=True, approx_init=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=2e-5)

    # and it must DIFFER from the exact route (chains are coupled there)
    exact = selective_scan_pallas_chain(
        jnp.asarray(u), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(D), jnp.asarray(bias), reverse=reverse,
        interpret=True)
    assert float(jnp.abs(exact - got).max()) > 1e-4


def test_selective_scan_pallas_chain_validates_shapes():
    from freqfusion_tpu.ops.selective_scan import selective_scan_pallas_chain

    z = jnp.zeros((1, 8, 12, 128))  # R=12 not a multiple of 8
    zn = jnp.zeros((1, 8, 12, 4))
    with pytest.raises(ValueError):
        selective_scan_pallas_chain(z, z, jnp.zeros((128, 4)), zn, zn,
                                    jnp.zeros(128), jnp.zeros(128),
                                    interpret=True)
    z = jnp.zeros((1, 8, 16, 120))  # D not a lane multiple
    zn = jnp.zeros((1, 8, 16, 4))
    with pytest.raises(ValueError):
        selective_scan_pallas_chain(z, z, jnp.zeros((120, 4)), zn, zn,
                                    jnp.zeros(120), jnp.zeros(120),
                                    interpret=True)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("approx", [False, True])
def test_selective_scan_pallas_chain_proj_matches_v5(reverse, approx):
    """v6 (in-kernel silu + dt/B/C projections) == silu + explicit
    projection einsums + the v5 chain kernel, for both exact and
    approx-init routes. The recurrence math is shared (_ss_chain_step);
    this pins the in-kernel projection algebra (reference semantics:
    mambair_arch.py:339-369 x_dbl/dt_projs)."""
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan_pallas_chain, selective_scan_pallas_chain_proj)

    rng = np.random.default_rng(13)
    b, t, r, d, n, dtr = 1, 24, 16, 128, 4, 4
    xc = jnp.asarray(rng.normal(size=(b, t, r, d)).astype(np.float32))
    xpw = jnp.asarray((rng.normal(size=(dtr + 2 * n, d)) * 0.1
                       ).astype(np.float32))
    dtw = jnp.asarray((rng.normal(size=(d, dtr)) * 0.1).astype(np.float32))
    A = -jnp.exp(jnp.asarray(
        (rng.normal(size=(d, n)) * 0.3).astype(np.float32)))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(d,)) * 0.1).astype(np.float32))

    u = jax.nn.silu(xc)
    dt_low = jnp.einsum("btrd,cd->btrc", u, xpw[:dtr],
                        preferred_element_type=jnp.float32)
    dt = jnp.einsum("btrc,dc->btrd", dt_low, dtw,
                    preferred_element_type=jnp.float32).astype(u.dtype)
    B = jnp.einsum("btrd,cd->btrc", u, xpw[dtr: dtr + n],
                   preferred_element_type=jnp.float32).astype(u.dtype)
    C = jnp.einsum("btrd,cd->btrc", u, xpw[dtr + n:],
                   preferred_element_type=jnp.float32).astype(u.dtype)
    ref = selective_scan_pallas_chain(u, dt, A, B, C, D, bias,
                                      reverse=reverse, interpret=True,
                                      approx_init=approx)
    got = selective_scan_pallas_chain_proj(xc, xpw, dtw, A, D, bias,
                                           reverse=reverse, interpret=True,
                                           approx_init=approx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("approx", [False, True])
def test_selective_scan_pallas_chain_fused_midsize_T_matches_flat(
        reverse, approx):
    """v7 at production-like chunking (VERDICT r4 weak #3): T=384 splits
    into 3 chunks of wc=128 — same wc as the production T=512 regime —
    with multi-group R=16 (cross-group carry) pinned directly against
    the XLA flat scan, both directions, both init routes. The r3 reverse
    bug was a chunk-grid-order error invisible at the toy T<=32 shapes;
    this is the shape class that would have caught it for v7's strip-DMA
    + zero-init/homogeneous-correction compose."""
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan, selective_scan_pallas_chain_fused, _chain_chunk)

    b, t, r, d, n, dtr = 1, 384, 16, 128, 4, 8
    assert t // _chain_chunk(t) >= 3       # genuinely multi-chunk
    rng = np.random.default_rng(23)
    xc = jnp.asarray(rng.normal(size=(b, t, r, d)).astype(np.float32))
    xpw = jnp.asarray((rng.normal(size=(dtr + 2 * n, d)) * 0.1
                       ).astype(np.float32))
    dtw = jnp.asarray((rng.normal(size=(d, dtr)) * 0.1).astype(np.float32))
    A = -jnp.exp(jnp.asarray(
        (rng.normal(size=(d, n)) * 0.3).astype(np.float32)))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(d,)) * 0.1).astype(np.float32))

    # ground truth from xc-derived operands through the XLA scan
    u = jax.nn.silu(xc)
    dt_low = jnp.einsum("btrd,cd->btrc", u, xpw[:dtr],
                        preferred_element_type=jnp.float32)
    dt = jnp.einsum("btrc,dc->btrd", dt_low, dtw,
                    preferred_element_type=jnp.float32).astype(u.dtype)
    B = jnp.einsum("btrd,cd->btrc", u, xpw[dtr: dtr + n],
                   preferred_element_type=jnp.float32).astype(u.dtype)
    C = jnp.einsum("btrd,cd->btrc", u, xpw[dtr + n:],
                   preferred_element_type=jnp.float32).astype(u.dtype)

    sl = slice(None, None, -1) if reverse else slice(None)
    if approx:
        # each chain independently zero-init: [B,T,R,F] -> [B*R, T, F]
        def seq(x):
            return x.transpose(0, 2, 1, 3).reshape(b * r, t, x.shape[-1])
    else:
        # one coupled chain-order sequence: [B,T,R,F] -> [B, R*T, F]
        def seq(x):
            return x.transpose(0, 2, 1, 3).reshape(b, r * t, x.shape[-1])
    ref = selective_scan(seq(u)[:, sl], seq(dt)[:, sl], A, seq(B)[:, sl],
                         seq(C)[:, sl], D, delta_bias=bias, chunk=128)[:, sl]
    ref = np.asarray(ref).reshape(b, r, t, d).transpose(0, 2, 1, 3)

    got = selective_scan_pallas_chain_fused(
        xc, xpw, dtw, A, D, bias, reverse=reverse, interpret=True,
        approx_init=approx)
    np.testing.assert_allclose(np.asarray(got), ref, atol=7e-5, rtol=5e-5)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("approx", [False, True])
def test_selective_scan_pallas_chain_fused_matches_proj(reverse, approx):
    """v7 (single dispatch: strips resident via manual DMA, zero-init
    sweep + homogeneous correction sweep) == v6 for both exact and
    approx-init routes. Pins the linearity decomposition
    h_t = h0_t + (prod a) * init and the in-kernel compose."""
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan_pallas_chain_fused, selective_scan_pallas_chain_proj)

    rng = np.random.default_rng(17)
    b, t, r, d, n, dtr = 2, 24, 16, 128, 4, 4
    xc = jnp.asarray(rng.normal(size=(b, t, r, d)).astype(np.float32))
    xpw = jnp.asarray((rng.normal(size=(dtr + 2 * n, d)) * 0.1
                       ).astype(np.float32))
    dtw = jnp.asarray((rng.normal(size=(d, dtr)) * 0.1).astype(np.float32))
    A = -jnp.exp(jnp.asarray(
        (rng.normal(size=(d, n)) * 0.3).astype(np.float32)))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(d,)) * 0.1).astype(np.float32))

    ref = selective_scan_pallas_chain_proj(xc, xpw, dtw, A, D, bias,
                                           reverse=reverse, interpret=True,
                                           approx_init=approx)
    got = selective_scan_pallas_chain_fused(xc, xpw, dtw, A, D, bias,
                                            reverse=reverse, interpret=True,
                                            approx_init=approx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
