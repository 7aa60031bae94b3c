"""Pallas fused window attention vs the einsum reference (interpret mode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.ops.pallas_attention import fused_window_attention  # noqa: E402
from freqfusion_tpu.ops.window_attention import (  # noqa: E402
    multi_head_window_attention,
)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_window_attention_matches_einsum(with_mask):
    rng = np.random.default_rng(0)
    b, nw, n, heads, hd = 2, 4, 64, 6, 30
    c = heads * hd
    b_ = b * nw
    q = rng.normal(size=(b_, n, c)).astype(np.float32)
    k = rng.normal(size=(b_, n, c)).astype(np.float32)
    v = rng.normal(size=(b_, n, c)).astype(np.float32)
    bias = rng.normal(size=(heads, n, n)).astype(np.float32)
    mask = None
    if with_mask:
        mask = np.where(rng.random((nw, n, n)) < 0.2, -100.0, 0.0
                        ).astype(np.float32)

    ref = multi_head_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads,
        bias=jnp.asarray(bias),
        mask=None if mask is None else jnp.asarray(mask))

    out = fused_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        None if mask is None else jnp.asarray(mask),
        num_heads=heads, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_window_attention_nhwc_matches_einsum(with_mask):
    from freqfusion_tpu.ops.pallas_attention import (
        fused_window_attention_nhwc)
    from freqfusion_tpu.ops.window_attention import (
        window_partition, window_reverse)

    rng = np.random.default_rng(1)
    b, h, w, heads, hd, ws = 2, 16, 32, 6, 10, 8
    c = heads * hd
    n = ws * ws
    nw = (h // ws) * (w // ws)
    q = rng.normal(size=(b, h, w, c)).astype(np.float32)
    k = rng.normal(size=(b, h, w, c)).astype(np.float32)
    v = rng.normal(size=(b, h, w, c)).astype(np.float32)
    bias = rng.normal(size=(heads, n, n)).astype(np.float32)
    mask = None
    if with_mask:
        mask = np.where(rng.random((nw, n, n)) < 0.2, -100.0, 0.0
                        ).astype(np.float32)

    qw, kw, vw = (window_partition(jnp.asarray(t), ws) for t in (q, k, v))
    ref = multi_head_window_attention(
        qw, kw, vw, heads, bias=jnp.asarray(bias),
        mask=None if mask is None else jnp.asarray(mask))
    ref = window_reverse(ref, ws, h, w)

    out = fused_window_attention_nhwc(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        None if mask is None else jnp.asarray(mask),
        num_heads=heads, window_size=ws, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("shifted", [False, True])
def test_qkv_in_kernel_matches_split_route(monkeypatch, shifted):
    """FREQFUSION_ATTN_QKV=1 (qkv + proj inside the kernel) == the
    SplitQKV -> fused_window_attention_nhwc -> proj route, at the
    WindowAttention module level (DRCT geometry, non-128-multiple C)."""
    from freqfusion_tpu.models.drct import WindowAttention
    from freqfusion_tpu.ops.window_attention import shifted_window_mask

    rng = np.random.default_rng(5)
    b, h, w, c, ws, nh = 1, 16, 24, 60, 8, 6
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    mask_np = shifted_window_mask(h, w, ws, ws // 2 if shifted else 0)
    mask = None if mask_np is None else jnp.asarray(mask_np)
    mod = WindowAttention(c, ws, nh)
    params = mod.init(jax.random.PRNGKey(0), x, mask)

    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    monkeypatch.delenv("FREQFUSION_ATTN_QKV", raising=False)
    ref = mod.apply(params, x, mask)
    monkeypatch.setenv("FREQFUSION_ATTN_QKV", "1")
    got = mod.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t,e,nh", [(9, 64, 4), (4, 128, 8)])
def test_token_attention_kernel_matches_einsum(monkeypatch, t, e, nh):
    """FREQFUSION_TOKEN_ATTN=1 (whole per-pixel MHA in one kernel,
    pixels-on-lanes slab formulation) == the einsum route, at the
    TokenMultiheadAttention module level (both fusion-net geometries)."""
    from freqfusion_tpu.models.fusion.lka import TokenMultiheadAttention

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 6, 10, t, e)).astype(np.float32))
    mod = TokenMultiheadAttention(nh)
    params = mod.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    monkeypatch.delenv("FREQFUSION_TOKEN_ATTN", raising=False)
    ref = mod.apply(params, x)
    monkeypatch.setenv("FREQFUSION_TOKEN_ATTN", "1")
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=2e-5)
