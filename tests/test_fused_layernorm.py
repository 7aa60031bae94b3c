"""Fused LayerNorm kernel: interpret-mode parity vs flax nn.LayerNorm.

The kernel's one-pass two-moment math must match the stock LayerNorm the
converters were parity-tested against (reference models all use torch
nn.LayerNorm eps=1e-5; flax nn.LayerNorm was pinned equivalent by the
per-model parity suites).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.ops.layernorm import FusedLayerNorm, fused_layernorm


@pytest.mark.parametrize("shape", [(2, 33, 180), (1, 16, 24, 360), (7, 131)])
def test_kernel_matches_flax_fp32(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    s = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    b = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    ref = nn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": s, "bias": b}}, x)
    out = fused_layernorm(x, s, b, eps=1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)


def test_kernel_matches_flax_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 50, 180)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    s = jnp.asarray(rng.normal(size=180).astype(np.float32))
    b = jnp.asarray(rng.normal(size=180).astype(np.float32))
    ref = nn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": s, "bias": b}}, x).astype(jnp.float32)
    out = fused_layernorm(x, s, b, eps=1e-5,
                          interpret=True).astype(jnp.float32)
    # both routes quantize the normalized output to bf16: ~1 ulp apart
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.06)


def test_module_param_tree_matches_stock():
    x = jnp.zeros((2, 9, 64), jnp.float32)
    ours = FusedLayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)
    stock = nn.LayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(ours) == \
        jax.tree_util.tree_structure(stock)
    assert ours["params"]["scale"].shape == (64,)
    assert ours["params"]["bias"].shape == (64,)


def test_module_fallback_matches_stock():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 40, 96)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=96).astype(np.float32))
    b = jnp.asarray(rng.normal(size=96).astype(np.float32))
    params = {"params": {"scale": s, "bias": b}}
    ref = nn.LayerNorm(epsilon=1e-5).apply(params, x)
    out = FusedLayerNorm(epsilon=1e-5).apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)
