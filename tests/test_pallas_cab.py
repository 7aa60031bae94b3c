"""Fused CAB kernel (ops/pallas_cab.py) vs the flax branches.

Oracles: GRL's CAB (models/grl.py, mixed_attn_block.py:948-984) and
MambaIR's LN2+CAB+skip half-block (models/mambair.py VSSBlock,
mambair_arch.py:391-422), identical param trees across routes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.models.grl import CAB as GRLCAB
from freqfusion_tpu.ops.pallas_cab import cab_fused


def _grl_cab_params(dim, seed=0):
    cab = GRLCAB(dim)
    x0 = jnp.zeros((1, 8, 8, dim))
    return cab, cab.init(jax.random.PRNGKey(seed), x0)["params"]


@pytest.mark.parametrize("shape,dim", [
    ((1, 16, 32, 36), 36),    # multi-tile
    ((2, 11, 13, 36), 36),    # batch, odd dims, clamped halos
    ((1, 8, 8, 72), 72),      # single tile
])
def test_cab_fused_matches_grl_flax(shape, dim):
    cab, p = _grl_cab_params(dim)
    x = jax.random.normal(jax.random.PRNGKey(2), shape) * 0.5
    ref = cab.apply({"params": p}, x)
    got = cab_fused(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_cab_fused_tiny_input_fallback():
    cab, p = _grl_cab_params(36)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 36))
    ref = cab.apply({"params": p}, x)
    got = cab_fused(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_cab_fused_ln_skip_matches_mambair_halfblock():
    """MambaIR's x*skip2 + CAB(LN2(x)) fold."""
    from freqfusion_tpu.models.mambair import CAB as MCAB

    dim = 30
    cab = MCAB(dim)
    x0 = jnp.zeros((1, 8, 8, dim))
    p = cab.init(jax.random.PRNGKey(0), x0)["params"]
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    ln = {"scale": 1.0 + 0.1 * jax.random.normal(ks[0], (dim,)),
          "bias": 0.1 * jax.random.normal(ks[1], (dim,))}
    skip = 1.0 + 0.2 * jax.random.normal(ks[2], (dim,))
    x = jax.random.normal(ks[3], (1, 12, 16, dim)) * 0.5

    def ref_ln(t):
        mu = t.mean(-1, keepdims=True)
        var = ((t - mu) ** 2).mean(-1, keepdims=True)
        return (t - mu) / jnp.sqrt(var + 1e-5) * ln["scale"] + ln["bias"]

    ref = x * skip + cab.apply({"params": p}, ref_ln(x))
    got = cab_fused(x, p, ln=ln, skip_scale=skip, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_cab_fused_bf16_finite():
    cab, p = _grl_cab_params(36)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 36)) * 0.5
    ref = np.asarray(cab.apply({"params": p}, x), np.float32)
    got = np.asarray(cab_fused(
        x.astype(jnp.bfloat16),
        jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p),
        interpret=True), np.float32)
    assert np.isfinite(got).all()
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 0.05, f"bf16 relative error {err:.4f}"


def test_grl_cab_route_parity(monkeypatch):
    cab, p = _grl_cab_params(36)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 36)) * 0.5
    ref = cab.apply({"params": p}, x)
    monkeypatch.setenv("FREQFUSION_CAB", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    p2 = cab.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 36)))["params"]
    assert (jax.tree_util.tree_structure({"params": p})
            == jax.tree_util.tree_structure({"params": p2}))
    got = cab.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_mambair_vssblock_cab_route_parity(monkeypatch):
    from freqfusion_tpu.models.mambair import VSSBlock

    block = VSSBlock(dim=30, d_state=4, scan_chunk=16)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 8, 30)) * 0.5
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)

    monkeypatch.setenv("FREQFUSION_CAB", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "0")  # CAB flag is separate
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    monkeypatch.setenv("FREQFUSION_SCAN", "xla")
    variables2 = block.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables2))
    got = block.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_hat_hab_fused_routes_parity(monkeypatch):
    """HAT's HAB block with both round-5 kernels on: CAB + prenorm FFN."""
    from freqfusion_tpu.models.hat import HAB

    block = HAB(dim=30, num_heads=3, window_size=4, shift_size=2,
                mlp_ratio=2.0)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 8, 8, 30)) * 0.5
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)

    monkeypatch.setenv("FREQFUSION_CAB", "1")
    monkeypatch.setenv("FREQFUSION_MLP", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    variables2 = block.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables2))
    got = block.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
