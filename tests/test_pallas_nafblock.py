"""Fused whole-NAFBlock Pallas kernel vs the flax block (interpret mode).

The kernel (ops/pallas_nafblock.py) is the round-5 byte-floor
restructure: one NAFBlock per two fused passes instead of ~8-10 HBM
round trips (roofline v2, BENCH_NOTES). Parity oracle is the real flax
NAFBlock (models/nafnet.py), i.e. the converter-pinned reference
semantics of nafnet_arch.py:58-131, including the SCA global pool and
dw zero-padding at image edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.models.nafnet import NAFBlock, NAFNetSR
from freqfusion_tpu.ops.pallas_nafblock import nafblock_fused


def _block_and_params(c, seed=0):
    block = NAFBlock(c)
    x0 = jnp.zeros((1, 8, 8, c))
    variables = block.init(jax.random.PRNGKey(seed), x0)
    # non-degenerate residual scales (init is zeros)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    p = dict(variables["params"])
    p["beta"] = jax.random.normal(k1, (c,)) * 0.5
    p["gamma"] = jax.random.normal(k2, (c,)) * 0.5
    return block, p


@pytest.mark.parametrize("shape,c", [
    ((1, 16, 32, 16), 16),     # multi-tile both axes
    ((2, 12, 20, 16), 16),     # batch > 1, clamped edge halos
    ((1, 8, 128, 64), 64),     # realistic channel width, one tile row
    ((1, 9, 15, 8), 8),        # odd dims -> odd tile divisors
])
def test_nafblock_fused_matches_flax(shape, c):
    block, p = _block_and_params(c)
    x = jax.random.uniform(jax.random.PRNGKey(2), shape)
    ref = block.apply({"params": p}, x)
    got = nafblock_fused(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_nafblock_fused_tiny_input_fallback():
    block, p = _block_and_params(8)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 2, 2, 8))
    ref = block.apply({"params": p}, x)
    got = nafblock_fused(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_nafblock_fused_bf16_close_to_fp32():
    block, p = _block_and_params(16)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 16))
    ref = np.asarray(block.apply({"params": p}, x), np.float32)
    got = np.asarray(
        nafblock_fused(x.astype(jnp.bfloat16),
                       jax.tree_util.tree_map(
                           lambda a: a.astype(jnp.bfloat16), p),
                       interpret=True), np.float32)
    assert np.isfinite(got).all()
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 0.05, f"bf16 relative error {err:.4f}"


def test_nafnet_model_fused_route_parity(monkeypatch):
    """FREQFUSION_NAFBLOCK=1 routes every block through the kernel with
    an IDENTICAL param tree — same init, interchangeable checkpoints."""
    model = NAFNetSR(upscale=4, width=16, middle_blk_num=1,
                     enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 12, 12, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    sr_ref, feat_ref = model.apply(variables, x)

    monkeypatch.setenv("FREQFUSION_NAFBLOCK", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    variables2 = model.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables2))
    sr_got, feat_got = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(sr_got), np.asarray(sr_ref),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(feat_got), np.asarray(feat_ref),
                               atol=5e-5, rtol=5e-5)
