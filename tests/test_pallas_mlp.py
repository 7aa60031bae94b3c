"""Fused FFN kernel (ops/pallas_mlp.py) vs the flax routes.

Oracles are the real model blocks: DRCT's pre-norm SwinTransformerBlock
FFN half (drct_arch.py:302-434) and GRL's post-norm
EfficientMixAttnTransformerBlock FFN half
(mixed_attn_block_efficient.py:406-560), with identical param trees
across routes (converted checkpoints interchangeable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.ops.pallas_mlp import fused_mlp_block


def _ref(x, w1, b1, w2, b2, ls, lb, prenorm, res_scale=1.0, eps=1e-5):
    def ln(t):
        mu = t.mean(-1, keepdims=True)
        var = ((t - mu) ** 2).mean(-1, keepdims=True)
        return (t - mu) / np.sqrt(var + eps) * ls + lb

    t = ln(x) if prenorm else x
    h = jax.nn.gelu(t @ w1 + b1, approximate=False)
    y = h @ w2 + b2
    if not prenorm:
        y = ln(y)
    return x + res_scale * y


@pytest.mark.parametrize("prenorm", [True, False])
@pytest.mark.parametrize("shape,hidden", [
    ((1, 8, 16, 32), 128),    # spatial input, ratio 4
    ((2, 100, 48), 96),       # token input, row-padding tail
    ((1, 4, 4, 180), 360),    # GRL-like odd channel count
])
def test_fused_mlp_matches_reference(prenorm, shape, hidden):
    c = shape[-1]
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], shape)
    w1 = jax.random.normal(ks[1], (c, hidden)) * 0.05
    b1 = jax.random.normal(ks[2], (hidden,)) * 0.1
    w2 = jax.random.normal(ks[3], (hidden, c)) * 0.05
    b2 = jax.random.normal(ks[4], (c,)) * 0.1
    ls = 1.0 + jax.random.normal(ks[5], (c,)) * 0.1
    lb = jnp.zeros((c,)) + 0.05
    ref = _ref(np.asarray(x), np.asarray(w1), np.asarray(b1),
               np.asarray(w2), np.asarray(b2), np.asarray(ls),
               np.asarray(lb), prenorm, res_scale=0.75)
    got = fused_mlp_block(x, w1, b1, w2, b2, ls, lb, prenorm=prenorm,
                          res_scale=0.75, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=3e-5)


def test_drct_swin_block_mlp_route_parity(monkeypatch):
    from freqfusion_tpu.models.drct import SwinTransformerBlock

    block = SwinTransformerBlock(dim=32, num_heads=4, window_size=4,
                                 shift_size=2, mlp_ratio=4.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 32))
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)

    monkeypatch.setenv("FREQFUSION_MLP", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    monkeypatch.setenv("FREQFUSION_ATTN_QKV", "0")
    variables2 = block.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables2))
    got = block.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_grl_block_mlp_route_parity(monkeypatch):
    from freqfusion_tpu.models.grl import EfficientMixAttnTransformerBlock

    block = EfficientMixAttnTransformerBlock(
        dim=32, num_heads_w=2, num_heads_s=2, window_size=8,
        window_shift=False, stripe_type="H", stripe_size=(8, 8),
        anchor_down_factor=2, mlp_ratio=2.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 32))
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)

    monkeypatch.setenv("FREQFUSION_MLP", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    monkeypatch.setenv("FREQFUSION_GRL_QKV", "0")
    variables2 = block.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables2))
    got = block.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_drct_scan_variant_with_fused_mlp(monkeypatch):
    """The fused FFN route must trace inside nn.scan over stacked params
    (the use_scan variants are what ships through the relay)."""
    from freqfusion_tpu.models.drct import DRCT

    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 8, 8, 3))
    model = DRCT(upscale=4, embed_dim=32, num_layers=2, num_heads=4,
                 window_size=4, gc=8, use_scan=False)
    variables = model.init(jax.random.PRNGKey(0), x)
    sr_ref, _ = model.apply(variables, x)

    from freqfusion_tpu.models.pipeline import restack_params_for_scan
    stacked = restack_params_for_scan({"drct": variables})["drct"]
    scan_model = DRCT(upscale=4, embed_dim=32, num_layers=2, num_heads=4,
                      window_size=4, gc=8, use_scan=True)

    monkeypatch.setenv("FREQFUSION_MLP", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    sr_got, _ = scan_model.apply(stacked, x)
    np.testing.assert_allclose(np.asarray(sr_got), np.asarray(sr_ref),
                               atol=5e-5, rtol=5e-5)


def test_hat_ocab_fused_mlp_route_parity(monkeypatch):
    from freqfusion_tpu.models.hat import OCAB

    block = OCAB(dim=30, window_size=4, overlap_ratio=0.5, num_heads=3,
                 mlp_ratio=2.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 30)) * 0.5
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)
    monkeypatch.setenv("FREQFUSION_MLP", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    variables2 = block.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables2))
    got = block.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
