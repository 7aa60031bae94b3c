"""Fused LKABlock kernel (ops/pallas_lka.py) vs the flax module
(models/fusion/lka.py:66-90, reference large_kernel_attention.py:112-149).
Identical param/batch_stats trees across routes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.models.fusion.lka import LKABlock


def _x(h, w, c, seed=0, batch=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, (batch, h, w, c))
                       .astype(np.float32))


@pytest.mark.parametrize("h,w,c", [
    (48, 64, 64),    # multi-tile + clamped halo-12 edges, phase-3 dim
    (24, 24, 64),    # below the halo threshold -> XLA fallback
])
def test_lka_route_parity(monkeypatch, h, w, c):
    model = LKABlock(kernel_size=21)
    x = _x(h, w, c)
    variables = model.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats so the eval-affine folding is actually tested
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype)
        .reshape(a.shape) / max(a.size, 1), variables)
    ref = model.apply(variables, x)

    monkeypatch.setenv("FREQFUSION_LKA", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    variables2 = model.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables2))
    got = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_lka_route_parity_phase4_dim128_batch2(monkeypatch):
    model = LKABlock(kernel_size=21)
    x = _x(52, 60, 128, seed=2, batch=2)  # odd tile factors (13x30)
    variables = model.init(jax.random.PRNGKey(1), x)
    ref = model.apply(variables, x)

    monkeypatch.setenv("FREQFUSION_LKA", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    got = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_lka_train_mode_keeps_flax_route(monkeypatch):
    # train=True must NEVER take the kernel (train-mode BN + dropout-free
    # VJP requirements); the flax route mutates batch_stats.
    monkeypatch.setenv("FREQFUSION_LKA", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    model = LKABlock(kernel_size=21)
    x = _x(48, 64, 64)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(variables, x, True,
                               mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert np.isfinite(np.asarray(out)).all()


def test_lka_route_parity_bf16_finite(monkeypatch):
    model = LKABlock(kernel_size=21)
    x = _x(48, 64, 64, seed=1)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(variables, x), np.float32)

    monkeypatch.setenv("FREQFUSION_LKA", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    v16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 variables)
    got = np.asarray(model.apply(v16, x.astype(jnp.bfloat16)),
                     np.float32)
    assert np.isfinite(got).all()
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.05
