"""Fused Laplacian-edge kernels (ops/pallas_edge.py) vs the flax module
(models/fusion/edge.py, reference edge_enhancement.py:92-260).
Identical param trees across routes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.models.fusion.edge import LaplacianPyramidRefinement


def _img(h, w, seed=0, batch=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3))
                       .astype(np.float32))


@pytest.mark.parametrize("h,w", [
    (48, 64),     # multi-tile at every level + clamped halo-4 edges
    (16, 16),     # HR/4 level below the halo threshold -> XLA fallback
])
def test_edge_route_parity(monkeypatch, h, w):
    model = LaplacianPyramidRefinement(num_levels=3, channels=32)
    sr = _img(h, w)
    variables = model.init(jax.random.PRNGKey(0), sr)
    ref = model.apply(variables, sr)

    monkeypatch.setenv("FREQFUSION_EDGE", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    variables2 = model.init(jax.random.PRNGKey(0), sr)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables2))
    got = model.apply(variables, sr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_edge_route_parity_batch2_odd_tiles(monkeypatch):
    # 44 -> HR/4 level is 11x16: rh degenerates to 1 (prime), exercising
    # the minimal-tile path and the clamped roll on every row.
    model = LaplacianPyramidRefinement(num_levels=3, channels=32)
    sr = _img(44, 64, seed=2, batch=2)
    variables = model.init(jax.random.PRNGKey(1), sr)
    ref = model.apply(variables, sr)

    monkeypatch.setenv("FREQFUSION_EDGE", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    got = model.apply(variables, sr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_edge_route_parity_bf16_finite(monkeypatch):
    model = LaplacianPyramidRefinement(num_levels=3, channels=32)
    sr = _img(48, 64, seed=1)
    variables = model.init(jax.random.PRNGKey(0), sr)
    ref = np.asarray(model.apply(variables, sr), np.float32)

    monkeypatch.setenv("FREQFUSION_EDGE", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    v16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 variables)
    got = np.asarray(model.apply(v16, sr.astype(jnp.bfloat16)),
                     np.float32)
    assert np.isfinite(got).all()
    # clip-bounded output: absolute comparison is meaningful
    assert np.abs(got - ref).max() < 0.05
