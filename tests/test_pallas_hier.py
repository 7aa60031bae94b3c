"""Fused hierarchical stage-3 kernel (ops/pallas_hier.py) vs the flax
module (models/fusion/hierarchical.py, reference
hierarchical_fusion.py:67-201). Identical param trees across routes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.models.fusion.hierarchical import (
    HierarchicalMultiResolutionFusion)


def _inputs(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return {k: jnp.asarray(rng.uniform(0, 1, (1, h, w, 3))
                           .astype(np.float32))
            for k in ("drct", "grl", "nafnet", "mamba")}


@pytest.mark.parametrize("h,w", [
    (48, 64),     # multi-tile + clamped halo-6 edges
    (24, 24),     # below the halo threshold -> XLA fallback inside
])
def test_hier_stage3_route_parity(monkeypatch, h, w):
    model = HierarchicalMultiResolutionFusion(num_experts=4,
                                              base_channels=64)
    imgs = _inputs(h, w)
    variables = model.init(jax.random.PRNGKey(0), imgs)
    ref = model.apply(variables, imgs)

    monkeypatch.setenv("FREQFUSION_HIER", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    variables2 = model.init(jax.random.PRNGKey(0), imgs)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables2))
    got = model.apply(variables, imgs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_hier_stage3_route_parity_bf16_finite(monkeypatch):
    model = HierarchicalMultiResolutionFusion(num_experts=4,
                                              base_channels=64)
    imgs = _inputs(48, 64, seed=1)
    variables = model.init(jax.random.PRNGKey(0), imgs)
    ref = np.asarray(model.apply(variables, imgs), np.float32)

    monkeypatch.setenv("FREQFUSION_HIER", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    v16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 variables)
    i16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), imgs)
    got = np.asarray(model.apply(v16, i16), np.float32)
    assert np.isfinite(got).all()
    # sigmoid-bounded output: absolute comparison is meaningful
    assert np.abs(got - ref).max() < 0.05
