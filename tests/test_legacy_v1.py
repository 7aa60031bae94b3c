"""Legacy v1 fusion stack: shape/finiteness/gradient-coverage gates
(the reference's per-phase dry-run pattern, scripts/test_phase*_dryrun.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.models.fusion.legacy_v1 import (
    FrequencyAwareFusion, FrequencyRouter, MultiResolutionFusion,
)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    experts = [jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
               for _ in range(3)]
    return lr, experts


def test_frequency_router_softmax(data):
    lr, _ = data
    router = FrequencyRouter(num_experts=3, num_bands=3)
    variables = router.init(jax.random.PRNGKey(0), lr)
    out = router.apply(variables, lr)
    assert out.shape == (2, 8, 8, 3, 3)
    np.testing.assert_allclose(np.asarray(out.sum(axis=-2)), 1.0, atol=1e-5)


def test_frequency_aware_fusion(data):
    lr, experts = data
    model = FrequencyAwareFusion(num_experts=3)
    variables = model.init(jax.random.PRNGKey(0), lr, experts)
    out = model.apply(variables, lr, experts)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    # gradient coverage: every trainable param receives a gradient
    def loss_fn(params):
        sr = model.apply({"params": params, **{k: v for k, v in
                          variables.items() if k != "params"}},
                         lr, experts, train=True,
                         mutable=["batch_stats"])[0]
        return jnp.abs(sr - 0.5).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    n_zero = sum(int(np.all(np.asarray(g) == 0))
                 for g in jax.tree_util.tree_leaves(grads))
    total = len(jax.tree_util.tree_leaves(grads))
    assert n_zero < total * 0.2, f"{n_zero}/{total} params have zero grads"


def test_multi_resolution_fusion(data):
    lr, experts = data
    model = MultiResolutionFusion(num_experts=3)
    variables = model.init(jax.random.PRNGKey(0), lr, experts)
    out = model.apply(variables, lr, experts)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# Round-2 v1 completion: remaining classes
# ---------------------------------------------------------------------------


FEATS = {"drct": 180, "grl": 180, "nafnet": 64, "mamba": 180}


@pytest.fixture
def data4():
    rng = np.random.default_rng(1)
    lr = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    imgs = {k: jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3))
                           .astype(np.float32)) for k in FEATS}
    feats = {k: jnp.asarray(rng.normal(size=(2, 8, 8, c))
                            .astype(np.float32)) for k, c in FEATS.items()}
    return lr, imgs, feats


def test_frequency_decomposition_reconstructs():
    """The 3 bands are an exact partition: their sum reconstructs x."""
    from freqfusion_tpu.models.fusion.legacy_v1 import FrequencyDecomposition

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    m = FrequencyDecomposition()
    bands = m.apply({}, x, method=FrequencyDecomposition.decompose)
    assert len(bands) == 3
    np.testing.assert_allclose(np.asarray(sum(bands)), np.asarray(x),
                               atol=1e-5)
    # non-default splits move coefficients between bands (and still
    # partition: reconstruction stays exact)
    from freqfusion_tpu.models.fusion.legacy_v1 import _zigzag_ratio_masks_np
    m_def = _zigzag_ratio_masks_np(8, 0.25, 0.75)
    m_alt = _zigzag_ratio_masks_np(8, 0.15, 0.6)
    assert m_alt[0].sum() < m_def[0].sum()      # smaller low band
    assert m_alt[2].sum() > m_def[2].sum()      # larger high band
    bands2 = m.apply({}, x, 0.15, 0.6,
                     method=FrequencyDecomposition.decompose)
    np.testing.assert_allclose(np.asarray(sum(bands2)), np.asarray(x),
                               atol=1e-5)


def test_adaptive_band_predictor_ranges(data4):
    from freqfusion_tpu.models.fusion.legacy_v1 import (
        AdaptiveFrequencyBandPredictor,
    )

    lr, _, _ = data4
    m = AdaptiveFrequencyBandPredictor()
    v = m.init(jax.random.PRNGKey(0), lr)
    low, high = m.apply(v, lr)
    assert low.shape == (2, 1) and high.shape == (2, 1)
    assert float(low.min()) >= 0.15 and float(low.max()) <= 0.4
    assert float(high.min()) >= 0.6 and float(high.max()) <= 0.9
    assert np.all(np.asarray(high) >= np.asarray(low) + 0.2 - 1e-6)


def test_cross_band_attention_shapes(data4):
    from freqfusion_tpu.models.fusion.legacy_v1 import CrossBandAttention

    lr, _, _ = data4
    bands = [lr, lr * 0.5, lr * 0.1]
    m = CrossBandAttention(dim=16, num_heads=4)
    v = m.init(jax.random.PRNGKey(0), bands)
    out = m.apply(v, bands)
    assert len(out) == 3
    for o in out:
        assert o.shape == lr.shape
        assert np.isfinite(np.asarray(o)).all()


def test_dynamic_selector_v1_floor(data4):
    from freqfusion_tpu.models.fusion.legacy_v1 import DynamicExpertSelectorV1

    lr, _, _ = data4
    feats = jnp.ones((2, 8, 8, 32))
    m = DynamicExpertSelectorV1(hidden_dim=32, num_experts=3)
    v = m.init(jax.random.PRNGKey(0), lr, feats)
    gates, diff = m.apply(v, lr, feats)
    assert gates.shape == (2, 8, 8, 3)
    assert diff.shape == (2, 8, 8, 1)
    # near-max floor: at least one expert per pixel gated >= 0.9
    assert float(gates.max(axis=-1).min()) >= 0.9 - 1e-6


def test_collaborative_feature_learning(data4):
    from freqfusion_tpu.models.fusion.legacy_v1 import (
        CollaborativeFeatureLearning,
    )

    lr, imgs, feats = data4
    outs = list(imgs.values())
    m = CollaborativeFeatureLearning(num_experts=4, feature_dim=32,
                                     num_heads=4)
    v = m.init(jax.random.PRNGKey(0), feats, outs)
    out = m.apply(v, feats, outs)
    assert len(out) == 4
    for o in out:
        assert o.shape == (2, 32, 32, 3)
        assert float(o.min()) >= 0.0 and float(o.max()) <= 1.0
    # missing features -> passthrough
    out2 = m.apply(v, {}, outs)
    assert all((a is b) for a, b in zip(out2, outs))


def test_multi_fusion_sr_and_enhanced(data4):
    from freqfusion_tpu.models.fusion.legacy_v1 import (
        EnhancedMultiFusionSR, MultiFusionSR,
    )

    lr, imgs, _ = data4
    outs = list(imgs.values())[:3]
    m = MultiFusionSR(num_experts=3)
    v = m.init(jax.random.PRNGKey(0), lr, outs)
    out = m.apply(v, lr, outs)
    assert out.shape == (2, 32, 32, 3)

    for mr in (False, True):
        em = EnhancedMultiFusionSR(num_experts=3, use_multi_resolution=mr)
        v = em.init(jax.random.PRNGKey(0), lr, outs)
        out = em.apply(v, lr, outs)
        assert out.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_complete_enhanced_fusion_v1(data4):
    from freqfusion_tpu.models.fusion.legacy_v1 import (
        CompleteEnhancedFusionSRV1,
    )

    lr, imgs, feats = data4
    m = CompleteEnhancedFusionSRV1(num_experts=4, fusion_dim=16,
                                   refine_channels=16)
    v = m.init(jax.random.PRNGKey(0), lr, imgs, feats)
    out, _ = m.apply(v, lr, imgs, feats, train=True,
                     mutable=["batch_stats"], 
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (2, 32, 32, 3)
    out_eval = m.apply(v, lr, imgs, feats)
    assert float(out_eval.min()) >= 0.0 and float(out_eval.max()) <= 1.0

    # gradient coverage over the full v1 orchestrator
    def loss_fn(params):
        sr, _ = m.apply({"params": params,
                         "batch_stats": v.get("batch_stats", {})},
                        lr, imgs, feats, train=True,
                        mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.abs(sr - 0.5).mean()

    grads = jax.grad(loss_fn)(v["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    n_zero = sum(int(np.all(np.asarray(g) == 0)) for g in leaves)
    assert n_zero < len(leaves) * 0.2, f"{n_zero}/{len(leaves)} zero grads"
