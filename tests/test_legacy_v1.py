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
