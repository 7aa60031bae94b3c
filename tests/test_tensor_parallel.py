"""Tensor-parallel expert inference on the virtual CPU mesh: sharded
run == replicated run, and the params really are distributed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.models.drct import DRCT
from freqfusion_tpu.parallel.mesh import make_mesh
from freqfusion_tpu.parallel.tensor_parallel import (
    tp_apply, tp_param_shardings,
)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_tp_expert_matches_replicated():
    model = DRCT(upscale=4, embed_dim=60, num_layers=1, num_heads=6,
                 window_size=8, gc=12)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    sr_ref, feat_ref = model.apply(params, x)

    mesh = make_mesh(n_data=2, n_model=4)
    fn, sharded = tp_apply(model, params, mesh)

    # feature-axis leaves actually sharded over 'model'
    specs = jax.tree_util.tree_leaves(
        tp_param_shardings(params, mesh),
        is_leaf=lambda s: isinstance(s, jax.sharding.NamedSharding))
    n_sharded = sum(1 for s in specs if s.spec != jax.sharding.PartitionSpec())
    assert n_sharded > 10, f"only {n_sharded} leaves sharded"

    qkv = sharded["params"]["layers_0"]["swin1"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec[-1] == "model"

    sr_tp, feat_tp = fn(sharded, x)
    np.testing.assert_allclose(np.asarray(sr_tp), np.asarray(sr_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(feat_tp), np.asarray(feat_ref),
                               atol=2e-5, rtol=1e-5)
