"""GRL's Pallas window-attention route == its einsum route.

The Pallas path folds L2-normalization and the clamped logit scale into q
outside the kernel; this pins that algebra to the reference cosine form.
"""



import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.models.grl import GRL  # noqa: E402


def test_grl_pallas_route_matches_einsum(monkeypatch):
    # window_size 16 -> N=256 engages the NHWC kernel route (GRL-B's own
    # 8x8 windows stay on the einsum path by measurement)
    cfg = dict(upscale=4, embed_dim=48, depths=(2,), num_heads_w=3,
               num_heads_s=3, window_size=16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))

    model = GRL(**cfg)
    params = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "0")
    sr_ref, _ = model.apply(params, x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    sr_pal, _ = model.apply(params, x)

    monkeypatch.delenv("FREQFUSION_PALLAS")

    np.testing.assert_allclose(np.asarray(sr_pal), np.asarray(sr_ref),
                               atol=2e-5, rtol=1e-5)
