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
    # window_size 16 + stripe 8 -> the window half engages the NHWC
    # window kernel (N=256) while the stripe half stays on einsum
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


def test_grl_combined_mixed_kernel_matches_einsum(monkeypatch):
    # GRL-B geometry (stripe tile == 8x8 window tile) engages the combined
    # mixed-attention kernel: both halves in one NHWC pass. depths=(2,)
    # covers a shifted+H-stripe block and an unshifted+W-stripe block.
    cfg = dict(upscale=4, embed_dim=48, depths=(2,), num_heads_w=3,
               num_heads_s=3, window_size=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))

    model = GRL(**cfg)
    params = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "0")
    sr_ref, feat_ref = model.apply(params, x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    sr_pal, feat_pal = model.apply(params, x)

    monkeypatch.delenv("FREQFUSION_PALLAS")

    np.testing.assert_allclose(np.asarray(sr_pal), np.asarray(sr_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(feat_pal), np.asarray(feat_ref),
                               atol=2e-5, rtol=1e-5)


def test_grl_qkv_in_kernel_matches_default(monkeypatch):
    """FREQFUSION_GRL_QKV=1 (6-way qkv projection inside the mixed
    kernel, window half from the rolled strip) == the default kernel
    route, at the model level (covers shifted AND unshifted blocks)."""
    model = GRL(upscale=4, embed_dim=48, depths=(2,), num_heads_w=3,
                num_heads_s=3, window_size=8)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    monkeypatch.delenv("FREQFUSION_GRL_QKV", raising=False)
    sr_ref, feat_ref = model.apply(params, x)
    monkeypatch.setenv("FREQFUSION_GRL_QKV", "1")
    sr_new, feat_new = model.apply(params, x)

    np.testing.assert_allclose(np.asarray(sr_new), np.asarray(sr_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(feat_new), np.asarray(feat_ref),
                               atol=3e-5, rtol=1e-4)
