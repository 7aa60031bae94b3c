"""nn.scan layer variants == unrolled variants (MambaIR, GRL)."""

import jax
import jax.numpy as jnp
import numpy as np

from freqfusion_tpu.convert.common import stack_layer_runs, stack_layers
from freqfusion_tpu.models.grl import GRL
from freqfusion_tpu.models.mambair import MambaIR


def test_mambair_scan_matches_unrolled():
    cfg = dict(upscale=4, embed_dim=32, depths=(2, 2), d_state=8,
               mlp_ratio=2.0, scan_chunk=64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))

    unrolled = MambaIR(**cfg, use_scan=False)
    params = unrolled.init(jax.random.PRNGKey(0), x)
    sr_ref, _ = unrolled.apply(params, x)

    scanned = MambaIR(**cfg, use_scan=True)
    stacked = {"params": stack_layers(params["params"])}
    sr, _ = scanned.apply(stacked, x)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref),
                               atol=1e-5, rtol=1e-5)


def test_grl_scan_matches_unrolled():
    cfg = dict(upscale=4, embed_dim=48, depths=(2, 4, 4, 2), num_heads_w=3,
               num_heads_s=3, window_size=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))

    unrolled = GRL(**cfg, use_scan=False)
    params = unrolled.init(jax.random.PRNGKey(0), x)
    sr_ref, _ = unrolled.apply(params, x)

    scanned = GRL(**cfg, use_scan=True)
    stacked = {"params": stack_layer_runs(params["params"], cfg["depths"])}
    sr, _ = scanned.apply(stacked, x)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref),
                               atol=1e-5, rtol=1e-5)


def test_mambair_scan_variant_with_fused_cab(monkeypatch):
    """Round-5 CAB kernel (LN2+CAB+skip fold) must trace inside MambaIR's
    nn.scan stacked-param variant — the route any hardware A/B uses."""
    cfg = dict(upscale=4, embed_dim=32, depths=(2, 2), d_state=8,
               mlp_ratio=2.0, scan_chunk=64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))

    unrolled = MambaIR(**cfg, use_scan=False)
    params = unrolled.init(jax.random.PRNGKey(0), x)
    sr_ref, _ = unrolled.apply(params, x)

    monkeypatch.setenv("FREQFUSION_CAB", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    monkeypatch.setenv("FREQFUSION_SCAN", "xla")
    scanned = MambaIR(**cfg, use_scan=True)
    stacked = {"params": stack_layers(params["params"])}
    sr, _ = scanned.apply(stacked, x)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref),
                               atol=5e-4, rtol=5e-4)


def test_grl_scan_variant_with_fused_cab_and_mlp(monkeypatch):
    cfg = dict(upscale=4, embed_dim=36, depths=(2, 2), num_heads_w=3,
               num_heads_s=3, window_size=8)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))

    unrolled = GRL(**cfg, use_scan=False)
    params = unrolled.init(jax.random.PRNGKey(0), x)
    sr_ref, _ = unrolled.apply(params, x)

    monkeypatch.setenv("FREQFUSION_CAB", "1")
    monkeypatch.setenv("FREQFUSION_MLP", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    scanned = GRL(**cfg, use_scan=True)
    stacked = {"params": stack_layer_runs(params["params"], cfg["depths"])}
    sr, _ = scanned.apply(stacked, x)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref),
                               atol=5e-4, rtol=5e-4)
