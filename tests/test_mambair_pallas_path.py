"""MambaIR's Pallas scan route == its XLA route, at the model level.

Pins the SS2D bidirectional-kernel wiring (direction-batched projections,
backward recurrence replacing flips) against the plain per-direction XLA
scan path, reference semantics at mambair_arch.py:339-369.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.models.mambair import MambaIR  # noqa: E402


@pytest.mark.parametrize("h,w", [(12, 20), (16, 24)])
def test_mambair_pallas_route_matches_xla(monkeypatch, h, w):
    # embed_dim must clear CAB's squeeze_factor-30 bottleneck (dim//30 >= 1)
    model = MambaIR(upscale=4, embed_dim=60, depths=(2,), d_state=4,
                    scan_chunk=64)
    rng = np.random.default_rng(0)
    # (12, 20): w%8 != 0 -> the flat bidir route (padding + reversed chunk
    # walk); (16, 24): both %8 == 0 -> the spatial-direct route
    x = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "0")
    sr_ref, feat_ref = model.apply(params, x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    sr_pal, feat_pal = model.apply(params, x)

    monkeypatch.delenv("FREQFUSION_PALLAS")

    np.testing.assert_allclose(np.asarray(sr_pal), np.asarray(sr_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(feat_pal), np.asarray(feat_ref),
                               atol=3e-5, rtol=1e-4)


def test_mambair_scan_approx_route_runs(monkeypatch):
    """FREQFUSION_SCAN_APPROX=1 (gated approximation, VERDICT-r2 item 9)
    wires through SS2D: runs the chain route with zero-init chains and
    stays close to the exact route at small geometry (short chains decay
    the carried state; the semantic difference itself is pinned at the
    kernel level in test_pallas_scan.py)."""
    model = MambaIR(upscale=4, embed_dim=60, depths=(2,), d_state=4,
                    scan_chunk=64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 24, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    sr_exact, _ = model.apply(params, x)
    monkeypatch.setenv("FREQFUSION_SCAN_APPROX", "1")
    sr_approx, _ = model.apply(params, x)

    np.testing.assert_allclose(np.asarray(sr_approx), np.asarray(sr_exact),
                               atol=5e-3, rtol=1e-2)
