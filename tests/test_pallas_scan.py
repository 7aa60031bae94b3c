"""Pallas selective-scan kernel vs the XLA chunked scan (interpret mode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.ops.selective_scan import (  # noqa: E402
    selective_scan, selective_scan_pallas,
)


@pytest.mark.parametrize("l,chunk", [(100, 16), (64, 64), (130, 32)])
def test_pallas_scan_matches_xla(l, chunk):
    rng = np.random.default_rng(0)
    b, d, n = 2, 12, 4
    u = rng.normal(size=(b, l, d)).astype(np.float32)
    dt = rng.normal(size=(b, l, d)).astype(np.float32) * 0.5
    A = -np.exp(rng.normal(size=(d, n)).astype(np.float32) * 0.3)
    B = rng.normal(size=(b, l, n)).astype(np.float32)
    C = rng.normal(size=(b, l, n)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    bias = rng.normal(size=(d,)).astype(np.float32)

    y_ref = selective_scan(jnp.asarray(u), jnp.asarray(dt), jnp.asarray(A),
                           jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
                           delta_bias=jnp.asarray(bias), chunk=32)
    y = selective_scan_pallas(jnp.asarray(u), jnp.asarray(dt), jnp.asarray(A),
                              jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
                              jnp.asarray(bias), chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)
