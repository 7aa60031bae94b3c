"""Accuracy pins for the in-kernel math helpers (ops/kmath.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from freqfusion_tpu.ops.kmath import erf_as, gelu_exact


def test_erf_as_accuracy():
    x = jnp.asarray(np.linspace(-6, 6, 20001, dtype=np.float32))
    got = np.asarray(erf_as(x))
    ref = np.asarray(jax.scipy.special.erf(x))
    assert np.max(np.abs(got - ref)) < 1e-6


def test_gelu_exact_matches_jax_nn_gelu():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3, (4096,)).astype(np.float32))
    got = np.asarray(gelu_exact(x))
    ref = np.asarray(jax.nn.gelu(x, approximate=False))
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_gelu_exact_bf16_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 2, (1024,)).astype(np.float32))
    got = np.asarray(gelu_exact(x.astype(jnp.bfloat16)).astype(jnp.float32))
    ref = np.asarray(jax.nn.gelu(x, approximate=False))
    # bf16 input quantization dominates; the helper itself adds ~3e-7
    np.testing.assert_allclose(got, ref, atol=0.02, rtol=0.02)
