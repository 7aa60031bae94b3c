"""Matmul-DFT == jnp.fft; FFT decomposition / loss under both backends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.losses.combined import fft_loss
from freqfusion_tpu.models.fusion.frequency import FFTDecomposition
from freqfusion_tpu.ops import dft
from freqfusion_tpu.ops.dft import fft2_ortho, irfft2_ortho, rfft2_ortho


@pytest.mark.parametrize("h,w", [(48, 64), (13, 17), (32, 32), (20, 30)])
def test_matmul_dft_matches_jnp_fft(h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
    ref = jnp.fft.rfft2(x, axes=(1, 2), norm="ortho")
    yr, yi = rfft2_ortho(x)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(ref.real),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ref.imag),
                               atol=3e-5, rtol=1e-4)
    back = irfft2_ortho(yr, yi, (h, w))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=3e-5)

    fr, fi = fft2_ortho(x)
    full = jnp.fft.fft2(x, axes=(1, 2), norm="ortho")
    np.testing.assert_allclose(np.asarray(fr), np.asarray(full.real),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(full.imag),
                               atol=3e-5, rtol=1e-4)


def test_fft_decomposition_same_under_both_paths(monkeypatch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 24, 20, 3)).astype(np.float32))
    m = FFTDecomposition(64)
    v = m.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("FREQFUSION_MATMUL_DFT", "0")
    dft.use_matmul_dft.cache_clear()
    ref = m.apply(v, x)

    monkeypatch.setenv("FREQFUSION_MATMUL_DFT", "1")
    dft.use_matmul_dft.cache_clear()
    got = m.apply(v, x)
    dft.use_matmul_dft.cache_clear()

    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_fft_loss_same_under_both_paths(monkeypatch):
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))

    monkeypatch.setenv("FREQFUSION_MATMUL_DFT", "0")
    dft.use_matmul_dft.cache_clear()
    ref = float(fft_loss(p, t))

    monkeypatch.setenv("FREQFUSION_MATMUL_DFT", "1")
    dft.use_matmul_dft.cache_clear()
    got = float(fft_loss(p, t))
    dft.use_matmul_dft.cache_clear()

    np.testing.assert_allclose(got, ref, rtol=1e-4)
