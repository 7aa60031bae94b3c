"""NIQE implementation: AGGD estimator recovery, pristine-model fit,
and ordering sanity (distortions score worse than clean images)."""

import numpy as np
import pytest

from freqfusion_tpu.utils.niqe import (
    _aggd_fit, fit_niqe_params, load_niqe_params, niqe, save_niqe_params,
)


def test_aggd_fit_recovers_symmetric_ggd():
    rng = np.random.default_rng(0)
    # alpha=2 AGGD with equal sides == zero-mean Gaussian
    x = rng.normal(0.0, 0.5, 200_000)
    alpha, sl, sr = _aggd_fit(x)
    assert abs(alpha - 2.0) < 0.1
    assert abs(sl - 0.5) < 0.02 and abs(sr - 0.5) < 0.02


def test_aggd_fit_detects_asymmetry():
    rng = np.random.default_rng(1)
    left = -np.abs(rng.normal(0.0, 1.0, 100_000))
    right = np.abs(rng.normal(0.0, 0.25, 100_000))
    alpha, sl, sr = _aggd_fit(np.concatenate([left, right]))
    assert sl > 2.5 * sr


def _textured(rng, h=192, w=192):
    """Natural-ish pristine stand-in: smooth low-freq base + mid-freq
    texture (pure noise is NOT 'natural' under NSS)."""
    base = rng.normal(0, 1, (h // 8, w // 8))
    base = np.kron(base, np.ones((8, 8)))
    tex = rng.normal(0, 1, (h // 2, w // 2))
    tex = np.kron(tex, np.ones((2, 2)))
    img = 0.5 + 0.15 * base + 0.1 * tex
    return np.clip(img, 0, 1)


def test_niqe_orders_distortions(tmp_path):
    rng = np.random.default_rng(2)
    pristine = [_textured(rng) for _ in range(6)]
    params = fit_niqe_params(pristine)
    assert params["mu"].shape == (36,)
    assert params["cov"].shape == (36, 36)

    clean = _textured(rng)
    blurred = np.asarray(clean)
    from scipy.ndimage import gaussian_filter
    blurred = gaussian_filter(clean, 3.0)

    s_clean = niqe(clean, params)
    s_blur = niqe(blurred, params)
    assert np.isfinite(s_clean) and np.isfinite(s_blur)
    assert s_blur > s_clean, (s_blur, s_clean)

    # save/load roundtrip
    p = tmp_path / "niqe_params.npz"
    save_niqe_params(params, str(p))
    loaded = load_niqe_params(str(p))
    assert np.allclose(loaded["mu"], params["mu"])
    assert abs(niqe(clean, loaded) - s_clean) < 1e-9


def test_niqe_mat_loading(tmp_path):
    from scipy.io import savemat
    mu = np.arange(36, dtype=np.float64)
    cov = np.eye(36)
    p = tmp_path / "niqe_image_params.mat"
    savemat(str(p), {"mu_prisparam": mu[None], "cov_prisparam": cov})
    loaded = load_niqe_params(str(p))
    assert np.allclose(loaded["mu"], mu)
    assert np.allclose(loaded["cov"], cov)


def test_niqe_too_small_raises():
    params = {"mu": np.zeros(36), "cov": np.eye(36)}
    with pytest.raises(ValueError):
        niqe(np.zeros((32, 32)), params)


def test_perceptual_evaluator_native_backends(tmp_path):
    """PerceptualEvaluator computes NIQE (and skips LPIPS cleanly when its
    weights are absent) without pyiqa — the Perception track is exercised
    end to end with native backends."""
    from freqfusion_tpu.utils.perceptual_metrics import (
        PerceptualEvaluator, available_metrics,
    )

    rng = np.random.default_rng(5)
    pristine = [_textured(rng) for _ in range(4)]
    params = fit_niqe_params(pristine)
    p = tmp_path / "niqe.npz"
    save_niqe_params(params, str(p))

    assert "niqe" in available_metrics(niqe_params=str(p))

    ev = PerceptualEvaluator(metrics=["niqe", "lpips"], niqe_params=str(p))
    img = np.repeat(_textured(rng)[..., None], 3, axis=-1).astype(np.float32)
    out = ev(img, img)
    assert "niqe" in out and np.isfinite(out["niqe"])
    assert "lpips" not in out  # no weights, no pyiqa -> cleanly absent
