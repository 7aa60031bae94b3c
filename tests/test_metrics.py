"""Metric golden tests: PSNR/SSIM under NTIRE conventions."""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from freqfusion_tpu.utils.metrics import psnr, ssim, rgb_to_y, MetricAccumulator


def _torch_psnr_y_crop(img1, img2, crop, y):
    """Independent torch re-derivation of the NTIRE PSNR convention."""
    a = torch.from_numpy(img1).clamp(0, 1)
    b = torch.from_numpy(img2).clamp(0, 1)
    if crop:
        a = a[:, crop:-crop, crop:-crop, :]
        b = b[:, crop:-crop, crop:-crop, :]
    if y:
        def toy(x):
            return (65.481 * x[..., 0] + 128.553 * x[..., 1]
                    + 24.966 * x[..., 2] + 16.0) / 255.0
        a, b = toy(a), toy(b)
    mse = ((a - b) ** 2).mean().item()
    return 10 * math.log10(1.0 / mse)


def test_psnr_matches_convention(rng):
    a = rng.random((1, 32, 32, 3), dtype=np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape, dtype=np.float32), 0, 1)
    want = _torch_psnr_y_crop(a, b, 4, True)
    got = float(psnr(jnp.asarray(a), jnp.asarray(b), crop_border=4,
                     test_y_channel=True))
    assert abs(got - want) < 1e-3


def test_psnr_identical_is_capped():
    a = jnp.ones((1, 16, 16, 3)) * 0.5
    assert float(psnr(a, a)) >= 99.0  # 1e-10 floor -> 100 dB


def test_ssim_properties(rng):
    a = rng.random((1, 48, 48, 3), dtype=np.float32)
    noise = np.clip(a + 0.2 * rng.standard_normal(a.shape, dtype=np.float32), 0, 1)
    s_self = float(ssim(jnp.asarray(a), jnp.asarray(a)))
    s_noisy = float(ssim(jnp.asarray(a), jnp.asarray(noise)))
    assert s_self > 0.999
    assert s_noisy < s_self


def test_ssim_matches_torch_gaussian_window(rng):
    """Cross-check against a direct torch implementation of windowed SSIM."""
    a = rng.random((1, 40, 40, 1), dtype=np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape, dtype=np.float32), 0, 1)

    # torch version (11x11 gaussian, sigma 1.5, same-padding conv)
    win = torch.tensor([math.exp(-(i - 5) ** 2 / (2 * 1.5 ** 2)) for i in range(11)])
    win = win / win.sum()
    w2 = (win[:, None] @ win[None, :])[None, None]
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    mu1 = F.conv2d(ta, w2, padding=5)
    mu2 = F.conv2d(tb, w2, padding=5)
    s1 = F.conv2d(ta * ta, w2, padding=5) - mu1 ** 2
    s2 = F.conv2d(tb * tb, w2, padding=5) - mu2 ** 2
    s12 = F.conv2d(ta * tb, w2, padding=5) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    want = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean().item()

    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-4


def test_rgb_to_y_range():
    white = jnp.ones((1, 4, 4, 3))
    y = rgb_to_y(white)
    np.testing.assert_allclose(np.asarray(y), (65.481 + 128.553 + 24.966 + 16) / 255.0,
                               rtol=1e-5)


def test_metric_accumulator():
    acc = MetricAccumulator()
    acc.update(psnr=30.0, ssim=0.9)
    acc.update(psnr=32.0, ssim=0.8)
    acc.update(psnr=float("inf"))  # skipped like the reference's batch mean
    avg = acc.averages()
    assert avg["psnr"] == 31.0 and abs(avg["ssim"] - 0.85) < 1e-9
