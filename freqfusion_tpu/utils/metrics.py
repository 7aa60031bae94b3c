"""NTIRE-convention PSNR/SSIM metrics (Y channel, crop border).

Semantics match the reference evaluation stack (src/utils/metrics.py:30-186,
utils/utils_image.py:148): ITU-R BT.601 Y conversion, crop_border=4 for x4,
clamp to [0,1] first, Gaussian-window SSIM (11x11, sigma 1.5, C1/C2 from
K1=0.01/K2=0.03). All jnp, NHWC layout, jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rgb_to_y", "psnr", "ssim", "psnr_ssim", "MetricAccumulator"]


def rgb_to_y(img: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma. img: [..., H, W, 3] in [0,1] -> [..., H, W, 1]."""
    r, g, b = img[..., 0:1], img[..., 1:2], img[..., 2:3]
    y = 65.481 * r + 128.553 * g + 24.966 * b + 16.0
    return y / 255.0


def _prep(img1: jnp.ndarray, img2: jnp.ndarray, crop_border: int, test_y_channel: bool):
    img1 = jnp.clip(img1, 0.0, 1.0)
    img2 = jnp.clip(img2, 0.0, 1.0)
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    if crop_border > 0:
        img1 = img1[:, crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel and img1.shape[-1] == 3:
        img1, img2 = rgb_to_y(img1), rgb_to_y(img2)
    return img1, img2


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, crop_border: int = 0,
         test_y_channel: bool = False) -> jnp.ndarray:
    """PSNR in dB over the whole (batched) tensor, range [0,1]."""
    img1, img2 = _prep(img1, img2, crop_border, test_y_channel)
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-10))


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), dtype=jnp.float32)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, crop_border: int = 0,
         test_y_channel: bool = False, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM with an 11x11 Gaussian window, SAME padding (torch-conv style)."""
    img1, img2 = _prep(img1, img2, crop_border, test_y_channel)
    c = img1.shape[-1]
    win = _gaussian_window(window_size)
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def blur(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel,
            window_strides=(1, 1),
            padding=[(window_size // 2, window_size // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


def psnr_ssim(sr: jnp.ndarray, hr: jnp.ndarray, crop_border: int = 4,
              test_y_channel: bool = True):
    """Challenge-convention pair (crop 4, Y channel) as jnp scalars."""
    return (psnr(sr, hr, crop_border, test_y_channel),
            ssim(sr, hr, crop_border, test_y_channel))


def psnr_ssim_per_image(sr: jnp.ndarray, hr: jnp.ndarray,
                        crop_border: int = 4,
                        test_y_channel: bool = True,
                        window_size: int = 11):
    """Per-image PSNR/SSIM over a batch — ONE jitted program evaluates a
    whole shape bucket (the reference's per-GPU mp.Process sharding,
    eval.py:189-210, becomes a batch axis)."""
    img1, img2 = _prep(sr, hr, crop_border, test_y_channel)
    mse = jnp.mean((img1 - img2) ** 2, axis=(1, 2, 3))
    p = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-10))

    c = img1.shape[-1]
    win = _gaussian_window(window_size)
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))

    def blur(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel,
            window_strides=(1, 1),
            padding=[(window_size // 2, window_size // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = blur(img1), blur(img2)
    sigma1_sq = blur(img1 * img1) - mu1 * mu1
    sigma2_sq = blur(img2 * img2) - mu2 * mu2
    sigma12 = blur(img1 * img2) - mu1 * mu2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (sigma1_sq + sigma2_sq + c2))
    return p, ssim_map.mean(axis=(1, 2, 3))


class MetricAccumulator:
    """Running averages over a validation epoch (host-side)."""

    def __init__(self):
        self._sums = {}
        self._counts = {}

    def update(self, **metrics):
        for k, v in metrics.items():
            v = float(v)
            if not np.isfinite(v):
                continue
            self._sums[k] = self._sums.get(k, 0.0) + v
            self._counts[k] = self._counts.get(k, 0) + 1

    def averages(self):
        return {k: self._sums[k] / self._counts[k] for k in self._sums}

    def reset(self):
        self._sums.clear()
        self._counts.clear()
