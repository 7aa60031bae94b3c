"""Training losses: weight-driven multi-component loss with stage hot-swap.

Re-design of src/losses/perceptual_loss.py. Components:

  - L1 / L2 / Charbonnier pixel losses (reference :68-191)
  - SSIM loss, 11x11 Gaussian window (reference :197-291)
  - FFT loss: ortho fft2, fftshift, |.| + 0.1*phase, radial high-frequency
    weighting x2 (reference :506-598)
  - SWT loss: stationary (undecimated) Haar wavelet via dilated depthwise
    convs, band weights a/h/v/d = 0.5/1.5/1.5/2.0, level 2 (reference
    :605-849 — CombinedLoss instantiates wavelet='haar', level=2,
    use_gpu_approximation=True at :1137-1141)
  - Edge/Sobel gradient loss (reference :996-1047)

CombinedLoss is "purely weight-driven" like the reference (:1228-1231):
a component is only computed when its weight > 0, and ``set_weights``
hot-swaps the stage curriculum. Weights are static per trace, so each loss
stage compiles to its own lean XLA program.

VGG/CLIP perceptual components are config-disabled in the reference's
training recipe (train_config.yaml:201-210, all stage weights 0); here they
are pluggable callables (``extra_components``) rather than baked-in torch
model downloads.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "l1_loss", "l2_loss", "charbonnier_loss", "ssim_loss", "fft_loss",
    "swt_loss", "edge_loss", "CombinedLoss",
]


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((pred - target) ** 2).mean()


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     eps: float = 1e-6) -> jnp.ndarray:
    return jnp.sqrt((pred - target) ** 2 + eps * eps).mean()


def _gaussian_window_np(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise(x: jnp.ndarray, k2d: jnp.ndarray, pad: int,
               dilation: int = 1) -> jnp.ndarray:
    c = x.shape[-1]
    kernel = jnp.tile(k2d[:, :, None, None], (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def ssim_loss(pred: jnp.ndarray, target: jnp.ndarray,
              window_size: int = 11) -> jnp.ndarray:
    """1 - mean SSIM, Gaussian window, SAME padding."""
    win = jnp.asarray(_gaussian_window_np(window_size))
    p = window_size // 2

    def blur(x):
        return _depthwise(x, win, p)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = blur(pred), blur(target)
    s1 = blur(pred * pred) - mu1 ** 2
    s2 = blur(target * target) - mu2 ** 2
    s12 = blur(pred * target) - mu1 * mu2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return 1.0 - ssim_map.mean()


def _radial_weights_np(h: int, w: int, high_freq_weight: float) -> np.ndarray:
    cy, cx = h // 2, w // 2
    y = np.arange(h, dtype=np.float32) - cy
    x = np.arange(w, dtype=np.float32) - cx
    yy, xx = np.meshgrid(y, x, indexing="ij")
    dist = np.sqrt(xx ** 2 + yy ** 2)
    dist_norm = dist / math.sqrt(cy ** 2 + cx ** 2)
    return (1.0 + (high_freq_weight - 1.0) * dist_norm).astype(np.float32)


def fft_loss(pred: jnp.ndarray, target: jnp.ndarray,
             high_freq_weight: float = 2.0) -> jnp.ndarray:
    """L1 on centered ortho-FFT magnitude (+0.1*phase), radially weighted."""
    h, w = pred.shape[1], pred.shape[2]
    from ..ops.dft import fft2_ortho, use_matmul_dft

    if use_matmul_dft():
        # TPU: runtime FFT is size-dependent; matmul-DFT (ops/dft.py) is
        # exact and cheap at training-patch scale.
        def spectrum(x):
            re, im = fft2_ortho(x)
            re = jnp.fft.fftshift(re, axes=(1, 2))
            im = jnp.fft.fftshift(im, axes=(1, 2))
            return jnp.sqrt(re * re + im * im + 1e-24), jnp.arctan2(im, re)

        pm, pp = spectrum(pred)
        tm, tp = spectrum(target)
    else:
        pf = jnp.fft.fftshift(jnp.fft.fft2(pred, axes=(1, 2), norm="ortho"),
                              axes=(1, 2))
        tf = jnp.fft.fftshift(jnp.fft.fft2(target, axes=(1, 2), norm="ortho"),
                              axes=(1, 2))
        pm, pp = jnp.abs(pf), jnp.angle(pf)
        tm, tp = jnp.abs(tf), jnp.angle(tf)
    weights = jnp.asarray(_radial_weights_np(h, w, high_freq_weight))[None, :, :, None]
    mag = jnp.abs(pm - tm) * weights
    phase = jnp.abs(pp - tp) * weights
    return mag.mean() + 0.1 * phase.mean()


# Haar decomposition filters (pywt 'haar' dec_lo / dec_hi).
_HAAR_LO = np.array([0.7071067811865476, 0.7071067811865476], dtype=np.float32)
_HAAR_HI = np.array([-0.7071067811865476, 0.7071067811865476], dtype=np.float32)

_SWT_BAND_WEIGHTS = {"a": 0.5, "h": 1.5, "v": 1.5, "d": 2.0}


def _swt_filters_np() -> np.ndarray:
    """[4, k, k] 2-D Haar filters ordered (A, H, V, D).

    Outer-product construction matches the reference (:671-678): band filters
    F[i, j] = col[i] * row[j] with (col,row) = (lo,lo), (hi,lo), (lo,hi),
    (hi,hi) for A/H/V/D respectively.
    """
    ll = np.outer(_HAAR_LO, _HAAR_LO)
    lh = np.outer(_HAAR_HI, _HAAR_LO)   # hi along rows (height)
    hl = np.outer(_HAAR_LO, _HAAR_HI)
    hh = np.outer(_HAAR_HI, _HAAR_HI)
    return np.stack([ll, lh, hl, hh]).astype(np.float32)


def _swt_level(x: jnp.ndarray, level: int) -> Tuple[jnp.ndarray, ...]:
    """One undecimated wavelet level via dilated depthwise conv, NHWC.

    Reflect padding and top-left crop match the reference's GPU
    approximation exactly (perceptual_loss.py:698-733)."""
    filters = _swt_filters_np()
    k = filters.shape[-1]
    dilation = 2 ** level
    pad = (k - 1) * dilation
    h, w = x.shape[1], x.shape[2]
    c = x.shape[-1]
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    # One grouped conv producing 4 subbands per channel: kernel [k, k, 1, 4c]
    kern = jnp.asarray(np.transpose(filters, (1, 2, 0)))  # [k, k, 4]
    kern = jnp.tile(kern[:, :, None, :], (1, 1, 1, c)).reshape(k, k, 1, 4 * c)
    out = lax.conv_general_dilated(
        xp, kern, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    out = out[:, :h, :w, :].reshape(out.shape[0], h, w, c, 4)
    return tuple(out[..., i] for i in range(4))


def swt_loss(pred: jnp.ndarray, target: jnp.ndarray,
             levels: int = 2,
             band_weights: Optional[Dict[str, float]] = None) -> jnp.ndarray:
    bw = band_weights or _SWT_BAND_WEIGHTS
    loss = 0.0
    cur_p, cur_t = pred, target
    for level in range(levels):
        pa, ph, pv, pd = _swt_level(cur_p, level)
        ta, th, tv, td = _swt_level(cur_t, level)
        loss = loss + bw["a"] * jnp.abs(pa - ta).mean()
        loss = loss + bw["h"] * jnp.abs(ph - th).mean()
        loss = loss + bw["v"] * jnp.abs(pv - tv).mean()
        loss = loss + bw["d"] * jnp.abs(pd - td).mean()
        cur_p, cur_t = pa, ta
    return loss / levels


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)


def edge_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Sobel-gradient L1 (reference :996-1047)."""
    sx, sy = jnp.asarray(_SOBEL_X), jnp.asarray(_SOBEL_Y)
    loss_x = jnp.abs(_depthwise(pred, sx, 1) - _depthwise(target, sx, 1)).mean()
    loss_y = jnp.abs(_depthwise(pred, sy, 1) - _depthwise(target, sy, 1)).mean()
    return loss_x + loss_y


class CombinedLoss:
    """Weight-driven multi-loss; components computed only when weight > 0."""

    COMPONENTS = ("l1", "charbonnier", "l2", "ssim", "edge", "fft", "swt")

    def __init__(self,
                 weights: Optional[Dict[str, float]] = None,
                 charbonnier_eps: float = 1e-6,
                 ssim_window: int = 11,
                 swt_levels: int = 2,
                 extra_components: Optional[
                     Dict[str, Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]]] = None):
        self.weights: Dict[str, float] = {k: 0.0 for k in self.COMPONENTS}
        if weights:
            self.weights.update(weights)
        self.charbonnier_eps = charbonnier_eps
        self.ssim_window = ssim_window
        self.swt_levels = swt_levels
        self.extra_components = dict(extra_components or {})

    def set_weights(self, weights: Dict[str, float]) -> None:
        """Hot-swap stage weights (reference :1177-1201)."""
        for name, w in weights.items():
            self.weights[name] = float(w)

    def get_active_weights(self) -> Dict[str, float]:
        return {k: v for k, v in self.weights.items() if v > 0}

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 return_components: bool = False):
        comps: Dict[str, jnp.ndarray] = {}
        w = self.weights
        if w.get("l1", 0) > 0:
            comps["l1"] = l1_loss(pred, target)
        if w.get("charbonnier", 0) > 0:
            comps["charbonnier"] = charbonnier_loss(pred, target,
                                                    self.charbonnier_eps)
        if w.get("l2", 0) > 0:
            comps["l2"] = l2_loss(pred, target)
        if w.get("ssim", 0) > 0:
            comps["ssim"] = ssim_loss(pred, target, self.ssim_window)
        if w.get("edge", 0) > 0:
            comps["edge"] = edge_loss(pred, target)
        if w.get("fft", 0) > 0:
            comps["fft"] = fft_loss(pred, target)
        if w.get("swt", 0) > 0:
            comps["swt"] = swt_loss(pred, target, self.swt_levels)
        for name, fn in self.extra_components.items():
            if w.get(name, 0) > 0:
                comps[name] = fn(pred, target)

        total = sum((w[name] * value for name, value in comps.items()),
                    jnp.asarray(0.0, jnp.float32))
        if return_components:
            return total, comps
        return total
