"""Phase 2: multi-domain frequency decomposition (DCT + DWT + FFT, 9 bands).

TPU-native re-design of the reference's MultiDomainFrequencyDecomposition
(src/models/multi_domain_frequency.py):

  - DCT: 8x8 block DCT-II expressed as two small batched matmuls per block
    batch (MXU-friendly), zigzag-third masks, learnable per-band scales
    (reference :66-196).
  - DWT: single-level db4 as separable depthwise convs with reflect padding
    and stride 2, subbands resized back to input resolution
    (reference :203-299).
  - FFT: rfft2(norm='ortho') with a learnable radial low-pass mask and
    temperature-sharpened sigmoid (reference :306-385).

Everything is a pure function of the input under jit; XLA fuses the three
branches into one program instead of the reference's eager per-op dispatch.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.pad import pad_reflect
from ...ops.resize import resize_bilinear
from ...ops.conv1x1 import Conv1x1

__all__ = [
    "DCTDecomposition", "DWTDecomposition", "FFTDecomposition",
    "AdaptiveBandFusion", "MultiDomainFrequencyDecomposition",
    "DB4_LO_D", "DB4_HI_D",
]

def _gelu(x):
    """Exact (erf) GELU — torch nn.GELU()'s default, which every fusion
    module in the reference uses (e.g. edge_enhancement.py, 17 sites)."""
    return nn.gelu(x, approximate=False)


# Daubechies-4 decomposition filter coefficients (public wavelet constants;
# same values as pywt's db4 dec_lo/dec_hi used at reference :39-59).
DB4_LO_D = np.array([
    -0.010597401784997278, 0.032883011666982945, 0.030841381835986965,
    -0.18703481171888114, -0.027983769416983849, 0.63088076792959036,
    0.71484657055291582, 0.23037781330885523,
], dtype=np.float32)

DB4_HI_D = np.array([
    -0.23037781330885523, 0.71484657055291582, -0.63088076792959036,
    -0.027983769416983849, 0.18703481171888114, 0.030841381835986965,
    -0.032883011666982945, -0.010597401784997278,
], dtype=np.float32)


@functools.lru_cache(maxsize=8)
def _dct_basis_np(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix D so that Y = D @ X @ D.T."""
    k = np.arange(n)[:, None].astype(np.float64)
    m = np.arange(n)[None, :].astype(np.float64)
    mat = np.sqrt(2.0 / n) * np.cos(np.pi * k * (2 * m + 1) / (2 * n))
    mat[0, :] = np.sqrt(1.0 / n)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _zigzag_band_masks_np(n: int) -> np.ndarray:
    """[3, n, n] low/mid/high masks splitting zigzag order into thirds."""
    order = np.zeros((n, n), dtype=np.int64)
    idx = 0
    for s in range(2 * n - 1):
        diag = [(i, s - i) for i in range(max(0, s - n + 1), min(s, n - 1) + 1)]
        if s % 2 == 0:
            diag = diag[::-1]  # even anti-diagonals traverse bottom-left -> top-right
        for i, j in diag:
            order[i, j] = idx
            idx += 1
    total = n * n
    low = (order < total // 3).astype(np.float32)
    high = (order >= 2 * total // 3).astype(np.float32)
    mid = 1.0 - low - high
    return np.stack([low, mid, high])


class DCTDecomposition(nn.Module):
    """8x8 block DCT-II -> zigzag-third masks -> inverse, 3 output bands."""

    block_size: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        n = self.block_size
        b, h, w, c = x.shape
        ph = (n - h % n) % n
        pw = (n - w % n) % n
        xp = pad_reflect(x, 0, ph, 0, pw) if (ph or pw) else x
        hp, wp = h + ph, w + pw
        nh, nw = hp // n, wp // n

        basis = jnp.asarray(_dct_basis_np(n))
        masks = jnp.asarray(_zigzag_band_masks_np(n))
        band_scale = self.param("band_scale", nn.initializers.ones, (3,))

        # [B, nh, n, nw, n, C] -> [B, nh, nw, C, n, n]
        blocks = xp.reshape(b, nh, n, nw, n, c).transpose(0, 1, 3, 5, 2, 4)
        coeffs = jnp.einsum("ki,...ij,lj->...kl", basis, blocks, basis,
                            preferred_element_type=jnp.float32)

        out = []
        for band in range(3):
            masked = coeffs * masks[band]
            spatial = jnp.einsum("ki,...kl,lj->...ij", basis, masked, basis,
                                 preferred_element_type=jnp.float32)
            img = spatial.transpose(0, 1, 4, 2, 5, 3).reshape(b, hp, wp, c)
            out.append((img[:, :h, :w, :] * band_scale[band]
                        ).astype(x.dtype))
        return out


def _dwt_conv(x: jnp.ndarray, filt: np.ndarray, axis: str) -> jnp.ndarray:
    """Depthwise stride-2 1-D wavelet conv along rows or cols (NHWC)."""
    c = x.shape[-1]
    k = len(filt)
    filt_j = jnp.asarray(filt).astype(x.dtype)  # follow the compute dtype
    if axis == "w":
        kernel = jnp.tile(filt_j.reshape(1, k, 1, 1), (1, 1, 1, c))
        strides, pad = (1, 2), [(0, 0), (0, 0)]
        x = pad_reflect(x, 0, 0, k - 1, k - 1)
    else:
        kernel = jnp.tile(filt_j.reshape(k, 1, 1, 1), (1, 1, 1, c))
        strides, pad = (2, 1), [(0, 0), (0, 0)]
        x = pad_reflect(x, k - 1, k - 1, 0, 0)
    return lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


class DWTDecomposition(nn.Module):
    """Single-level separable db4 DWT; 4 subbands resized back to (H, W)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        _, h, w, _ = x.shape
        subband_scale = self.param("subband_scale", nn.initializers.ones, (4,))

        lo_rows = _dwt_conv(x, DB4_LO_D, "w")
        hi_rows = _dwt_conv(x, DB4_HI_D, "w")
        ll = _dwt_conv(lo_rows, DB4_LO_D, "h")
        lh = _dwt_conv(lo_rows, DB4_HI_D, "h")
        hl = _dwt_conv(hi_rows, DB4_LO_D, "h")
        hh = _dwt_conv(hi_rows, DB4_HI_D, "h")

        return [resize_bilinear(sb, h, w) * subband_scale[i]
                for i, sb in enumerate([ll, lh, hl, hh])]


def _radial_lowpass_logits(size: int) -> np.ndarray:
    coords = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    yy, xx = np.meshgrid(coords, coords, indexing="ij")
    radius = np.sqrt(xx ** 2 + yy ** 2)
    return (3.0 * (0.5 - radius))[None, :, :, None]  # [1, s, s, 1]


class FFTDecomposition(nn.Module):
    """rfft2 with a learnable soft low-pass mask; 2 output bands."""

    init_mask_size: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        h, w = x.shape[1], x.shape[2]
        # FFT stays fp32 regardless of the network compute dtype (rfft
        # rejects bf16, and spectral precision is worth the few MB)
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        logits = self.param(
            "freq_mask_logits",
            lambda rng: jnp.asarray(_radial_lowpass_logits(self.init_mask_size)))
        temperature = self.param("temperature",
                                 lambda rng: jnp.asarray(5.0, jnp.float32))
        band_scale = self.param("band_scale", nn.initializers.ones, (2,))

        from ...ops.dft import irfft2_ortho, rfft2_ortho, use_matmul_dft
        if use_matmul_dft():
            # TPU: the runtime FFT custom-call is size-dependent
            # (UNIMPLEMENTED at e.g. 48x64); the matmul-DFT is exact and
            # ~1 GFLOP at LR scale (ops/dft.py).
            yr, yi = rfft2_ortho(x)
            h_fft, w_fft = yr.shape[1], yr.shape[2]
            mask = resize_bilinear(logits, h_fft, w_fft)
            mask = nn.sigmoid(mask * jnp.maximum(temperature, 1.0))
            low = irfft2_ortho(yr * mask, yi * mask, (h, w))
            high = irfft2_ortho(yr * (1.0 - mask), yi * (1.0 - mask), (h, w))
        else:
            x_fft = jnp.fft.rfft2(x, axes=(1, 2), norm="ortho")
            h_fft, w_fft = x_fft.shape[1], x_fft.shape[2]
            mask = resize_bilinear(logits, h_fft, w_fft)
            mask = nn.sigmoid(mask * jnp.maximum(temperature, 1.0))
            low = jnp.fft.irfft2(x_fft * mask, s=(h, w), axes=(1, 2),
                                 norm="ortho")
            high = jnp.fft.irfft2(x_fft * (1.0 - mask), s=(h, w),
                                  axes=(1, 2), norm="ortho")
        return [(low * band_scale[0]).astype(in_dtype),
                (high * band_scale[1]).astype(in_dtype)]


class AdaptiveBandFusion(nn.Module):
    """Optional 9->3 gated band compression (reference :415-526).

    Disabled in the canonical v2 pipeline (enhanced_fusion_v2.py:528-531)
    but part of the component inventory; kept for parity.
    """

    num_bands: int = 9
    out_bands: int = 3

    @nn.compact
    def __call__(self, bands: List[jnp.ndarray]) -> List[jnp.ndarray]:
        assert len(bands) == self.num_bands
        in_ch = bands[0].shape[-1]
        dct_imp = self.param("dct_importance",
                             lambda rng: jnp.ones((3,), jnp.float32))
        dwt_imp = self.param("dwt_importance",
                             lambda rng: jnp.full((4,), 0.8, jnp.float32))
        fft_imp = self.param("fft_importance",
                             lambda rng: jnp.full((2,), 0.6, jnp.float32))
        importance = jnp.concatenate([
            nn.softplus(dct_imp), nn.softplus(dwt_imp), nn.softplus(fft_imp)])
        importance = importance / (importance.sum() + 1e-8)

        weighted = []
        for i, band in enumerate(bands):
            att = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                          name=f"band_attention_{i}")(band)
            weighted.append(band * nn.sigmoid(att) * importance[i])
        concat = jnp.concatenate(weighted, axis=-1)

        hidden = 64
        out_ch = self.out_bands * in_ch
        t = Conv1x1(hidden, name="fusion_transform_0")(concat)
        t = Conv1x1(out_ch, name="fusion_transform_2")(_gelu(t))
        g = Conv1x1(hidden, name="fusion_gate_0")(concat)
        g = nn.sigmoid(Conv1x1(out_ch, name="fusion_gate_2")(_gelu(g)))
        fused = t * g

        dct_concat = jnp.concatenate(bands[:3], axis=-1)
        fused = fused + 0.3 * Conv1x1(out_ch, name="dct_residual")(dct_concat)
        return list(jnp.split(fused, self.out_bands, axis=-1))


class MultiDomainFrequencyDecomposition(nn.Module):
    """DCT(3) + DWT(4) + FFT(2) = 9 raw bands; optional 9->3 fusion."""

    block_size: int = 8
    fft_mask_size: int = 64
    enable_fusion: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_raw_bands: bool = True
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        raw = (DCTDecomposition(self.block_size, name="dct")(x)
               + DWTDecomposition(name="dwt")(x)
               + FFTDecomposition(self.fft_mask_size, name="fft")(x))
        if self.enable_fusion:
            fused = AdaptiveBandFusion(name="band_fusion")(raw)
        else:
            fused = raw[:3]
        return (fused, raw) if return_raw_bands else (fused, None)


@functools.lru_cache(maxsize=8)
def _zigzag_order_norm_np(n: int) -> np.ndarray:
    """Normalized zigzag order matrix in [0, 1] (enhanced_fusion_v2.py:78-92)."""
    order = np.zeros((n, n), dtype=np.float64)
    i = j = 0
    for idx in range(n * n):
        order[i, j] = idx
        if (i + j) % 2 == 0:
            if j == n - 1:
                i += 1
            elif i == 0:
                j += 1
            else:
                i -= 1
                j += 1
        else:
            if i == n - 1:
                j += 1
            elif j == 0:
                i += 1
            else:
                i += 1
                j -= 1
    return (order / (n * n - 1)).astype(np.float32)


class AdaptiveFrequencyDecomposition(nn.Module):
    """Alternative Phase-2: DCT decomposition with LEARNABLE per-image band
    thresholds (enhanced_fusion_v2.py:39-146). Defined-but-unwired in the
    canonical v2 pipeline, kept for inventory parity: an MLP predicts two
    thresholds from a pooled view of the image; temperature-50 soft sigmoid
    zigzag masks split the spectrum into low/mid/high."""

    block_size: int = 8
    low_range: Tuple[float, float] = (0.15, 0.40)
    high_range: Tuple[float, float] = (0.60, 0.85)
    temperature: float = 50.0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        n = self.block_size
        b, h, w, c = x.shape

        pooled = resize_bilinear(x, 8, 8).reshape(b, -1)  # AdaptiveAvgPool2d(8)~
        t_ = nn.Dense(32, name="threshold_fc1")(pooled)
        t_ = nn.Dense(2, name="threshold_fc2")(nn.relu(t_))
        t_ = nn.sigmoid(t_)
        low_t = t_[:, 0:1] * (self.low_range[1] - self.low_range[0]) + self.low_range[0]
        high_t = t_[:, 1:2] * (self.high_range[1] - self.high_range[0]) + self.high_range[0]

        ph = (n - h % n) % n
        pw = (n - w % n) % n
        xp = pad_reflect(x, 0, ph, 0, pw) if (ph or pw) else x
        hp, wp = h + ph, w + pw
        nh, nw = hp // n, wp // n

        basis = jnp.asarray(_dct_basis_np(n))
        zig = jnp.asarray(_zigzag_order_norm_np(n))[None, None, None, None]

        blocks = xp.reshape(b, nh, n, nw, n, c).transpose(0, 1, 3, 5, 2, 4)
        coeffs = jnp.einsum("ki,...ij,lj->...kl", basis, blocks, basis,
                            preferred_element_type=jnp.float32)

        lt = low_t.reshape(b, 1, 1, 1, 1, 1)
        ht = high_t.reshape(b, 1, 1, 1, 1, 1)
        low_mask = nn.sigmoid(self.temperature * (lt - zig))
        high_mask = nn.sigmoid(self.temperature * (zig - ht))
        mid_mask = jnp.clip(1.0 - low_mask - high_mask, 0.0)

        def to_img(masked):
            spatial = jnp.einsum("ki,...kl,lj->...ij", basis, masked, basis,
                                 preferred_element_type=jnp.float32)
            img = spatial.transpose(0, 1, 4, 2, 5, 3).reshape(b, hp, wp, c)
            return img[:, :h, :w, :]

        return (to_img(coeffs * low_mask), to_img(coeffs * mid_mask),
                to_img(coeffs * high_mask), (low_t, high_t))
