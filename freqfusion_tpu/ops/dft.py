"""DFT as matmuls (MXU-native, backend-independent).

The TPU runtime's FFT custom-call is size-dependent — ``jnp.fft.rfft2``
compiles at some shapes (336x512) and returns UNIMPLEMENTED at others
(48x64). The fusion network's Phase-2 FFT path must run at arbitrary
padded LR shapes, so on TPU it uses an explicit real-arithmetic DFT:
1-D transforms as dense [N, K] cos/sin matmuls along H then W. At LR
scale (<= ~512 per side) this costs ~1 GFLOP — noise next to the experts
— and is numerically exact (matches jnp.fft to ~1e-5, pinned by tests).

Layout: NHWC real input; spectra carried as (real, imag) pairs with the
rfft half-spectrum K = W//2 + 1 on the W axis. norm='ortho' throughout,
matching FFTDecomposition (multi_domain_frequency.py:306-385).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["rfft2_ortho", "irfft2_ortho", "fft2_ortho", "use_matmul_dft"]


@functools.lru_cache(maxsize=1)
def use_matmul_dft() -> bool:
    import os

    env = os.environ.get("FREQFUSION_MATMUL_DFT")
    if env is not None:
        return env not in ("0", "false", "False")
    import jax

    return jax.default_backend() in ("tpu", "axon")


@functools.lru_cache(maxsize=32)
def _dft_mats_np(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin matrices: M[j, k] = cos/sin(2*pi*j*k/n), float32 [n, n]."""
    j = np.arange(n)[:, None].astype(np.float64)
    k = np.arange(n)[None, :].astype(np.float64)
    theta = 2.0 * np.pi * j * k / n
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _irfft_w_mats_np(w: int) -> Tuple[np.ndarray, np.ndarray]:
    """[K, W] matrices M_r, M_i with x = Xr @ M_r + Xi @ M_i for the
    inverse rfft along W (ortho), folding Hermitian symmetry in."""
    k_count = w // 2 + 1
    kk = np.arange(k_count)[:, None].astype(np.float64)
    ww = np.arange(w)[None, :].astype(np.float64)
    theta = 2.0 * np.pi * kk * ww / w
    mult = np.full((k_count, 1), 2.0)
    mult[0] = 1.0
    if w % 2 == 0:
        mult[-1] = 1.0
    scale = 1.0 / np.sqrt(w)
    m_r = (mult * np.cos(theta) * scale).astype(np.float32)
    m_i = (-mult * np.sin(theta) * scale).astype(np.float32)
    return m_r, m_i


def rfft2_ortho(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC real -> (re, im) each [B, H, W//2+1, C], norm='ortho'."""
    b, h, w, c = x.shape
    k = w // 2 + 1
    cw, sw = _dft_mats_np(w)
    cwj = jnp.asarray(cw[:, :k])
    swj = jnp.asarray(sw[:, :k])
    xr = jnp.einsum("bhwc,wk->bhkc", x, cwj,
                    preferred_element_type=jnp.float32)
    xi = -jnp.einsum("bhwc,wk->bhkc", x, swj,
                     preferred_element_type=jnp.float32)

    ch, sh = _dft_mats_np(h)
    chj = jnp.asarray(ch)
    shj = jnp.asarray(sh)
    # exp(-i theta): (xr + i xi)(cos - i sin)
    yr = (jnp.einsum("bhkc,hm->bmkc", xr, chj,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bhkc,hm->bmkc", xi, shj,
                       preferred_element_type=jnp.float32))
    yi = (jnp.einsum("bhkc,hm->bmkc", xi, chj,
                     preferred_element_type=jnp.float32)
          - jnp.einsum("bhkc,hm->bmkc", xr, shj,
                       preferred_element_type=jnp.float32))
    scale = 1.0 / np.sqrt(h * w)
    return yr * scale, yi * scale


def irfft2_ortho(yr: jnp.ndarray, yi: jnp.ndarray,
                 s: Tuple[int, int]) -> jnp.ndarray:
    """(re, im) half-spectra [B, H, K, C] -> real NHWC [B, H, W, C]."""
    h, w = s
    ch, sh = _dft_mats_np(h)
    chj = jnp.asarray(ch)
    shj = jnp.asarray(sh)
    # inverse along H: exp(+i theta), ortho 1/sqrt(H)
    xr = (jnp.einsum("bmkc,mh->bhkc", yr, chj,
                     preferred_element_type=jnp.float32)
          - jnp.einsum("bmkc,mh->bhkc", yi, shj,
                       preferred_element_type=jnp.float32)) / np.sqrt(h)
    xi = (jnp.einsum("bmkc,mh->bhkc", yi, chj,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bmkc,mh->bhkc", yr, shj,
                       preferred_element_type=jnp.float32)) / np.sqrt(h)

    m_r, m_i = _irfft_w_mats_np(w)
    out = (jnp.einsum("bhkc,kw->bhwc", xr, jnp.asarray(m_r),
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhkc,kw->bhwc", xi, jnp.asarray(m_i),
                        preferred_element_type=jnp.float32))
    return out


def fft2_ortho(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-spectrum fft2 of real NHWC input -> (re, im) [B, H, W, C]."""
    b, h, w, c = x.shape
    cw, sw = _dft_mats_np(w)
    xr = jnp.einsum("bhwc,wk->bhkc", x, jnp.asarray(cw),
                    preferred_element_type=jnp.float32)
    xi = -jnp.einsum("bhwc,wk->bhkc", x, jnp.asarray(sw),
                     preferred_element_type=jnp.float32)
    ch, sh = _dft_mats_np(h)
    chj, shj = jnp.asarray(ch), jnp.asarray(sh)
    yr = (jnp.einsum("bhkc,hm->bmkc", xr, chj,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bhkc,hm->bmkc", xi, shj,
                       preferred_element_type=jnp.float32))
    yi = (jnp.einsum("bhkc,hm->bmkc", xi, chj,
                     preferred_element_type=jnp.float32)
          - jnp.einsum("bhkc,hm->bmkc", xr, shj,
                       preferred_element_type=jnp.float32))
    scale = 1.0 / np.sqrt(h * w)
    return yr * scale, yi * scale
