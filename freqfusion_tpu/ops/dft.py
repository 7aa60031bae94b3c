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


def _dft_mats_jnp(n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin matrices M[j, k] = cos/sin(2*pi*j*k/n), [n, n], computed
    ON DEVICE from iota. Embedding them as numpy literals bloats the HLO
    (several MB of constants per shape) past the remote-compile relay's
    request limit; computing from iota adds negligible FLOPs. The DFT
    argument is reduced exactly via (j*k) mod n in int32 before the float
    multiply, so fp32 cos/sin sees angles <= 2*pi (no range-reduction
    error at large n)."""
    import jax

    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    m = (j * k) % n
    theta = m.astype(jnp.float32) * np.float32(2.0 * np.pi / n)
    return jnp.cos(theta), jnp.sin(theta)


def _irfft_w_mats_jnp(w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, W] matrices M_r, M_i with x = Xr @ M_r + Xi @ M_i for the
    inverse rfft along W (ortho, Hermitian symmetry folded in); computed
    on device from iota like _dft_mats_jnp."""
    import jax

    k_count = w // 2 + 1
    kk = jax.lax.broadcasted_iota(jnp.int32, (k_count, w), 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, (k_count, w), 1)
    m = (kk * ww) % w
    theta = m.astype(jnp.float32) * np.float32(2.0 * np.pi / w)
    kk_col = jax.lax.broadcasted_iota(jnp.int32, (k_count, 1), 0)
    mult = jnp.where((kk_col == 0) | ((w % 2 == 0) & (kk_col == k_count - 1)),
                     1.0, 2.0)
    scale = np.float32(1.0 / np.sqrt(w))
    return mult * jnp.cos(theta) * scale, -mult * jnp.sin(theta) * scale


def rfft2_ortho(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC real -> (re, im) each [B, H, W//2+1, C], norm='ortho'."""
    b, h, w, c = x.shape
    k = w // 2 + 1
    cw, sw = _dft_mats_jnp(w)
    cwj = cw[:, :k]
    swj = sw[:, :k]
    xr = jnp.einsum("bhwc,wk->bhkc", x, cwj,
                    preferred_element_type=jnp.float32)
    xi = -jnp.einsum("bhwc,wk->bhkc", x, swj,
                     preferred_element_type=jnp.float32)

    chj, shj = _dft_mats_jnp(h)
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
    chj, shj = _dft_mats_jnp(h)
    # inverse along H: exp(+i theta), ortho 1/sqrt(H)
    xr = (jnp.einsum("bmkc,mh->bhkc", yr, chj,
                     preferred_element_type=jnp.float32)
          - jnp.einsum("bmkc,mh->bhkc", yi, shj,
                       preferred_element_type=jnp.float32)) / np.sqrt(h)
    xi = (jnp.einsum("bmkc,mh->bhkc", yi, chj,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bmkc,mh->bhkc", yr, shj,
                       preferred_element_type=jnp.float32)) / np.sqrt(h)

    m_r, m_i = _irfft_w_mats_jnp(w)
    out = (jnp.einsum("bhkc,kw->bhwc", xr, m_r,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhkc,kw->bhwc", xi, m_i,
                        preferred_element_type=jnp.float32))
    return out


def fft2_ortho(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-spectrum fft2 of real NHWC input -> (re, im) [B, H, W, C]."""
    b, h, w, c = x.shape
    cw, sw = _dft_mats_jnp(w)
    xr = jnp.einsum("bhwc,wk->bhkc", x, cw,
                    preferred_element_type=jnp.float32)
    xi = -jnp.einsum("bhwc,wk->bhkc", x, sw,
                     preferred_element_type=jnp.float32)
    chj, shj = _dft_mats_jnp(h)
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
