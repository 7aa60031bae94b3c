"""In-kernel math helpers for Pallas TPU bodies.

The production (relay-side) Mosaic toolchain does not implement the
`erf`/`erfc` lowering that `jax.nn.gelu(approximate=False)` emits
(observed: "Unimplemented primitive in Pallas TPU lowering for
KernelType.TC: erfc" on every fused-kernel probe, MEASURE_r5c). The
locally installed libtpu accepts it — one more case of local AOT
health not implying relay compile health (CLAUDE.md).

`gelu_exact` keeps the exact (erf-based) GELU semantics the fusion
stack standardized on (torch nn.GELU() default, reference
hierarchical_fusion.py / large_kernel_attention.py) using the
Abramowitz & Stegun 7.1.26 rational-exp approximation of erf, built
from primitives every Mosaic generation lowers (mul/add/div/exp):

    erf(x) = 1 - (a1 t + a2 t^2 + ... + a5 t^5) exp(-x^2),
    t = 1 / (1 + p x),  x >= 0;  odd extension for x < 0.

Max |error| vs true erf is 1.5e-7 in exact arithmetic (~4.3e-7
measured in fp32), so gelu error stays ~1e-6 absolute — invisible at
the kernels' fp32 accumulators and far under the 3e-5 route-parity
test tolerances (pinned by tests/test_kmath.py). Kernel
bodies must call this instead of jax.nn.gelu; XLA fallback routes keep
jax.nn.gelu (XLA lowers erfc everywhere).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["erf_as", "gelu_exact"]

_P = 0.3275911
_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erf_as(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 erf (fp32, |err| <= 1.5e-7)."""
    f32 = jnp.float32
    xf = x.astype(f32)
    ax = jnp.abs(xf)
    t = 1.0 / (1.0 + np.float32(_P) * ax)
    poly = np.float32(_A[4])
    for a in (_A[3], _A[2], _A[1], _A[0]):
        poly = poly * t + np.float32(a)
    e = 1.0 - poly * t * jnp.exp(-ax * ax)
    return jnp.sign(xf) * e


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """0.5 * x * (1 + erf(x / sqrt(2))) without erf/erfc primitives.

    Matches jax.nn.gelu(approximate=False) / torch nn.GELU() to ~3e-7
    absolute; computes in fp32 and returns x.dtype.
    """
    f32 = jnp.float32
    xf = x.astype(f32)
    y = 0.5 * xf * (1.0 + erf_as(xf * np.float32(1.0 / np.sqrt(2.0))))
    return y.astype(x.dtype)
