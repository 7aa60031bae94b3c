"""Kernel dispatch: choose Pallas TPU kernels vs XLA reference paths.

Pallas kernels engage automatically on TPU backends; the env var
FREQFUSION_PALLAS=0/1 forces them off/on (tests use interpret mode
explicitly instead).
"""

from __future__ import annotations

import os

__all__ = ["use_pallas"]


def use_pallas() -> bool:
    # Not cached: a process may initialize CPU-first and move to TPU (or
    # flip FREQFUSION_PALLAS); this runs at trace time only, so the
    # backend query cost is irrelevant.
    env = os.environ.get("FREQFUSION_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    import jax
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return platform in ("tpu", "axon")
