"""TSD-SR: optional one-step diffusion perceptual refiner (dormant).

The reference ships a TSD-SR wrapper (src/models/tsdsr_wrapper.py, 557 LoC;
src/models/tsdsr/dit.py, 464 LoC) — an SD-2.1-VAE encode -> distilled DiT
student -> decode refinement stage. It is config-disabled in training
(configs/train_config.yaml:85-92, use_during_training: false) and mocked
out entirely in the submission path (io.py:45-54): effectively dormant.

This module preserves the same contract: a refiner with an
``available`` flag and an identity fallback, gated by config exactly like
the reference. A JAX DiT/VAE port is intentionally deferred until the stage
is actually enabled anywhere — porting 1000 LoC of dead code would add
surface without capability.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ["TSDSRRefiner", "TSDSR_AVAILABLE"]

TSDSR_AVAILABLE = False


class TSDSRRefiner:
    """Perceptual refinement stage (identity until weights/port exist).

    Mirrors TSDSRInference's interface (tsdsr_wrapper.py): constructed from
    a config block, applied to the fused SR output after Phase 7b.
    """

    def __init__(self, enabled: bool = False,
                 weight_path: Optional[str] = None,
                 strength: float = 0.3):
        self.enabled = enabled and TSDSR_AVAILABLE
        self.strength = strength
        if enabled and not TSDSR_AVAILABLE:
            print("TSD-SR refiner requested but unavailable — identity "
                  "passthrough (matches the reference's mocked io path)")

    def __call__(self, sr: jnp.ndarray) -> jnp.ndarray:
        return sr
