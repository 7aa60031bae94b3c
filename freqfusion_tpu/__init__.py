"""FreqFusionSR-TPU: a TPU-native (JAX/XLA/Pallas) super-resolution framework.

Brand-new implementation with the capabilities of the PyTorch reference
"FreqFusionSR" (Nikhil-AI-Labs/Image-Super-Resolution, NTIRE 2026 x4 SR):
four frozen pretrained experts (DRCT-L, GRL-B, NAFNet-SIDD-64, MambaIR)
feeding a ~1.2M-parameter 7-phase frequency-guided fusion network.

Design stance (TPU-first, not a port):
  - Functional core: every model is ``init(rng, cfg) -> params`` plus
    ``apply(params, x) -> (sr, features)``. Experts return their features
    explicitly instead of the reference's forward-hook capture
    (reference: src/models/expert_loader.py:499-570).
  - NHWC data layout everywhere (TPU-native conv layout).
  - Whole fusion pipeline compiles as one jitted XLA program.
  - Parallelism: 1-D data mesh via jax.sharding + jit; psum'd metrics.
"""

__version__ = "0.1.0"
