"""End-to-end HARDWARE quality receipt (round 5).

Every quality receipt so far is either CPU-simulated (the composed bf16
floor in tests/test_full_geometry.py runs the bf16 mode under XLA:CPU)
or hardware-but-relative-to-itself (D2's approx-vs-exact self-PSNR ran
both legs on the chip). This script closes the loop: ONE crop through
the full 4-expert + fusion pipeline at converted full-geometry weights,

  - CPU leg: fp32, exact scan, XLA reference route — the semantics every
    parity test pins against the torch reference
    (/root/reference/src/models/*, /root/reference/src/fusion_*.py);
  - TPU leg: the SHIPPING defaults exactly as bench.py runs them — bf16
    experts + bf16 fusion, approx chain-init v7 scan, Pallas attention
    kernels, the production relay toolchain's compiled program;

and reports the PSNR between the two SR outputs. This is the number that
says "what the chip actually computes matches the parity-pinned
semantics", composing bf16 rounding + approx-scan error + any
kernel/toolchain numerics in one measurement. Expected: ~>= 50 dB
(composed CPU bf16 floor 51 dB x approx 61 dB receipt).

Usage (two processes — the CPU leg must not import the axon backend):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/hw_quality_receipt.py cpu --hw 64 --ww 64
    python scripts/hw_quality_receipt.py tpu --hw 64 --ww 64
    python scripts/hw_quality_receipt.py compare --hw 64 --ww 64
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

OUT = Path("/tmp/hw_quality")


def _lr(hw, ww):
    rng = np.random.default_rng(5)
    return rng.uniform(0, 1, (1, hw, ww, 3)).astype(np.float32)


def _build(expert_dtype, fusion_dtype):
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.models.fusion.fusion_v2 import (
        CompleteEnhancedFusionSR)
    from freqfusion_tpu.models.pipeline import FreqFusionPipeline
    from test_full_geometry import _full_geometry_converted

    params = {}
    for name in ("drct", "grl", "nafnet", "mamba"):
        t0 = time.time()
        params[name] = _full_geometry_converted(name)
        gc.collect()
        print(f"  converted {name} in {time.time() - t0:.0f}s", flush=True)
    fusion = CompleteEnhancedFusionSR(upscale=4)
    feat_ch = FreqFusionPipeline.FEATURE_CHANNELS
    mock_imgs = {k: jnp.zeros((1, 64, 64, 3)) for k in feat_ch}
    mock_feats = {k: jnp.zeros((1, 16, 16, c)) for k, c in feat_ch.items()}
    params["fusion"] = fusion.init(
        jax.random.PRNGKey(9), jnp.zeros((1, 16, 16, 3), jnp.float32),
        mock_imgs, mock_feats)
    return FreqFusionPipeline(params, scale=4, fusion_model=fusion,
                              use_scan=True, jit_mode="per_expert",
                              expert_dtype=expert_dtype,
                              fusion_dtype=fusion_dtype)


def leg(which, hw, ww):
    import jax.numpy as jnp
    OUT.mkdir(exist_ok=True)
    lr = _lr(hw, ww)
    if which == "cpu":
        os.environ["FREQFUSION_SCAN_APPROX"] = "0"  # exact S6 semantics
        pipe = _build(None, None)
    else:  # shipping defaults: bench.py's bf16 mode, approx-on-TPU default
        pipe = _build(jnp.bfloat16, jnp.bfloat16)
    t0 = time.time()
    sr = np.asarray(pipe(jnp.asarray(lr)), np.float32)
    print(f"  {which} leg ran in {time.time() - t0:.0f}s "
          f"(incl. compile), sr {sr.shape}", flush=True)
    assert np.isfinite(sr).all()
    np.save(OUT / f"sr_{which}_{hw}x{ww}.npy", sr)


def compare(hw, ww):
    a = np.load(OUT / f"sr_cpu_{hw}x{ww}.npy")
    b = np.load(OUT / f"sr_tpu_{hw}x{ww}.npy")
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    wc = 10 * np.log10(1.0 + 10 ** ((35.0 - psnr) / 10.0))
    print(json.dumps({
        "receipt": "hw_vs_cpu_end_to_end_psnr", "lr_crop": [hw, ww],
        "psnr_db": round(psnr, 2), "max_abs": float(np.abs(a - b).max()),
        "worst_case_delta_at_35db": round(wc, 4)}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["cpu", "tpu", "compare"])
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--ww", type=int, default=64)
    args = ap.parse_args()
    if args.which == "compare":
        compare(args.hw, args.ww)
    else:
        leg(args.which, args.hw, args.ww)
