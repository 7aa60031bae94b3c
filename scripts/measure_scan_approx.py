"""Measure the gated approximate chain scan (VERDICT-r2 item 9) in-model.

Runs full-geometry MambaIR twice — exact chain scan vs
FREQFUSION_SCAN_APPROX=1 (independent zero-init chains) — and reports
wall time plus self-PSNR between the two SR outputs.

Default: random-init params at 336x512 bf16 (the round-3 receipt).
--converted (VERDICT-r3 item 7): CONVERTED full-geometry weights — the
torch reference model's own initializer scales through convert_mambair,
the closest thing to trained weights this environment allows — so the
sensitivity number is no longer random-init-only. Use --hw/--ww to size
the crop (CPU runs want a small one; chain boundaries appear whenever
L > 8*chain so even 64x64 crosses many).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _converted_params():
    """Full-geometry MambaIR weights via the torch reference + converter
    (torch-init scales, real 180-dim/6x6 geometry)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    import torch
    from test_mambair_parity import _load_ref_mambair

    from freqfusion_tpu.convert.mambair import convert_mambair
    from freqfusion_tpu.models.pipeline import restack_params_for_scan

    mod = _load_ref_mambair()
    torch.manual_seed(0)
    tm = mod.MambaIR(upscale=4, in_chans=3, img_size=64, embed_dim=180,
                     depths=(6,) * 6, d_state=16, mlp_ratio=2.0,
                     img_range=1.0, drop_path_rate=0.0,
                     upsampler="pixelshuffle", resi_connection="1conv")
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    return restack_params_for_scan({"mamba": convert_mambair(sd)})["mamba"]


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--converted", action="store_true")
    ap.add_argument("--hw", type=int, default=336)
    ap.add_argument("--ww", type=int, default=512)
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.models.pipeline import build_expert_models

    m = build_expert_models(4, use_scan=True)["mamba"]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    lr = jnp.asarray(rng.uniform(0, 1, (1, args.hw, args.ww, 3))
                     .astype(np.float32)).astype(dt)
    if args.converted:
        params = _converted_params()
    else:
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if a.dtype == jnp.float32 else a, params)

    outs = {}
    for mode in ("exact", "approx"):
        os.environ["FREQFUSION_SCAN_APPROX"] = "1" if mode == "approx" else "0"
        fwd = jax.jit(lambda p, x: m.apply(p, x)[0])
        t0 = time.time()
        o = fwd(params, lr)
        float(jnp.sum(o.astype(jnp.float32)))
        print(f"{mode}: compile+first {time.time() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            o = fwd(params, lr)
            float(jnp.sum(o.astype(jnp.float32)))
            ts.append(time.time() - t0)
        outs[mode] = np.asarray(o.astype(jnp.float32))
        print(f"{mode}: {min(ts):.3f} s/img (runs: "
              f"{' '.join(f'{t:.3f}' for t in ts)})", flush=True)

    a, b = outs["exact"], outs["approx"]
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    print(f"self-PSNR exact-vs-approx: {psnr:.2f} dB "
          f"(max|diff| {np.abs(a - b).max():.5f})")


if __name__ == "__main__":
    main()
