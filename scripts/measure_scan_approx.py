"""Measure the gated approximate chain scan (VERDICT-r2 item 9) in-model.

Runs full-geometry MambaIR at 336x512 bf16 twice — exact chain scan vs
FREQFUSION_SCAN_APPROX=1 (independent zero-init chains) — and reports
wall time plus self-PSNR between the two SR outputs.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.models.pipeline import build_expert_models

    m = build_expert_models(4, use_scan=True)["mamba"]
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (1, 336, 512, 3))
                     .astype(np.float32)).astype(jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
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
