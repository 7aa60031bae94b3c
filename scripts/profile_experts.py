"""Per-expert TPU timing harness (dev tool).

Times each frozen expert's forward at a DIV2K-val-class LR shape on the
real chip, optionally in bf16. Forces materialization (float(jnp.sum)) —
block_until_ready does not synchronize the axon relay.

Usage: python scripts/profile_experts.py [expert ...] [--dtype bf16]
       [--hw H] [--ww W] [--iters N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("experts", nargs="*",
                    default=["nafnet", "grl", "drct", "mamba"])
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--hw", type=int, default=336)
    ap.add_argument("--ww", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.models.pipeline import build_expert_models

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    h, w = args.hw, args.ww
    mp = args.batch * h * w * 16 / 1e6  # HR megapixels per call (x4)

    models = build_expert_models(4, use_scan=True)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (args.batch, h, w, 3))
                     .astype(np.float32)).astype(dtype)

    def fake_params(model):
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3), jnp.float32))
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, dtype), shapes)

    for name in args.experts:
        model = models[name]
        params = fake_params(model)
        fwd = jax.jit(lambda p, x, m=model: m.apply(p, x)[0])
        t0 = time.perf_counter()
        float(jnp.sum(fwd(params, lr).astype(jnp.float32)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(jnp.sum(fwd(params, lr).astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:8s} {args.dtype}: {dt:.3f} s/call  "
              f"{mp / dt:.2f} MP/s  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
