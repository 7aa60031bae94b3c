"""Selective-scan kernel micro-benchmark on the real chip (dev tool).

Times selective_scan_pallas at MambaIR's in-model shape (L=H*W at the
336x512 bench bucket, D=360, N=16) across chunk/inner configs, plus the
XLA chunked path for reference. First timed config absorbs relay warmup —
run the list twice and trust the second pass.
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
    ap.add_argument("--l", type=int, default=336 * 512)
    ap.add_argument("--d", type=int, default=360)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunks", default="128,512,1024")
    ap.add_argument("--inners", default="8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.ops.selective_scan import (
        selective_scan, selective_scan_pallas)

    rng = np.random.default_rng(0)
    b, l, d, n = args.b, args.l, args.d, args.n
    u = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    dt = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32) * 0.1)
    A = -jnp.exp(jnp.asarray(rng.uniform(0, 2.7, (d, n)).astype(np.float32)))
    B = jnp.asarray(rng.normal(size=(b, l, n)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(b, l, n)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.zeros((d,), jnp.float32)

    def timeit(fn, label):
        try:
            t0 = time.perf_counter()
            out = fn()
            float(jnp.sum(out))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(jnp.sum(fn()))
            dt_ = (time.perf_counter() - t0) / args.iters
            print(f"{label:40s} {dt_ * 1e3:8.2f} ms  (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{label:40s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    for rep in range(2):
        print(f"--- pass {rep} ---", flush=True)
        for chunk in [int(c) for c in args.chunks.split(",")]:
            for inner in [int(i) for i in args.inners.split(",")]:
                timeit(lambda c=chunk, i=inner: selective_scan_pallas(
                    u, dt, A, B, C, D, bias, chunk=c, inner=i),
                    f"pallas chunk={chunk} inner={inner}")
        timeit(lambda: selective_scan(u, dt, A, B, C, D, delta_bias=bias,
                                      chunk=512), "xla chunk=512")


if __name__ == "__main__":
    main()
