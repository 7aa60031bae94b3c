"""Dev micro-bench: spatial selective-scan kernel variants (round 3).

Measures the in-model shape (row-major leg: [1, 336, 512, 360], N=16) with
K chained kernel calls inside ONE jit (output fed back as input) so the
~26 ms relay overhead and dispatch noise amortize and XLA cannot CSE the
repeats.

Variants:
  base       current selective_scan_pallas_spatial (fp32 out)
  cdtype     y emitted in the compute dtype (bf16 in, bf16 out)
  pad384     D padded 360->384 outside the kernel (lane-aligned slices)
  exp2       decay via exp2 with pre-scaled A
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
    ap.add_argument("--r", type=int, default=336)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--d", type=int, default=360)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--k", type=int, default=8, help="chained calls per jit")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--variants", default="base,cdtype,pad384,exp2")
    ap.add_argument("--reverse", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.ops import selective_scan as ss

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    r, t, d, n = args.r, args.t, args.d, args.n
    u = jnp.asarray(rng.normal(size=(1, r, t, d)).astype(np.float32)).astype(dtype)
    dt = jnp.asarray((rng.normal(size=(1, r, t, d)) * 0.1).astype(np.float32)).astype(dtype)
    A = -jnp.exp(jnp.asarray(rng.uniform(0, 2.7, (d, n)).astype(np.float32)))
    B = jnp.asarray(rng.normal(size=(1, r, t, n)).astype(np.float32)).astype(dtype)
    C = jnp.asarray(rng.normal(size=(1, r, t, n)).astype(np.float32)).astype(dtype)
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.zeros((d,), jnp.float32)
    rev = args.reverse

    def chain(call):
        """K sequential kernel calls, each consuming the previous y."""
        def f(u0):
            y = u0
            for _ in range(args.k):
                y = call(y.astype(dtype))
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(f)

    def base(u0):
        return ss.selective_scan_pallas_spatial(u0, dt, A, B, C, D, bias,
                                                reverse=rev)

    variants = {"base": base}

    if hasattr(ss, "selective_scan_pallas_spatial"):
        import functools
        import inspect
        sig = inspect.signature(ss.selective_scan_pallas_spatial)
        if "out_dtype" in sig.parameters:
            def cdtype(u0):
                return ss.selective_scan_pallas_spatial(
                    u0, dt, A, B, C, D, bias, reverse=rev,
                    out_dtype=dtype)
            variants["cdtype"] = cdtype
        if "use_exp2" in sig.parameters:
            def exp2(u0):
                return ss.selective_scan_pallas_spatial(
                    u0, dt, A, B, C, D, bias, reverse=rev, use_exp2=True)
            variants["exp2"] = exp2
            if "out_dtype" in sig.parameters:
                def exp2c(u0):
                    return ss.selective_scan_pallas_spatial(
                        u0, dt, A, B, C, D, bias, reverse=rev, use_exp2=True,
                        out_dtype=dtype)
                variants["exp2c"] = exp2c

    dp = 384
    up_pad = [(0, 0), (0, 0), (0, 0), (0, dp - d)]

    def pad384(u0):
        u_p = jnp.pad(u0, up_pad)
        dt_p = jnp.pad(dt, up_pad)
        A_p = jnp.pad(A, [(0, dp - d), (0, 0)])
        D_p = jnp.pad(D, [(0, dp - d)])
        b_p = jnp.pad(bias, [(0, dp - d)])
        y = ss.selective_scan_pallas_spatial(u_p, dt_p, A_p, B, C, D_p, b_p,
                                             reverse=rev)
        return y[..., :d]
    variants["pad384"] = pad384

    if "exp2" in variants and "pad384" in args.variants:
        def pad384_exp2(u0):
            u_p = jnp.pad(u0, up_pad)
            dt_p = jnp.pad(dt, up_pad)
            A_p = jnp.pad(A, [(0, dp - d), (0, 0)])
            D_p = jnp.pad(D, [(0, dp - d)])
            b_p = jnp.pad(bias, [(0, dp - d)])
            y = ss.selective_scan_pallas_spatial(
                u_p, dt_p, A_p, B, C, D_p, b_p, reverse=rev, use_exp2=True)
            return y[..., :d]
        variants["pad384_exp2"] = pad384_exp2

    if hasattr(ss, "selective_scan_pallas_chain"):
        # chain variant consumes the TRANSPOSED layout [B, T, R, D] with
        # D padded to 384; build the transposed inputs once outside.
        dp_ = 384
        pad_last = [(0, 0), (0, 0), (0, 0), (0, dp_ - d)]
        u_t = jnp.pad(u.transpose(0, 2, 1, 3), pad_last)      # [B, T, R, Dp]
        dt_t = jnp.pad(dt.transpose(0, 2, 1, 3), pad_last)
        b_t = B.transpose(0, 2, 1, 3)
        c_t = C.transpose(0, 2, 1, 3)
        A_p = jnp.pad(A, [(0, dp_ - d), (0, 0)])
        D_p = jnp.pad(D, [(0, dp_ - d)])
        bias_p = jnp.pad(bias, [(0, dp_ - d)])

        def chain_v(u0):
            # stay in the transposed-padded layout across the chain
            # (kernel-only measurement, like the base variant)
            u_in = u_t if u0.shape != u_t.shape else u0
            return ss.selective_scan_pallas_chain(
                u_in, dt_t, A_p, b_t, c_t, D_p, bias_p, reverse=rev,
                out_dtype=dtype)
        variants["chain"] = chain_v

    want = [v.strip() for v in args.variants.split(",") if v.strip()]
    for rep in range(2):
        print(f"--- pass {rep} ---", flush=True)
        for name in want:
            if name not in variants:
                print(f"{name:16s} (unavailable)")
                continue
            fn = chain(variants[name])
            try:
                t0 = time.perf_counter()
                float(fn(u))
                comp = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    float(fn(u))
                per = (time.perf_counter() - t0) / args.iters / args.k
                print(f"{name:16s} {per * 1e3:8.3f} ms/call "
                      f"(compile {comp:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:16s} FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
