"""Trace one expert on the real chip and print a leaf-op time breakdown.

Usage: python scripts/trace_expert.py <expert> [--dtype bf16] [--hw H]
       [--ww W] [--top N]
"""

from __future__ import annotations

import argparse
import bisect
import collections
import glob
import gzip
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("expert")
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--hw", type=int, default=336)
    ap.add_argument("--ww", type=int, default=512)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.models.pipeline import build_expert_models

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    m = build_expert_models(4, use_scan=True)[args.expert]
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (1, args.hw, args.ww, 3))
                     .astype(np.float32)).astype(dtype)
    shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3), jnp.float32))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, dtype), shapes)
    fwd = jax.jit(lambda p, x: m.apply(p, x)[0])
    float(jnp.sum(fwd(params, lr).astype(jnp.float32)))

    tdir = f"/tmp/trace_{args.expert}"
    os.system(f"rm -rf {tdir}")
    os.makedirs(tdir, exist_ok=True)
    jax.profiler.start_trace(tdir)
    float(jnp.sum(fwd(params, lr).astype(jnp.float32)))
    jax.profiler.stop_trace()

    path = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = [e for e in data["traceEvents"] if e.get("ph") == "X" and "dur" in e]
    bytrack = collections.defaultdict(list)
    for e in ev:
        bytrack[(e["pid"], e.get("tid"))].append(e)
    leafsum, leafcnt = collections.Counter(), collections.Counter()
    for _, es in bytrack.items():
        starts = sorted(x["ts"] for x in es)
        for e in es:
            i = bisect.bisect_right(starts, e["ts"])
            if i < len(starts) and starts[i] < e["ts"] + e["dur"]:
                continue  # has children; not a leaf
            leafsum[e["name"]] += e["dur"]
            leafcnt[e["name"]] += 1
    bucket = collections.Counter()
    for n, dsum in leafsum.items():
        if n.startswith(("jit_", "$")):
            continue  # host-side wrappers
        bucket[n.split(".")[0].split("(")[0]] += dsum
    print("--- buckets (1 iter, device leaves) ---")
    for n, dsum in bucket.most_common(16):
        print(f"{dsum / 1e3:10.2f} ms  {n}")
    print("--- top leaves ---")
    for n, dsum in leafsum.most_common(args.top):
        if n.startswith(("jit_", "$")):
            continue
        print(f"{dsum / 1e3:9.2f} ms x{leafcnt[n]:4d}  {n[:84]}")


if __name__ == "__main__":
    main()
