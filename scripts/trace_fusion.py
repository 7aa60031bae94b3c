"""Trace the fusion network ALONE on the real chip (bf16 params+inputs,
matching the in-pipeline fusion_dtype mode) and print the leaf-op
breakdown — itemizes the ~0.25 s in-pipeline fusion bucket.

Usage: python scripts/trace_fusion.py [--dtype bf16] [--top N]
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
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--hw", type=int, default=336)
    ap.add_argument("--ww", type=int, default=512)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fusion_model, _mock_batch

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = _fusion_model()
    batch = _mock_batch(1, args.hw, args.ww)
    params = model.init(jax.random.PRNGKey(0), batch["lr"],
                        batch["expert_imgs"], batch["expert_feats"])
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == np.float32
        or a.dtype == jnp.float32 else a, t)
    params = cast(params)
    args_dev = (params, jax.device_put(cast(jnp.asarray(batch["lr"]))),
                {k: jax.device_put(cast(jnp.asarray(v)))
                 for k, v in batch["expert_imgs"].items()},
                {k: jax.device_put(cast(jnp.asarray(v)))
                 for k, v in batch["expert_feats"].items()})
    fwd = jax.jit(lambda p, lr, i, f: model.apply(p, lr, i, f))
    t0 = time.time()
    float(jnp.sum(fwd(*args_dev).astype(jnp.float32)))
    print(f"compile+first {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(fwd(*args_dev).astype(jnp.float32)))
        ts.append(time.time() - t0)
    print(f"wall {min(ts):.3f} s/img ({args.dtype})", flush=True)

    tdir = "/tmp/trace_fusion"
    os.system(f"rm -rf {tdir}")
    os.makedirs(tdir, exist_ok=True)
    jax.profiler.start_trace(tdir)
    float(jnp.sum(fwd(*args_dev).astype(jnp.float32)))
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
                continue
            leafsum[e["name"]] += e["dur"]
            leafcnt[e["name"]] += 1
    bucket = collections.Counter()
    for n, dsum in leafsum.items():
        if n.startswith(("jit_", "$")):
            continue
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
