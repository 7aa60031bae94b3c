"""Trace the FULL 4-expert + fusion pipeline (ONE XLA program) on the
real chip and print a leaf-op time breakdown — itemizes what bench.py
measures (dev tool).

Usage: python scripts/trace_pipeline.py [--dtype bf16] [--top N]
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
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--hw", type=int, default=336)
    ap.add_argument("--ww", type=int, default=512)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.models.fusion.fusion_v2 import CompleteEnhancedFusionSR
    from freqfusion_tpu.models.pipeline import (
        FreqFusionPipeline, build_expert_models)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (1, args.hw, args.ww, 3))
                     .astype(np.float32))

    def fake_init(init_fn, *a):
        shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0), *a)
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    init_lr = jnp.zeros((1, 32, 32, 3), jnp.float32)
    models = build_expert_models(4, use_scan=True)
    params = {n: fake_init(m.init, init_lr) for n, m in models.items()}
    fusion = CompleteEnhancedFusionSR(upscale=4)
    mock_imgs = {k: jnp.zeros((1, 128, 128, 3)) for k in models}
    mock_feats = {k: jnp.zeros(
        (1, 32, 32, FreqFusionPipeline.FEATURE_CHANNELS[k])) for k in models}
    params["fusion"] = fake_init(fusion.init, init_lr, mock_imgs, mock_feats)

    fusion_dtype = None if args.dtype == "fp32" else dtype
    pipe = FreqFusionPipeline(params, scale=4, fusion_model=fusion,
                              jit_mode="full", use_scan=True,
                              expert_dtype=dtype, fusion_dtype=fusion_dtype)
    float(jnp.sum(pipe(lr)))

    tdir = "/tmp/trace_pipeline"
    os.system(f"rm -rf {tdir}")
    os.makedirs(tdir, exist_ok=True)
    jax.profiler.start_trace(tdir)
    float(jnp.sum(pipe(lr)))
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
    total = 0.0
    for n, dsum in leafsum.items():
        if n.startswith(("jit_", "$")):
            continue
        bucket[n.split(".")[0].split("(")[0]] += dsum
        total += dsum
    print(f"--- buckets (1 iter, device leaves; total {total/1e3:.1f} ms) ---")
    for n, dsum in bucket.most_common(24):
        print(f"{dsum / 1e3:10.2f} ms  {n}")
    print("--- top leaves ---")
    shown = 0
    for n, dsum in leafsum.most_common(200):
        if n.startswith(("jit_", "$")):
            continue
        print(f"{dsum / 1e3:9.2f} ms x{leafcnt[n]:4d}  {n[:84]}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
