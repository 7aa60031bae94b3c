"""Source-attributed leaf-op report for a jax.profiler trace directory.

Shared post-processing for trace_expert/trace_fusion/trace_pipeline runs:
aggregates device leaf ops by (hlo bucket) and by (bucket, repo source
line), so every ms in the trace maps back to the Python that produced it.

Usage: python scripts/trace_report.py /tmp/trace_mamba [--top N]
"""

from __future__ import annotations

import argparse
import bisect
import collections
import glob
import gzip
import json


def load_leaves(tdir: str):
    path = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = [e for e in data["traceEvents"] if e.get("ph") == "X" and "dur" in e]
    bytrack = collections.defaultdict(list)
    for e in ev:
        bytrack[(e["pid"], e.get("tid"))].append(e)
    leaves = []
    for _, es in bytrack.items():
        starts = sorted(x["ts"] for x in es)
        for e in es:
            i = bisect.bisect_right(starts, e["ts"])
            if i < len(starts) and starts[i] < e["ts"] + e["dur"]:
                continue
            leaves.append(e)
    return leaves


def srcline(e) -> str:
    st = e.get("args", {}).get("source_stack", "")
    repo = [ln for ln in st.split("\n") if ln.startswith("/root/repo")]
    if repo:
        return repo[0].replace("/root/repo/freqfusion_tpu/", "")
    src = e.get("args", {}).get("source", "?")
    return src.rsplit("/", 1)[-1] if src else "?"


def bucket(name: str) -> str:
    return name.split(".")[0].split("(")[0]


# Source-file -> pipeline stage, checked in stack order (first hit wins),
# so kernel frames (ops/*) attribute to the model that invoked them when a
# model frame is present, and to their own stage mapping otherwise.
_STAGE_PATTERNS = (
    ("models/fusion/", "fusion"),
    ("models/drct.py", "drct"),
    ("models/grl.py", "grl"),
    ("models/nafnet.py", "nafnet"),
    ("models/mambair.py", "mamba"),
    ("models/hat.py", "hat"),
    ("models/dat.py", "dat"),
    ("models/edsr.py", "edsr"),
    ("ops/selective_scan.py", "mamba"),
    ("ops/dft.py", "fusion"),
    ("models/pipeline.py", "pipeline-glue"),
)


def stage_of(e) -> str:
    st = e.get("args", {}).get("source_stack", "")
    hits = []
    for ln in st.split("\n"):
        if not ln.startswith("/root/repo"):
            continue
        for pat, stage in _STAGE_PATTERNS:
            if pat in ln:
                hits.append(stage)
                break
    # Prefer a model-stage frame over glue; deepest repo frame is listed
    # first in source_stack, so take the first non-glue hit.
    for s in hits:
        if s != "pipeline-glue":
            return s
    return hits[0] if hits else "unattributed"


def report(tdir: str, top: int = 25) -> None:
    leaves = [e for e in load_leaves(tdir)
              if not e["name"].startswith(("jit_", "$"))]
    tot = sum(e["dur"] for e in leaves)
    print(f"== {tdir}: {tot/1e3:.1f} ms device leaves ==")
    bybucket = collections.Counter()
    for e in leaves:
        bybucket[bucket(e["name"])] += e["dur"]
    bysrc = collections.Counter()
    cnt = collections.Counter()
    for e in leaves:
        key = (bucket(e["name"]), srcline(e))
        bysrc[key] += e["dur"]
        cnt[key] += 1
    print("--- (bucket, source) top ---")
    for (b, s), d in bysrc.most_common(top):
        print(f"{d/1e3:9.2f} ms x{cnt[(b, s)]:5d}  {b:34s} {s}")
    bystage = collections.Counter()
    for e in leaves:
        bystage[stage_of(e)] += e["dur"]
    print("--- stage walls (roofline --times input) ---")
    times = {s: d / 1e6 for s, d in bystage.items()}
    for s, d in bystage.most_common():
        print(f"{d/1e3:9.2f} ms  {s}")
    print(json.dumps({k: round(v, 4) for k, v in sorted(times.items())}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("tdir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    report(args.tdir, args.top)
