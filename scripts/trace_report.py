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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("tdir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    report(args.tdir, args.top)
