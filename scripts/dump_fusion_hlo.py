"""Dump the optimized HLO of the standalone fusion program and summarize
copy/reshape/pad ops by shape + source metadata (maps trace leaves like
`copy.2108` back to the Python line that produced them).

Usage: python scripts/dump_fusion_hlo.py [--dtype bf16] [--grep copy]
"""

from __future__ import annotations

import argparse
import collections
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--hw", type=int, default=336)
    ap.add_argument("--ww", type=int, default=512)
    ap.add_argument("--ops", default="copy,reshape,pad,transpose,concatenate")
    ap.add_argument("--out", default="/tmp/fusion_hlo.txt")
    ap.add_argument("--cpu", action="store_true",
                    help="compile on CPU (no TPU layout copies) instead of the relay")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _fusion_model, _mock_batch

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = _fusion_model()
    batch = _mock_batch(1, args.hw, args.ww)
    params = model.init(jax.random.PRNGKey(0), batch["lr"],
                        batch["expert_imgs"], batch["expert_feats"])
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a, t)
    params = cast(params)
    fargs = (params, cast(jnp.asarray(batch["lr"])),
             {k: cast(jnp.asarray(v)) for k, v in batch["expert_imgs"].items()},
             {k: cast(jnp.asarray(v)) for k, v in batch["expert_feats"].items()})
    lowered = jax.jit(lambda p, lr, i, f: model.apply(p, lr, i, f)).lower(*fargs)
    txt = lowered.compile().as_text()
    Path(args.out).write_text(txt)
    print(f"wrote {args.out} ({len(txt)} chars)")

    wanted = tuple(args.ops.split(","))
    # Lines look like:  %copy.2108 = bf16[1,336,512,180]{...} copy(%x), metadata={op_name="..." source_file="..." source_line=N}
    pat = re.compile(r"%?([\w.-]+)\s*=\s*(\S+)\s+(copy|reshape|pad|transpose|concatenate)\(")
    meta = re.compile(r'op_name="([^"]*)"')
    src = re.compile(r'source_file="([^"]*)" source_line=(\d+)')
    rows = []
    for line in txt.splitlines():
        m = pat.search(line)
        if not m or m.group(3) not in wanted:
            continue
        name, shape, op = m.groups()
        mm = meta.search(line)
        ms = src.search(line)
        rows.append((name, op, shape,
                     mm.group(1) if mm else "?",
                     f"{Path(ms.group(1)).name}:{ms.group(2)}" if ms else "?"))

    def nbytes(shape: str) -> int:
        m2 = re.match(r"(\w+)\[([\d,]*)\]", shape)
        if not m2:
            return 0
        dt, dims = m2.groups()
        n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
        unit = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "pred": 1,
                "u8": 1, "s8": 1, "u32": 4, "f64": 8}.get(dt, 4)
        return n * unit

    rows.sort(key=lambda r: -nbytes(r[2]))
    print(f"{len(rows)} matching ops; top 40 by bytes:")
    agg = collections.Counter()
    aggn = collections.Counter()
    for name, op, shape, opname, srcline in rows:
        agg[(op, srcline, opname.split("/")[-1][:40])] += nbytes(shape)
        aggn[(op, srcline, opname.split("/")[-1][:40])] += 1
    for (op, srcline, opname), b in agg.most_common(40):
        print(f"{b/1e6:9.2f} MB x{aggn[(op, srcline, opname)]:3d} {op:12s} "
              f"{srcline:28s} {opname}")


if __name__ == "__main__":
    main()
