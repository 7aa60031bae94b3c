"""Dump the v5e-optimized HLO of one expert (local deviceless AOT — no
relay) and summarize copy/transpose/reshape/pad ops by shape + source
line. The TPU backend's layout-assignment copies appear here exactly as
on hardware, so the trace's "copy" buckets can be chased without a chip.

Usage: python scripts/dump_expert_hlo.py drct [--dtype bf16] [--hw 336]
       [--ww 512] [--ops copy,transpose] [--out /tmp/drct_hlo.txt]
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ENV = {
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
    "TPU_ACCELERATOR_TYPE": "v5litepod-4",
    "TPU_WORKER_HOSTNAMES": "localhost",
}
if any(os.environ.get(k) != v for k, v in _ENV.items()):
    os.execve(sys.executable, [sys.executable] + sys.argv,
              dict(os.environ, **_ENV))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("expert")
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--hw", type=int, default=336)
    ap.add_argument("--ww", type=int, default=512)
    ap.add_argument("--ops", default="copy,transpose,reshape,pad,"
                                     "concatenate")
    ap.add_argument("--out", default="")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from freqfusion_tpu.models.pipeline import build_expert_models

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = NamedSharding(Mesh(np.asarray(topo.devices).reshape(-1), ("d",)),
                       P())
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    m = build_expert_models(4, use_scan=True)[args.expert]
    shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3), jnp.float32))
    p_args = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, dt, sharding=sh), shapes)
    x = jax.ShapeDtypeStruct((1, args.hw, args.ww, 3), dt, sharding=sh)
    compiled = jax.jit(lambda p, xx: m.apply(p, xx)).lower(
        p_args, x).compile()
    hlo = compiled.as_text()
    out = args.out or f"/tmp/{args.expert}_hlo.txt"
    with open(out, "w") as f:
        f.write(hlo)
    print(f"optimized HLO -> {out} ({len(hlo) / 1e6:.1f} MB)")

    ops = args.ops.split(",")
    # bytes of an HLO shape like bf16[84,8,16,1024]{3,1,2,0:T(8,128)(2,1)}
    isize = {"bf16": 2, "f32": 4, "s32": 4, "f16": 2, "s8": 1, "u8": 1,
             "pred": 1, "u32": 4}

    def shape_bytes(s):
        mm = re.match(r"(\w+)\[([\d,]*)\]", s)
        if not mm:
            return 0
        d = mm.group(2)
        n = int(np.prod([int(v) for v in d.split(",")])) if d else 1
        return n * isize.get(mm.group(1), 4)

    rows = []
    for line in hlo.splitlines():
        ls = line.strip()
        mm = re.match(r"(?:ROOT )?%?([\w.-]+) = ([^ ]+) (\w+)\(", ls)
        if not mm:
            continue
        name, shape, op = mm.groups()
        if op not in ops:
            continue
        src = ""
        meta = re.search(r'metadata={.*?source_file="([^"]+)".*?'
                         r'source_line=(\d+)', ls)
        if meta:
            src = f"{os.path.basename(meta.group(1))}:{meta.group(2)}"
        rows.append((op, shape.split("{")[0], shape_bytes(shape), src))

    agg = collections.Counter()
    byt = collections.Counter()
    for op, shape, b, src in rows:
        key = (op, shape, src)
        agg[key] += 1
        byt[key] += b
    print(f"\ntop {args.top} {ops} by total bytes (write side):")
    for (op, shape, src), total in sorted(
            byt.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {total / 1e6:9.1f} MB  x{agg[(op, shape, src)]:<4d} "
              f"{op:<12s} {shape:<28s} {src}")
    tot = sum(byt.values())
    print(f"total {'/'.join(ops)} write bytes: {tot / 1e9:.2f} GB "
          f"(~{tot * 2 / 819e9 * 1e3:.1f} ms r+w at 819 GB/s)")


if __name__ == "__main__":
    main()
