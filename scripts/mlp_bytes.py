"""Byte projection for the fused FFN kernel (ops/pallas_mlp.py).

XLA cost analysis of each v5e-compiled flax FFN half (LN + fc1 + GELU +
fc2 + residual, the exact subgraph the kernel replaces) vs the kernel's
analytic traffic (read x once + write out once + weights), per DRCT RDG
block width and GRL block, at the 336x512 bench geometry.

Usage: python scripts/mlp_bytes.py
"""
import os
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

HBM_PEAK_GBS = 819.0
P = 336 * 512

# (tag, count, C, hidden, prenorm): DRCT = 12 RDGs x 5 swins
# (widths 180..308, ratio 4 for swin1-3, ratio 1 for swin4/5,
# models/drct.py RDG.block); GRL = 40 blocks ratio 2 post-norm.
CASES = [
    ("drct_swin1", 12, 180, 720, True),
    ("drct_swin2", 12, 212, 848, True),
    ("drct_swin3", 12, 244, 976, True),
    ("drct_swin4", 12, 276, 276, True),
    ("drct_swin5", 12, 308, 308, True),
    ("grl_ffn", 40, 180, 360, False),
]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pt

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = NamedSharding(Mesh(np.asarray(topo.devices).reshape(-1), ("d",)),
                       Pt())
    dt = jnp.bfloat16

    def arg(*shape, d=dt):
        return jax.ShapeDtypeStruct(shape, d, sharding=sh)

    def ffn(x, w1, b1, w2, b2, ls, lb, prenorm):
        def ln(t):
            mu = t.mean(-1, keepdims=True)
            var = ((t - mu) ** 2).mean(-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + 1e-5) * ls + lb
        t = ln(x) if prenorm else x
        h = jax.nn.gelu(t @ w1 + b1, approximate=False)
        y = h @ w2 + b2
        return x + (ln(y) if not prenorm else y)

    print("| block | n | C->hid | XLA GB | kernel GB | cut |")
    print("|---|---|---|---|---|---|")
    tot_x = tot_k = 0.0
    for tag, n, c, ch, pre in CASES:
        import functools
        # ALL operands bf16 (incl. LN params): matches the production
        # expert_dtype=bf16 compile — fp32 LN params would upcast the
        # whole XLA-side chain and overstate its bytes.
        cost = (jax.jit(functools.partial(ffn, prenorm=pre))
                .lower(arg(1, P, c), arg(c, ch), arg(ch), arg(ch, c),
                       arg(c), arg(c), arg(c))
                .compile().cost_analysis())
        if isinstance(cost, list):
            cost = cost[0]
        xla_b = float(cost.get("bytes accessed", 0.0))
        ker_b = 2 * P * c * 2 + (c * ch * 2 * 2 + (ch + 3 * c) * 4)
        tot_x += n * xla_b
        tot_k += n * ker_b
        print(f"| {tag} | {n} | {c}->{ch} | {xla_b/1e9:.3f} | "
              f"{ker_b/1e9:.3f} | {xla_b/ker_b:.1f}x |")
    print(f"\nFFN traffic total: XLA {tot_x/1e9:.1f} GB/img -> kernel "
          f"{tot_k/1e9:.1f} GB/img ({tot_x/tot_k:.1f}x); HBM floor "
          f"{tot_x/1e9/HBM_PEAK_GBS*1e3:.0f} -> "
          f"{tot_k/1e9/HBM_PEAK_GBS*1e3:.0f} ms/img")


if __name__ == "__main__":
    main()
