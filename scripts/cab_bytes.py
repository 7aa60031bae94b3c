"""Byte projection for the fused CAB kernel (ops/pallas_cab.py).

XLA cost analysis of the v5e-compiled flax CAB branch (GRL) and the
LN2+CAB+skip half-block (MambaIR) vs the kernel's analytic traffic
(~3 activation touches + weights), 336x512 bench geometry.

Usage: python scripts/cab_bytes.py
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
H, W = 336, 512
P = H * W


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pt

    from freqfusion_tpu.models.grl import CAB as GRLCAB
    from freqfusion_tpu.models.mambair import CAB as MCAB

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = NamedSharding(Mesh(np.asarray(topo.devices).reshape(-1), ("d",)),
                       Pt())
    dt = jnp.bfloat16

    def costs(fn, *args):
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("bytes accessed", 0.0))

    def p_args(module, c):
        shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 8, 8, c), jnp.float32))
        return jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, dt, sharding=sh),
            shapes)

    x = jax.ShapeDtypeStruct((1, H, W, 180), dt, sharding=sh)

    print("| branch | n | XLA GB/blk | kernel GB/blk | cut |")
    print("|---|---|---|---|---|")
    tot_x = tot_k = 0.0
    ker = 3 * P * 180 * 2 + 9 * 2 * 180 * 60 * 2 * 2   # 3 touches+weights
    for tag, n, mod in (("grl_cab", 40, GRLCAB(180)),
                        ("mambair_ln_cab_skip", 36, MCAB(180))):
        if tag.startswith("mambair"):
            def fn(p, xx, m=mod):
                mu = xx.mean(-1, keepdims=True)
                var = ((xx - mu) ** 2).mean(-1, keepdims=True)
                t = (xx - mu) * jax.lax.rsqrt(var + 1e-5)
                return xx + m.apply(p, t)
        else:
            def fn(p, xx, m=mod):
                return m.apply(p, xx)
        xla_b = costs(fn, p_args(mod, 180), x)
        tot_x += n * xla_b
        tot_k += n * ker
        print(f"| {tag} | {n} | {xla_b/1e9:.3f} | {ker/1e9:.3f} | "
              f"{xla_b/ker:.1f}x |")
    print(f"\nCAB traffic: XLA {tot_x/1e9:.1f} -> kernel {tot_k/1e9:.1f} "
          f"GB/img ({tot_x/tot_k:.1f}x); HBM floor "
          f"{tot_x/1e9/HBM_PEAK_GBS*1e3:.0f} -> "
          f"{tot_k/1e9/HBM_PEAK_GBS*1e3:.0f} ms/img")


if __name__ == "__main__":
    main()
