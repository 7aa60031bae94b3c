"""Local scoped-VMEM checks for the gated fused kernels (relay-free).

The relay-side AOT compile computes a scoped-vmem stack allocation per
pallas_call and rejects kernels over the 16M limit (hardware receipts
MEASURE_r5c/probe_c1: cab 20.79M, lka 26.91M). That computation is a
resource model, not a toolchain-version quirk, so the locally installed
libtpu reproduces it against a deviceless v5e topology — letting tile
budgets be calibrated without burning relay recovery windows. (Compile
LEGALITY can still differ local-vs-relay — CLAUDE.md — so a hardware
probe remains the final gate.)

Usage: python scripts/aot_vmem_check.py [cab lka hier edge nafblock]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ENV = {
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
    "TPU_ACCELERATOR_TYPE": "v5litepod-4",
    "TPU_WORKER_HOSTNAMES": "localhost",
    # gates so the module routes through the fused kernels
    "FREQFUSION_NAFBLOCK": "1", "FREQFUSION_CAB": "1",
    "FREQFUSION_HIER": "1", "FREQFUSION_EDGE": "1",
    "FREQFUSION_LKA": "1", "FREQFUSION_PALLAS": "1",
}

if any(os.environ.get(k) != v for k, v in _ENV.items()):
    env = dict(os.environ, **_ENV)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def _sharding():
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    mesh = Mesh(np.asarray(topo.devices).reshape(-1), ("d",))
    return NamedSharding(mesh, P())


def _aot(fn, *args):
    sh = _sharding()
    sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh), args)
    jax.jit(fn).lower(*sds).compile()


def check(name):
    rng = np.random.default_rng(0)
    if name == "nafblock":
        from freqfusion_tpu.models.nafnet import NAFBlock
        x = jnp.asarray(rng.normal(0, 1, (1, 336, 512, 64))
                        .astype(np.float32)).astype(jnp.bfloat16)
        m = NAFBlock(64)
    elif name == "cab":
        from freqfusion_tpu.models.grl import CAB
        x = jnp.asarray(rng.normal(0, 1, (1, 336, 512, 180))
                        .astype(np.float32)).astype(jnp.bfloat16)
        m = CAB(180)
    elif name == "lka":
        from freqfusion_tpu.models.fusion.lka import LKABlock
        x = jnp.asarray(rng.normal(0, 1, (1, 336, 512, 64))
                        .astype(np.float32))
        m = LKABlock(kernel_size=21)
    elif name == "hier":
        from freqfusion_tpu.models.fusion.hierarchical import (
            HierarchicalMultiResolutionFusion)
        x = {k: jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3))
                            .astype(np.float32))
             for k in ("drct", "grl", "nafnet", "mamba")}
        m = HierarchicalMultiResolutionFusion(num_experts=4,
                                              base_channels=64)
    elif name == "edge":
        from freqfusion_tpu.models.fusion.edge import (
            LaplacianPyramidRefinement)
        x = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3))
                        .astype(np.float32))
        m = LaplacianPyramidRefinement(num_levels=3, channels=32)
    else:
        raise SystemExit(f"unknown probe {name}")
    v = m.init(jax.random.PRNGKey(0), x)
    _aot(lambda vv, xx: m.apply(vv, xx), v, x)


if __name__ == "__main__":
    names = sys.argv[1:] or ["cab", "lka", "hier", "edge", "nafblock"]
    for nm in names:
        try:
            check(nm)
            print(f"{nm}: AOT-OK")
        except Exception as e:
            msg = str(e)
            key = next((ln for ln in msg.splitlines()
                        if "vmem" in ln.lower() or "Scoped" in ln), msg[:300])
            print(f"{nm}: AOT-FAIL {type(e).__name__}: {key[:500]}")
