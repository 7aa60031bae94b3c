"""Byte projection for the fused Laplacian-edge kernels
(ops/pallas_edge.py).

XLA cost analysis of the v5e-compiled flax LaplacianPyramidRefinement
(models/fusion/edge.py) vs the kernel route's traffic: the 3-channel
pyramid build + two feature upsamples stay in XLA (compiled and
measured here too), while the refine blocks and the fuse/gate chain
become read-once/write-once halo passes (analytic bytes).
HR bench geometry 1344x2048 (= 336x512 LR x4).

Usage: python scripts/edge_bytes.py
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
H, W = 1344, 2048
F = 32


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pt

    from freqfusion_tpu.models.fusion.edge import (
        LaplacianPyramidRefinement, build_laplacian_pyramid)
    from freqfusion_tpu.ops.resize import resize_bilinear

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = NamedSharding(Mesh(np.asarray(topo.devices).reshape(-1), ("d",)),
                       Pt())
    dt = jnp.bfloat16
    item = 2

    def gb(fn, *args):
        a = [jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh)
             if hasattr(s, "shape") else s for s in args]
        c = jax.jit(fn).lower(*a).compile()
        return c.cost_analysis()["bytes accessed"] / 1e9

    sr = jax.ShapeDtypeStruct((1, H, W, 3), dt)

    # --- XLA route: the whole module --------------------------------
    model = LaplacianPyramidRefinement(num_levels=3, channels=F)
    zeros = jnp.zeros(sr.shape, dt)
    pshapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), zeros)
    p = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        pshapes)
    xla_total = gb(lambda v, x: model.apply(v, x), p, sr)

    # --- kernel route: XLA-remnant pieces ----------------------------
    pyr = gb(lambda x: tuple(build_laplacian_pyramid(x, 3)[0]), sr)
    up1 = gb(lambda x: resize_bilinear(x, H, W),
             jax.ShapeDtypeStruct((1, H // 2, W // 2, F), dt))
    up2 = gb(lambda x: resize_bilinear(x, H, W),
             jax.ShapeDtypeStruct((1, H // 4, W // 4, F), dt))

    # --- kernel route: analytic read-once/write-once passes ----------
    px = H * W
    refine = sum((3 + F) * (px // s) * item for s in (1, 4, 16)) / 1e9
    fuse = (3 + 3 * F + 3) * px * item / 1e9
    kernel_total = pyr + up1 + up2 + refine + fuse

    print(f"edge module, XLA route            : {xla_total:8.2f} GB")
    print(f"  pyramid build (stays XLA)       : {pyr:8.2f} GB")
    print(f"  feature upsamples x2 (stay XLA) : {up1 + up2:8.2f} GB")
    print(f"  refine kernels x3 (analytic)    : {refine:8.2f} GB")
    print(f"  fuse/gate kernel (analytic)     : {fuse:8.2f} GB")
    print(f"edge module, kernel route         : {kernel_total:8.2f} GB "
          f"({xla_total / kernel_total:.1f}x cut)")
    print(f"byte floor @ {HBM_PEAK_GBS:.0f} GB/s: "
          f"{xla_total / HBM_PEAK_GBS * 1e3:.0f} -> "
          f"{kernel_total / HBM_PEAK_GBS * 1e3:.0f} ms/img")


if __name__ == "__main__":
    main()
