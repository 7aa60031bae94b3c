"""Fusion-stage byte attribution, module level (fusion_bytes.py v2).

The flag-ablation pass (scripts/fusion_bytes.py) showed the fusion
stage's 235.6 GB spread over phases 2-5 + edge but ablation deltas
interact; this compiles each MODULE standalone at its production shape
(336x512 LR bench geometry, bf16) and reads XLA's bytes directly, so
the next kernel target is picked on evidence.

Usage: python scripts/fusion_bytes2.py
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

HW, WW = 336, 512


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pt

    from freqfusion_tpu.models.fusion.edge import LaplacianPyramidRefinement
    from freqfusion_tpu.models.fusion.frequency import (
        MultiDomainFrequencyDecomposition)
    from freqfusion_tpu.models.fusion.hierarchical import (
        HierarchicalMultiResolutionFusion)
    from freqfusion_tpu.models.fusion.lka import (
        EnhancedCollaborativeWithLKA, EnhancedCrossBandWithLKA, LKABlock,
        TokenMultiheadAttention)

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = NamedSharding(Mesh(np.asarray(topo.devices).reshape(-1), ("d",)),
                       Pt())
    dt = jnp.bfloat16

    def arg(*shape, d=dt):
        return jax.ShapeDtypeStruct(shape, d, sharding=sh)

    def measure(tag, module, *xs, method=None):
        zeros = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, a.dtype), list(xs))
        shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *zeros)
        p = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            shapes)
        fn = (lambda p, *a: module.apply(p, *a))
        c = jax.jit(fn).lower(p, *xs).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        print(f"{tag}: {float(c.get('bytes accessed', 0.0))/1e9:.2f} GB")

    lr3 = arg(1, HW, WW, 3)
    hr3 = arg(1, HW * 4, WW * 4, 3)

    measure("phase2 MultiDomainFrequencyDecomposition",
            MultiDomainFrequencyDecomposition(block_size=8,
                                              enable_fusion=False), lr3)

    bands = [jnp.zeros((1, HW, WW, 3), dt) for _ in range(9)]
    # ShapeDtypeStruct list for lowering
    bands_a = [arg(1, HW, WW, 3) for _ in range(9)]
    measure("phase3 EnhancedCrossBandWithLKA (9 bands)",
            EnhancedCrossBandWithLKA(dim=64, num_heads=4), bands_a)

    measure("  token MHA alone [P,9,64]",
            TokenMultiheadAttention(num_heads=4, dropout=0.0),
            arg(1, HW, WW, 9, 64))
    measure("  LKABlock alone (1,336,512,64)", LKABlock(), arg(1, HW, WW, 64))
    measure("  LKABlock alone (1,336,512,128)", LKABlock(),
            arg(1, HW, WW, 128))

    feats = {"drct": arg(1, HW, WW, 180), "grl": arg(1, HW, WW, 180),
             "nafnet": arg(1, HW, WW, 64), "mamba": arg(1, HW, WW, 180)}
    outs = [hr3] * 4
    measure("phase4 EnhancedCollaborativeWithLKA",
            EnhancedCollaborativeWithLKA(), feats, outs)

    imgs = {k: hr3 for k in feats}
    measure("phase5 HierarchicalMultiResolutionFusion",
            HierarchicalMultiResolutionFusion(num_experts=4,
                                              base_channels=64), imgs)

    measure("edge LaplacianPyramidRefinement (HR)",
            LaplacianPyramidRefinement(num_levels=3, channels=32,
                                       init_edge_strength=0.15), hr3)


if __name__ == "__main__":
    main()
