"""Decompose the fusion net's XLA-route bytes by phase.

Roofline v2 put the fusion stage at 235.6 GB/img — the ensemble's
largest byte count — but called it "at/below floor" without saying which
phase carries it. This ablates each enable_* flag (and measures the
Phase-7 refiner separately) under v5e cost analysis to attribute bytes,
so the next floor-cutting kernel targets the right subgraph.

Usage: python scripts/fusion_bytes.py [--hw 336 --ww 512]
"""
import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=336)
    ap.add_argument("--ww", type=int, default=512)
    args = ap.parse_args()
    hw, ww = args.hw, args.ww

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pt

    from freqfusion_tpu.models.fusion.fusion_v2 import (
        CompleteEnhancedFusionSR)
    from freqfusion_tpu.models.pipeline import FreqFusionPipeline

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = NamedSharding(Mesh(np.asarray(topo.devices).reshape(-1), ("d",)),
                       Pt())
    dt = jnp.bfloat16

    def arg(shape, d=dt):
        return jax.ShapeDtypeStruct(shape, d, sharding=sh)

    fc = FreqFusionPipeline.FEATURE_CHANNELS
    names = list(fc)
    imgs = {k: arg((1, hw * 4, ww * 4, 3)) for k in names}
    feats = {k: arg((1, hw, ww, fc[k])) for k in names}
    lr = arg((1, hw, ww, 3))

    def cost_of(**flags):
        model = CompleteEnhancedFusionSR(upscale=4, **flags)
        fshapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, hw, ww, 3), dt),
            jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, a.dtype), imgs),
            jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, a.dtype), feats))
        p = jax.tree_util.tree_map(lambda s: arg(s.shape, s.dtype),
                                   fshapes)
        c = (jax.jit(lambda p, l, i, f: model.apply(p, l, i, f))
             .lower(p, lr, imgs, feats).compile().cost_analysis())
        if isinstance(c, list):
            c = c[0]
        return float(c.get("bytes accessed", 0.0))

    full = cost_of()
    print(f"full fusion: {full/1e9:.1f} GB")
    ablate = {
        "phase2+3 (bands+cross-band LKA)": dict(
            enable_adaptive_bands=False, enable_cross_band_attn=False),
        "phase4 (collaborative LKA)": dict(enable_collaborative=False),
        "phase5 (hierarchical+freq routing)": dict(
            enable_multi_resolution=False),
        "phase6 (dynamic selector)": dict(enable_dynamic_selection=False),
        "edge enhancement": dict(enable_edge_enhance=False),
    }
    for tag, flags in ablate.items():
        b = cost_of(**flags)
        print(f"{tag}: {(full - b)/1e9:.1f} GB  (without: {b/1e9:.1f})")

    # Phase 7 refiner alone (always-on in the model, measured directly)
    import flax.linen as nn

    class Refiner(nn.Module):
        @nn.compact
        def __call__(self, r):
            r = nn.gelu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                                name="refine_0")(r))
            for i in range(4):
                r = nn.gelu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                                    name=f"refine_{2*(i+1)}")(r))
            return nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                           name="refine_10")(r)

    ref = Refiner()
    rp = jax.tree_util.tree_map(
        lambda s: arg(s.shape, s.dtype),
        jax.eval_shape(ref.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, hw * 4, ww * 4, 3), dt)))
    c = (jax.jit(lambda p, x: ref.apply(p, x))
         .lower(rp, arg((1, hw * 4, ww * 4, 3))).compile()
         .cost_analysis())
    if isinstance(c, list):
        c = c[0]
    print(f"phase7 refiner alone: "
          f"{float(c.get('bytes accessed', 0.0))/1e9:.1f} GB")


if __name__ == "__main__":
    main()
