"""Byte-floor projection for the fused whole-NAFBlock kernel.

VERDICT r4 item 3 deliverable: an XLA-cost-analysis byte count showing
the projected floor reduction of ops/pallas_nafblock.py. For each UNet
level of the bench geometry (336x512 LR -> 1344x2048 HR), AOT-compile a
SINGLE flax NAFBlock for v5e (deviceless, relay-free) and read XLA's
"bytes accessed" — the traffic the current XLA route pays per block —
then compare against the fused kernel's analytic traffic:

  pass A: read x once (+ 2-halo rows/cols per tile) + gh*gw*C partials
  pass B: read x once (+ halo) + write the output tile once
  weights: streamed once per pass (2x; only significant at C=1024)

Output: per-level table + total NAFNet block traffic both routes + new
HBM floor seconds at 819 GB/s.

Usage: python scripts/nafblock_bytes.py
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

# (level, n_blocks, H, W, C) for enc [2,2,4,8] + middle 12 + dec [2,2,2,2]
# at the 1344x2048 padded HR extent (NAFNet pads to multiples of 16).
LEVELS = [
    ("enc0", 2, 1344, 2048, 64),
    ("enc1", 2, 672, 1024, 128),
    ("enc2", 4, 336, 512, 256),
    ("enc3", 8, 168, 256, 512),
    ("mid", 12, 84, 128, 1024),
    ("dec0", 2, 168, 256, 512),
    ("dec1", 2, 336, 512, 256),
    ("dec2", 2, 672, 1024, 128),
    ("dec3", 2, 1344, 2048, 64),
]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from freqfusion_tpu.models.nafnet import NAFBlock
    from freqfusion_tpu.ops.pallas_nafblock import _tiles

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = NamedSharding(Mesh(np.asarray(topo.devices).reshape(-1), ("d",)),
                       P())
    dt = jnp.bfloat16
    item = 2

    print("| level | blocks | HxWxC | XLA GB/blk | kernel GB/blk | cut |")
    print("|---|---|---|---|---|---|")
    tot_xla = tot_ker = 0.0
    for name, nblk, h, w, c in LEVELS:
        block = NAFBlock(c)
        shapes = jax.eval_shape(block.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 8, 8, c), jnp.float32))
        p_args = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, dt, sharding=sh),
            shapes)
        x_arg = jax.ShapeDtypeStruct((1, h, w, c), dt, sharding=sh)
        cost = (jax.jit(lambda p, x: block.apply(p, x))
                .lower(p_args, x_arg).compile().cost_analysis())
        if isinstance(cost, list):
            cost = cost[0]
        xla_b = float(cost.get("bytes accessed", 0.0))

        rh, rw, _ = _tiles(h, w, c, item)
        halo = (rh + 2) * (rw + 2) / (rh * rw)   # read amplification
        pix = h * w
        weights = (6 * c * c + 2 * c * 2 + 9 * 2 * c) * item + 16 * c * 4
        ker_b = (2 * pix * c * item * halo          # pass A+B reads
                 + pix * c * item                   # pass B write
                 + (pix // (rh * rw)) * c * 4       # pass A partials
                 + 2 * weights)
        tot_xla += nblk * xla_b
        tot_ker += nblk * ker_b
        print(f"| {name} | {nblk} | {h}x{w}x{c} | {xla_b/1e9:.3f} | "
              f"{ker_b/1e9:.3f} | {xla_b/ker_b:.1f}x |")

    floor_xla = tot_xla / 1e9 / HBM_PEAK_GBS
    floor_ker = tot_ker / 1e9 / HBM_PEAK_GBS
    print(f"\nNAFNet 36-block traffic: XLA route {tot_xla/1e9:.1f} GB/img "
          f"-> fused kernel {tot_ker/1e9:.1f} GB/img "
          f"({tot_xla/tot_ker:.1f}x cut)")
    print(f"HBM floor (819 GB/s): {floor_xla*1e3:.0f} ms -> "
          f"{floor_ker*1e3:.0f} ms per image "
          f"(+ intro/down/up/ending convs unchanged)")


if __name__ == "__main__":
    main()
