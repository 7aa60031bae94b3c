"""Roofline v2 (VERDICT r3 item 2): per-stage bf16 MFU table.

FLOPs and HBM bytes come from XLA's own cost analysis of the v5e-compiled
program (local deviceless AOT — no relay needed); stage seconds come from
hardware measurements (--times JSON, default: the round-3 closing trace
itemization in BENCH_NOTES.md). Peaks: v5e MXU 197 TFLOP/s bf16,
HBM 819 GB/s; the VPU line uses the measured-saturation receipt
(4.45 T-op/s sustained on the scan, BENCH_NOTES r3) rather than a
theoretical number.

Route note: this process compiles the XLA reference route (CPU backend →
use_pallas() False; verified), NOT the shipped Pallas route. That is
deliberate: XLA cannot cost custom calls, so the XLA route is the only
compile whose "flops" equals the model's full SEMANTIC arithmetic
(calibrated exact on known dots). "bytes accessed" is therefore the
XLA-route traffic — an upper bound for the shipped program, since the
Pallas kernels exist precisely to keep logits/projections in VMEM. A
stage showing >100% HBM (fusion) means its measured wall cannot be
sustained at XLA-route byte counts — i.e. the shipped program already
moves fewer bytes than this column.

Usage:
    python scripts/roofline.py [--times times.json] [--hw 336 --ww 512]
"""
import argparse
import json
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

MXU_PEAK_TFLOPS = 197.0   # v5e bf16
HBM_PEAK_GBS = 819.0      # v5e
VPU_SUSTAINED_TOPS = 4.45  # measured scan saturation (BENCH_NOTES r3)

# Round-3 closing in-pipeline stage walls (BENCH_NOTES "Round-3 closing"),
# seconds/img at 336x512 bf16. Override with --times as new hardware
# numbers land.
DEFAULT_TIMES = {
    "drct": 0.465, "grl": 0.525, "nafnet": 0.320, "mamba": 0.981,
    "fusion": 0.25,
}


def _compiled_costs(hw, ww):
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from freqfusion_tpu.models.pipeline import (FreqFusionPipeline,
                                                build_expert_models)
    from freqfusion_tpu.models.fusion.fusion_v2 import (
        CompleteEnhancedFusionSR)

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = NamedSharding(Mesh(np.asarray(topo.devices).reshape(-1), ("d",)),
                       P())

    def arg(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    def costs_of(fn, *args):
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return {"flops": float(c.get("flops", 0.0)),
                "bytes": float(c.get("bytes accessed", 0.0))}

    models = build_expert_models(4, use_scan=True)
    fusion = CompleteEnhancedFusionSR(upscale=4)
    out = {}
    dt = jnp.bfloat16
    for name, m in models.items():
        shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3), jnp.float32))
        p_args = jax.tree_util.tree_map(
            lambda s: arg(s.shape, dt), shapes)
        out[name] = costs_of(lambda p, x, m=m: m.apply(p, x),
                             p_args, arg((1, hw, ww, 3), dt))

    fc = FreqFusionPipeline.FEATURE_CHANNELS
    imgs = {k: arg((1, hw * 4, ww * 4, 3), dt) for k in models}
    feats = {k: arg((1, hw, ww, fc[k]), dt) for k in models}
    fshapes = jax.eval_shape(
        fusion.init, jax.random.PRNGKey(0),
        jnp.zeros((1, hw, ww, 3), dt),
        jax.tree_util.tree_map(lambda a: jnp.zeros(a.shape, a.dtype), imgs),
        jax.tree_util.tree_map(lambda a: jnp.zeros(a.shape, a.dtype), feats))
    fp_args = jax.tree_util.tree_map(lambda s: arg(s.shape, s.dtype),
                                     fshapes)
    out["fusion"] = costs_of(
        lambda p, lr, i, f: fusion.apply(p, lr, i, f),
        fp_args, arg((1, hw, ww, 3), dt), imgs, feats)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", help="JSON file: stage -> seconds/img")
    ap.add_argument("--hw", type=int, default=336)
    ap.add_argument("--ww", type=int, default=512)
    args = ap.parse_args()

    times = dict(DEFAULT_TIMES)
    if args.times:
        times.update(json.load(open(args.times)))

    costs = _compiled_costs(args.hw, args.ww)

    print(f"\nRoofline v2 — {args.hw}x{args.ww} LR bf16, XLA cost analysis "
          f"(v5e-compiled HLO) x measured stage walls")
    hdr = ("| stage | TFLOP/img | time s | TFLOP/s | %MXU(197) | "
           "GB/img | GB/s | %HBM(819) | bound |")
    print(hdr)
    print("|" + "---|" * 9)
    tot_f = tot_b = tot_t = 0.0
    for name, c in costs.items():
        t = times.get(name)
        tf = c["flops"] / 1e12
        gb = c["bytes"] / 1e9
        if t is None:
            print(f"| {name} | {tf:.2f} | n/a | | | {gb:.1f} | | | |")
            continue
        tfs = tf / t
        gbs = gb / t
        mxu = 100 * tfs / MXU_PEAK_TFLOPS
        hbm = 100 * gbs / HBM_PEAK_GBS
        bound = ("HBM" if hbm > 2.5 * mxu else
                 "MXU" if mxu > 2.5 * hbm else "mixed")
        if name == "mamba":
            bound = "VPU (scan; 4.45 T-op/s measured saturation)"
        print(f"| {name} | {tf:.2f} | {t:.3f} | {tfs:.1f} | {mxu:.1f}% | "
              f"{gb:.1f} | {gbs:.0f} | {hbm:.1f}% | {bound} |")
        tot_f += tf
        tot_b += gb
        tot_t += t
    if tot_t:
        print(f"| total | {tot_f:.2f} | {tot_t:.3f} | "
              f"{tot_f / tot_t:.1f} | {100 * tot_f / tot_t / MXU_PEAK_TFLOPS:.1f}% | "
              f"{tot_b:.1f} | {tot_b / tot_t:.0f} | "
              f"{100 * tot_b / tot_t / HBM_PEAK_GBS:.1f}% | |")


if __name__ == "__main__":
    main()
