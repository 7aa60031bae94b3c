"""Benchmark: full FreqFusionSR x4 SR throughput (HR megapixels/sec/chip).

Runs the complete pipeline — all four frozen experts (DRCT-L, GRL-B,
NAFNet-64, MambaIR) + the 7-phase fusion network — as one jitted XLA
program on a DIV2K-val-class LR shape, and reports ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is against BASELINE.json's >= 5 MP/s/chip target. Weights are
random (the reference publishes no checkpoints in-repo); throughput is
weight-independent.

Experts run in bf16 by default (BENCH_DTYPE=fp32 reverts) — the TPU
analogue of the reference's fp16 autocast for MambaIR (io.py:263); the
fusion net and selective-scan state stay fp32, and
tests/test_bf16_quality.py pins the PSNR cost of the mode. Set
BENCH_MODE=fusion to bench the fusion-only cached path (BASELINE.json
config 4) instead.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_MPS = 5.0  # megapixels/sec/chip (BASELINE.json)


def bench_fusion_only(h, w, scale):
    import jax

    from __graft_entry__ import _fusion_model, _mock_batch

    model = _fusion_model()
    batch = _mock_batch(1, h, w)
    params = model.init(jax.random.PRNGKey(0), batch["lr"],
                        batch["expert_imgs"], batch["expert_feats"])
    fwd = jax.jit(lambda p, lr, i, f: model.apply(p, lr, i, f))
    args = (params, jax.device_put(batch["lr"]),
            jax.device_put(batch["expert_imgs"]),
            jax.device_put(batch["expert_feats"]))
    import jax.numpy as jnp
    float(jnp.sum(fwd(*args)))  # warm; sum forces real execution over the
    # relay (block_until_ready alone doesn't synchronize remote buffers)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = float(jnp.sum(fwd(*args)))
    return (time.perf_counter() - t0) / iters, "fusion_x4_throughput"


def bench_full(h, w, scale):
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.models.fusion.fusion_v2 import CompleteEnhancedFusionSR
    from freqfusion_tpu.models.pipeline import FreqFusionPipeline, build_expert_models

    expert_dtype = (jnp.float32
                    if os.environ.get("BENCH_DTYPE", "bf16") == "fp32"
                    else jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = int(os.environ.get("BENCH_BATCH", "1"))  # VERDICT r3 item 8:
    # the one-program pipeline interleaves VPU-bound (scan) and MXU-bound
    # (attention) phases, so batch>1 amortization must be measured on the
    # FULL program, not per expert.
    lr = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32))

    # Materialize params from eval_shape (no device compute; values don't
    # affect throughput — matmuls don't shortcut on content).
    def fake_init(init_fn, *args):
        shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0), *args)
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    init_lr = jnp.zeros((1, 32, 32, 3), jnp.float32)
    # use_scan: layer groups under nn.scan -> the whole 4-expert + fusion
    # pipeline compiles as ONE XLA program (jit_mode='full').
    models = build_expert_models(scale, use_scan=True)
    params = {}
    for name, model in models.items():
        params[name] = fake_init(model.init, init_lr)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params[name]))
        print(f"  {name}: {n / 1e6:.2f}M params", flush=True)

    fusion = CompleteEnhancedFusionSR(upscale=scale)
    mock_imgs = {k: jnp.zeros((1, 128, 128, 3)) for k in models}
    mock_feats = {k: jnp.zeros((1, 32, 32, FreqFusionPipeline.FEATURE_CHANNELS[k]))
                  for k in models}
    params["fusion"] = fake_init(fusion.init, init_lr, mock_imgs, mock_feats)

    fusion_dtype = (None if expert_dtype == jnp.float32
                    else expert_dtype)  # bf16 fusion: quality pinned by
    # tests/test_bf16_quality.py; BENCH_FUSION_DTYPE=fp32 reverts
    if os.environ.get("BENCH_FUSION_DTYPE") == "fp32":
        fusion_dtype = None
    pipeline = FreqFusionPipeline(params, scale=scale, fusion_model=fusion,
                                  jit_mode="full", use_scan=True,
                                  expert_dtype=expert_dtype,
                                  fusion_dtype=fusion_dtype)
    print(f"  expert dtype: {expert_dtype.__name__}", flush=True)
    t0 = time.perf_counter()
    float(jnp.sum(pipeline(lr)))  # sum forces real execution over the relay
    print(f"  compile+first run: {time.perf_counter() - t0:.1f}s", flush=True)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = float(jnp.sum(pipeline(lr)))
    per_img = (time.perf_counter() - t0) / iters / batch
    metric = ("freqfusion_full_x4_throughput" if batch == 1
              else f"freqfusion_full_x4_throughput_b{batch}")
    return per_img, metric


def _relay_alive(timeout_s: int = 120, attempts: int = 8,
                 wait_s: int = 30) -> bool:
    """Probe the axon relay with a trivial jit in a subprocess (the relay
    has gone down for multi-hour stretches — a dead relay makes every jit
    hang, so the probe must be killable). The relay also FLAPS on a
    minutes scale while a wedged worker restarts (observed 2026-08-19:
    single-shot probes recorded spurious RELAY_DOWN minutes after a
    successful probe), so retry a few recovery windows before declaring
    it down — bounded at ~attempts*(probe+wait) so the driver never
    hangs."""
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jax.jit(lambda a: a*2)"
            "(jnp.ones((64,64))))))")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i < attempts - 1:
            print(f"relay probe {i + 1}/{attempts} failed; "
                  f"retrying in {wait_s}s", flush=True)
            time.sleep(wait_s)
    return False


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "full")
    # DIV2K val LR images are ~510x340; bench a 512x336 16-multiple bucket.
    h, w, scale = 336, 512, 4
    if not _relay_alive():
        # Emit an explicit, honest failure record instead of hanging the
        # driver: no throughput was measurable because the TPU relay is
        # unreachable (observed as a multi-hour outage on 2026-08-17/18).
        print(json.dumps({
            "metric": "freqfusion_full_x4_throughput_RELAY_DOWN",
            "value": 0.0,
            "unit": "megapixels/sec/chip",
            "vs_baseline": 0.0,
        }))
        return
    if mode == "fusion":
        dt, metric = bench_fusion_only(h, w, scale)
    else:
        try:
            dt, metric = bench_full(h, w, scale)
        except Exception as e:  # compile-relay limits etc: degrade, still
            # report a real number rather than nothing
            print(f"full-pipeline bench failed ({type(e).__name__}): "
                  f"{str(e)[:400]}; falling back to fusion-only", flush=True)
            dt, metric = bench_fusion_only(h, w, scale)

    mps = (h * scale) * (w * scale) / 1e6 / dt
    print(json.dumps({
        "metric": metric,
        "value": round(mps, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mps / BASELINE_MPS, 3),
    }))


if __name__ == "__main__":
    main()
