"""Hardware training receipt (VERDICT r3 item 4): a few hundred cached
fusion training steps on the real chip — steps/s + a decreasing loss
curve, committed to BENCH_NOTES.

Builds a synthetic .npz cache (the cached-training path, exactly like
tests/test_trainer.py), sets a fixed blend of the expert images as HR (a
representable target, so the loss must actually fall), and runs the
trainer's own compiled step. Run when the relay is up:

    python scripts/train_receipt.py [--steps 300] [--patch 64] [--bs 4]
"""
from __future__ import annotations

import argparse
import dataclasses as dc
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--patch", type=int, default=64)  # LR patch (HR=4x)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--full-fusion", action="store_true",
                    help="full fusion geometry (default: the tiny test "
                         "config for a fast receipt)")
    args = ap.parse_args()

    from freqfusion_tpu.config import (CheckpointConfig, FusionConfig,
                                       LossStage, ValidationConfig,
                                       default_config)
    from freqfusion_tpu.data.cached import EXPERTS, FEATURE_CHANNELS
    from freqfusion_tpu.training.trainer import (FusionTrainer,
                                                 _batch_to_model_inputs)

    tmp = Path(tempfile.mkdtemp())
    cache = tmp / "cache"
    cache.mkdir()
    rng = np.random.default_rng(0)
    h, s = args.patch, 4
    n_samples = max(args.bs, 4)
    for i in range(n_samples):
        sample = {
            "lr": rng.uniform(0, 1, (h, h, 3)).astype(np.float32),
            "hr": np.zeros((h * s, h * s, 3), np.float32),
        }
        blend = {"drct": 0.4, "grl": 0.3, "nafnet": 0.2, "mamba": 0.1}
        for e in EXPERTS:
            img = rng.uniform(0, 1, (h * s, h * s, 3)).astype(np.float32)
            sample[f"{e}_img"] = img
            sample[f"{e}_feat"] = rng.normal(
                size=(h, h, FEATURE_CHANNELS[e])).astype(np.float32)
            sample["hr"] += blend[e] * img
        sample["hr"] = np.clip(sample["hr"], 0, 1).astype(np.float32)
        np.savez_compressed(cache / f"sample_{i:03d}.npz", **sample)

    cfg = default_config()
    fusion = (cfg.fusion if args.full_fusion else
              FusionConfig(fusion_dim=32, refine_channels=32,
                           refine_depth=3, base_channels=16))
    cfg = dc.replace(
        cfg,
        fusion=fusion,
        training=dc.replace(
            cfg.training, total_epochs=1, batch_size=args.bs,
            accumulation_steps=1,
            optimizer=dc.replace(cfg.training.optimizer, lr=args.lr),
            scheduler=dc.replace(cfg.training.scheduler,
                                 warmup_epochs=0, T_0=100000)),
        loss=dc.replace(cfg.loss, stages=(
            LossStage((0, 10 ** 6), "s0", {"l1": 1.0}),)),
        validation=ValidationConfig(validate_every=10 ** 6),
        checkpoint=CheckpointConfig(checkpoint_dir=str(tmp / "ckpt"),
                                    save_every=10 ** 6),
    )
    trainer = FusionTrainer(cfg, str(cache), n_devices=1)
    trainer.state = trainer._init_state()
    step_fn = trainer._step_for_stage(0, {"l1": 1.0})
    batch = _batch_to_model_inputs(next(iter(trainer.batcher)))

    import jax.numpy as jnp
    state = trainer.state
    t0 = time.time()
    state, m = step_fn(state, batch)
    first = float(m["loss"])  # sync: materializes the first step
    print(f"compile+step0: {time.time() - t0:.1f}s  loss {first:.5f}",
          flush=True)

    curve = [(0, first)]
    t0 = time.time()
    for i in range(1, args.steps):
        state, m = step_fn(state, batch)
        if i % 50 == 0:
            curve.append((i, float(m["loss"])))  # syncs every 50 steps
            print(f"  step {i}: loss {curve[-1][1]:.5f}", flush=True)
    last = float(m["loss"])  # final sync
    dt = time.time() - t0
    curve.append((args.steps - 1, last))
    print(json.dumps({
        "metric": "fusion_train_steps_per_sec",
        "steps": args.steps, "batch": args.bs, "lr_patch": args.patch,
        "steps_per_sec": round((args.steps - 1) / dt, 3),
        "loss_first": round(first, 5), "loss_last": round(last, 5),
        "loss_drop_x": round(first / max(last, 1e-9), 2),
        "curve": curve,
    }))


if __name__ == "__main__":
    main()
