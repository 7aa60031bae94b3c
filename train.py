#!/usr/bin/env python
"""Train the FreqFusionSR fusion network (TPU-native).

CLI mirrors the reference's train.py contract (reference train.py:47-67):
live-expert training is the DEFAULT; ``--cached`` is the opt-in fast path.

Live (experts run frozen inside the jitted step, train_epoch
reference train.py:130-248):

    python train.py --config configs/train_config.yaml \
        --model-dir model_zoo --lr-dir dataset/DF2K/train_LR \
        --hr-dir dataset/DF2K/train_HR

``--lr-dir/--hr-dir`` default to the config's dataset root/subdirs, so a
bare ``python train.py --model-dir model_zoo`` matches the reference's
config-driven default.

Cached (reference --cached, train.py:63-65; 10-20x faster — trains the
~1.2M-param fusion net against pre-extracted expert outputs from
scripts/extract_features.py instead of the frozen 131M-param experts):

    python train.py --cached --cache-dir data/cache/train \
        --val-cache-dir data/cache/val
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="FreqFusionSR-TPU training")
    p.add_argument("--config", type=str, default=None,
                   help="train_config.yaml (reference schema); defaults used if absent")
    p.add_argument("--cached", action="store_true",
                   help="train against pre-extracted expert caches "
                        "(opt-in, like the reference's --cached)")
    p.add_argument("--cache-dir", type=str, default="data/cache/train")
    p.add_argument("--val-cache-dir", type=str, default=None)
    p.add_argument("--lr-dir", type=str, default=None,
                   help="live mode: LR training images "
                        "(default: config train_root/train_LR)")
    p.add_argument("--hr-dir", type=str, default=None,
                   help="live mode: HR training images "
                        "(default: config train_root/train_HR)")
    p.add_argument("--model-dir", type=str, default="model_zoo",
                   help="live mode: frozen expert checkpoints "
                        "(.ckpt msgpack or reference .pth, converted lazily)")
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--resume", type=str, default=None, nargs="?", const="",
                   help="resume from checkpoint (path, or empty for latest)")
    p.add_argument("--epochs", type=int, default=None, help="override total epochs")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--debug", action="store_true",
                   help="tiny run: 2 epochs")
    return p.parse_args(argv)


def _load_live_experts(model_dir: str, scale: int):
    """Frozen expert params + matching models for in-step inference.

    Uses the submission loader's lazy-convert/graceful-degradation path
    (interface/io.py) so live training accepts the same model_zoo layout
    as inference; scan variants keep the single-step HLO small enough for
    the remote compiler."""
    from freqfusion_tpu.interface.io import _load_params
    from freqfusion_tpu.models.pipeline import (build_expert_models,
                                                restack_params_for_scan)

    params, overrides = _load_params(model_dir)
    params.pop("fusion", None)  # the fusion net is what we train
    params = restack_params_for_scan(params)
    models = build_expert_models(scale, use_scan=True,
                                 overrides=overrides or None)
    models = {k: m for k, m in models.items() if k in params}
    return params, models


def build_trainer(args, cfg):
    """CLI -> FusionTrainer wiring (separated for tests/test_train_cli.py)."""
    from freqfusion_tpu.training.trainer import FusionTrainer

    if args.cached:
        return FusionTrainer(cfg, args.cache_dir,
                             val_cache_dir=args.val_cache_dir,
                             checkpoint_dir=args.checkpoint_dir)

    lr_dir = args.lr_dir or os.path.join(cfg.dataset.train_root,
                                         cfg.dataset.train_lr_subdir)
    hr_dir = args.hr_dir or os.path.join(cfg.dataset.train_root,
                                         cfg.dataset.train_hr_subdir)
    expert_params, expert_models = _load_live_experts(args.model_dir,
                                                      cfg.dataset.scale)
    return FusionTrainer(cfg, val_cache_dir=args.val_cache_dir,
                         checkpoint_dir=args.checkpoint_dir,
                         live_data=(lr_dir, hr_dir),
                         expert_params=expert_params,
                         expert_models=expert_models)


def main(argv=None):
    args = parse_args(argv)

    import dataclasses

    from freqfusion_tpu.config import default_config, load_config

    cfg = load_config(args.config) if args.config else default_config()
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training,
                                              batch_size=args.batch_size))

    trainer = build_trainer(args, cfg)
    if args.resume is not None:
        trainer.maybe_resume(args.resume or None)

    total = args.epochs or (2 if args.debug else None)
    final = trainer.fit(total)
    if final:
        print(f"final: {final}")


if __name__ == "__main__":
    main()
