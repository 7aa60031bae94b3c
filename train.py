#!/usr/bin/env python
"""Train the FreqFusionSR fusion network (TPU-native).

CLI mirrors the reference's train.py (reference train.py:47-67):

    python train.py --config configs/train_config.yaml --cached \
        --cache-dir data/cache/train --val-cache-dir data/cache/val

Cached mode trains the ~1.2M-param fusion net against pre-extracted expert
outputs — 10-20x faster than running the frozen 131M-param experts live
(reference train.py:13). Caches are produced by scripts/extract_features.py.
"""

from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="FreqFusionSR-TPU training")
    p.add_argument("--config", type=str, default=None,
                   help="train_config.yaml (reference schema); defaults used if absent")
    p.add_argument("--cached", action="store_true", default=True,
                   help="train against pre-extracted expert caches (default)")
    p.add_argument("--cache-dir", type=str, default="data/cache/train")
    p.add_argument("--val-cache-dir", type=str, default=None)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--resume", type=str, default=None, nargs="?", const="",
                   help="resume from checkpoint (path, or empty for latest)")
    p.add_argument("--epochs", type=int, default=None, help="override total epochs")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--debug", action="store_true",
                   help="tiny run: 2 epochs")
    return p.parse_args()


def main():
    args = parse_args()

    import dataclasses

    from freqfusion_tpu.config import default_config, load_config
    from freqfusion_tpu.training.trainer import FusionTrainer

    cfg = load_config(args.config) if args.config else default_config()
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training,
                                              batch_size=args.batch_size))

    trainer = FusionTrainer(cfg, args.cache_dir,
                            val_cache_dir=args.val_cache_dir,
                            checkpoint_dir=args.checkpoint_dir)
    if args.resume is not None:
        trainer.maybe_resume(args.resume or None)

    total = args.epochs or (2 if args.debug else None)
    final = trainer.fit(total)
    if final:
        print(f"final: {final}")


if __name__ == "__main__":
    main()
