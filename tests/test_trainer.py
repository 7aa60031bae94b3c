"""End-to-end cached training smoke tests (synthetic .npz caches),
mirroring the reference's scripts/test_cached_training.py gate."""

import dataclasses

import numpy as np
import pytest

from freqfusion_tpu.config import (Config, FusionConfig,
                                   LossStage,
                                   ValidationConfig, CheckpointConfig,
                                   default_config)
from freqfusion_tpu.data.cached import EXPERTS, FEATURE_CHANNELS


def _make_cache(tmp_path, n=4, h=8, scale=4, missing_mamba=False):
    rng = np.random.default_rng(0)
    d = tmp_path / "cache"
    d.mkdir(exist_ok=True)
    for i in range(n):
        sample = {
            "lr": rng.uniform(0, 1, (h, h, 3)).astype(np.float32),
            "hr": rng.uniform(0, 1, (h * scale, h * scale, 3)).astype(np.float32),
        }
        for e in EXPERTS:
            if missing_mamba and e == "mamba":
                continue
            sample[f"{e}_img"] = rng.uniform(
                0, 1, (h * scale, h * scale, 3)).astype(np.float32)
            sample[f"{e}_feat"] = rng.normal(
                size=(h, h, FEATURE_CHANNELS[e])).astype(np.float32)
        np.savez_compressed(d / f"sample_{i:03d}.npz", **sample)
    return str(d)


def _tiny_config(tmp_path) -> Config:
    cfg = default_config()
    stages = (
        LossStage((0, 1), "s0", {"l1": 1.0}),
        LossStage((1, 2), "s1", {"l1": 0.75, "swt": 0.2, "fft": 0.05}),
    )
    return dataclasses.replace(
        cfg,
        fusion=FusionConfig(fusion_dim=32, refine_channels=32,
                            refine_depth=3, base_channels=16),
        training=dataclasses.replace(cfg.training, total_epochs=2,
                                     batch_size=2, accumulation_steps=1),
        loss=dataclasses.replace(cfg.loss, stages=stages),
        validation=ValidationConfig(validate_every=1),
        checkpoint=CheckpointConfig(checkpoint_dir=str(tmp_path / "ckpt"),
                                    save_every=1),
    )


def test_cached_training_end_to_end(tmp_path):
    from freqfusion_tpu.training.trainer import FusionTrainer

    cache = _make_cache(tmp_path)
    cfg = _tiny_config(tmp_path)
    trainer = FusionTrainer(cfg, cache, val_cache_dir=cache)
    final = trainer.fit()

    assert np.isfinite(final["psnr"])
    assert trainer.ckpt.latest_path() is not None
    history = trainer.ckpt.history()
    assert len(history) == 2

    # loss stage transition happened (two distinct compiled steps)
    assert len(trainer._train_steps) == 2

    # resume restores epoch counter (amnesia-proof)
    trainer2 = FusionTrainer(cfg, cache, val_cache_dir=cache)
    assert trainer2.maybe_resume()
    assert trainer2.start_epoch == 2


def test_cached_training_missing_mamba_degrades(tmp_path):
    """Missing mamba cache -> zero features, training still works
    (cached_dataset.py:176-203 semantics)."""
    from freqfusion_tpu.training.trainer import FusionTrainer

    cache = _make_cache(tmp_path, missing_mamba=True)
    cfg = _tiny_config(tmp_path)
    trainer = FusionTrainer(cfg, cache)
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])
