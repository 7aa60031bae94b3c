"""Live-expert training mode: experts inside the jitted step
(the reference's non-cached train_epoch, train.py:130-248)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from freqfusion_tpu.config import (CheckpointConfig, FusionConfig,
                                   LossStage, ValidationConfig,
                                   default_config)
from freqfusion_tpu.models.drct import DRCT
from freqfusion_tpu.models.grl import GRL
from freqfusion_tpu.models.mambair import MambaIR
from freqfusion_tpu.models.nafnet import NAFNetSR
from freqfusion_tpu.utils.image_io import write_image


def test_live_training_step(tmp_path):
    from freqfusion_tpu.training.trainer import FusionTrainer

    rng = np.random.default_rng(0)
    lr_dir, hr_dir = tmp_path / "lr", tmp_path / "hr"
    lr_dir.mkdir()
    hr_dir.mkdir()
    for i in range(3):
        lr = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        hr = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        write_image(str(lr_dir / f"{i}.png"), lr)
        write_image(str(hr_dir / f"{i}.png"), hr)

    models = {
        "drct": DRCT(upscale=4, embed_dim=180, num_layers=1, num_heads=6,
                     window_size=8, gc=8),
        "grl": GRL(upscale=4, embed_dim=180, depths=(1,), num_heads_w=3,
                   num_heads_s=3, window_size=8),
        "nafnet": NAFNetSR(upscale=4, width=64, middle_blk_num=1,
                           enc_blk_nums=(1,), dec_blk_nums=(1,)),
        "mamba": MambaIR(upscale=4, embed_dim=180, depths=(1,),
                         scan_chunk=64),
    }
    lr0 = jnp.zeros((1, 8, 8, 3))
    expert_params = {k: m.init(jax.random.PRNGKey(i), lr0)
                     for i, (k, m) in enumerate(models.items())}

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        fusion=FusionConfig(fusion_dim=32, refine_channels=32,
                            refine_depth=3, base_channels=16),
        training=dataclasses.replace(cfg.training, total_epochs=1,
                                     batch_size=2, accumulation_steps=1),
        loss=dataclasses.replace(
            cfg.loss, stages=(LossStage((0, 1), "s0", {"l1": 1.0}),)),
        dataset=dataclasses.replace(cfg.dataset, lr_patch_size=8),
        validation=ValidationConfig(validate_every=100),
        checkpoint=CheckpointConfig(checkpoint_dir=str(tmp_path / "ckpt")),
    )
    trainer = FusionTrainer(cfg, live_data=(str(lr_dir), str(hr_dir)),
                            expert_params=expert_params,
                            expert_models=models)
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])
