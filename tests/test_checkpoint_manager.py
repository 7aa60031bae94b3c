"""CheckpointManager: best-K, pruning, history, restart-amnesia regression
(the reference's checkpoint_manager.py:384-512 test, as pytest)."""

import numpy as np

from freqfusion_tpu.training.checkpoint import CheckpointManager


def _tree(v):
    return {"w": np.full((4,), v, np.float32), "step": np.int32(v)}


def test_best_k_and_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep_best_k=2, keep_last_n=2)
    for epoch, psnr in enumerate([30.0, 32.0, 31.0, 33.0]):
        mgr.save(_tree(epoch), epoch, metrics={"psnr": psnr}, scheduled=True)

    # best-2 kept: 33.0 and 32.0
    bests = sorted(p.name for p in tmp_path.glob("best_*.ckpt"))
    assert len(bests) == 2
    assert any("33.0000" in b for b in bests)
    assert any("32.0000" in b for b in bests)
    # last-2 scheduled epochs kept
    epochs = sorted(p.name for p in tmp_path.glob("epoch_*.ckpt"))
    assert epochs == ["epoch_0002.ckpt", "epoch_0003.ckpt"]

    restored = mgr.restore(_tree(0))
    assert restored["step"] == 3  # latest

    history = mgr.history()
    assert [h["epoch"] for h in history] == [0, 1, 2, 3]


def test_restart_amnesia_reconstruction(tmp_path):
    """A new manager instance must rediscover the best list from disk
    (checkpoint_manager.py:63-86)."""
    mgr = CheckpointManager(str(tmp_path), keep_best_k=2)
    mgr.save(_tree(0), 0, metrics={"psnr": 30.0})
    mgr.save(_tree(1), 1, metrics={"psnr": 35.0})

    fresh = CheckpointManager(str(tmp_path), keep_best_k=2)
    assert len(fresh.best) == 2
    assert "35.0000" in fresh.best_path()
    # a worse metric must NOT displace the reconstructed bests
    fresh.save(_tree(2), 2, metrics={"psnr": 20.0})
    assert len(list(tmp_path.glob("best_*.ckpt"))) == 2
    assert not any("20.0000" in p.name for p in tmp_path.glob("best_*.ckpt"))
