"""LR schedule vs torch CosineAnnealingWarmRestarts; stage scheduler gates
(the reference's multi_stage_scheduler.py:126-201 boundary tests)."""

import numpy as np
import pytest

from freqfusion_tpu.config import LossStage, SchedulerConfig
from freqfusion_tpu.training.schedule import MultiStageLossScheduler


def test_cosine_warm_restarts_matches_torch():
    torch = pytest.importorskip("torch")
    from freqfusion_tpu.training.schedule import _lr_at_epoch_jnp

    base_lr, t0, tmult, eta_min = 2e-4, 5, 2, 5e-8
    cfg = SchedulerConfig(T_0=t0, T_mult=tmult, eta_min=eta_min,
                          warmup_epochs=0, warmup_lr=5e-7)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sch = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, T_mult=tmult, eta_min=eta_min)

    for epoch in range(40):
        expected = opt.param_groups[0]["lr"]
        got = float(_lr_at_epoch_jnp(epoch, cfg, base_lr))
        np.testing.assert_allclose(got, expected, rtol=1e-5,
                                   err_msg=f"epoch {epoch}")
        sch.step()


def test_warmup_epochs_ramp_linearly():
    # Reference warmup_lr() ramps linearly from warmup_lr to base_lr
    # (train.py:121-127): lr = warm + (base - warm) * epoch / warmup_epochs.
    from freqfusion_tpu.training.schedule import _lr_at_epoch_jnp

    base, warm = 2e-4, 5e-7
    cfg = SchedulerConfig(T_0=50, T_mult=2, eta_min=5e-8,
                          warmup_epochs=5, warmup_lr=warm)
    for e in range(5):
        expected = warm + (base - warm) * e / 5
        assert float(_lr_at_epoch_jnp(e, cfg, base)) == pytest.approx(
            expected, rel=1e-5), f"epoch {e}"
    # first post-warmup epoch starts the cosine at base_lr
    assert float(_lr_at_epoch_jnp(5, cfg, base)) == pytest.approx(base)


def test_stage_scheduler_boundaries():
    stages = (
        LossStage((0, 10), "a", {"l1": 1.0}),
        LossStage((10, 30), "b", {"l1": 0.75, "swt": 0.2}),
        LossStage((30, 50), "c", {"l1": 0.6, "ssim": 0.05}),
    )
    sched = MultiStageLossScheduler(stages)
    w, changed = sched.step(0)
    assert changed and w == {"l1": 1.0}
    _, changed = sched.step(9)
    assert not changed
    w, changed = sched.step(10)
    assert changed and w["swt"] == 0.2
    w, changed = sched.step(49)
    assert changed and "ssim" in w
    w, _ = sched.step(99)  # past the last stage: clamp
    assert "ssim" in w


def test_stage_scheduler_rejects_gaps():
    with pytest.raises(ValueError):
        MultiStageLossScheduler((
            LossStage((0, 10), "a", {"l1": 1.0}),
            LossStage((12, 30), "b", {"l1": 1.0}),
        ))
