"""Learning-rate schedule and the 3-stage loss curriculum scheduler.

LR schedule reproduces the reference recipe (train.py:847-866, 1039-1082;
configs/train_config.yaml:97-133): a linear ramp from warmup_lr to base_lr
over the first ``warmup_epochs`` epochs (reference warmup_lr(),
train.py:121-127: lr = warmup_lr + (base_lr - warmup_lr) * epoch /
warmup_epochs), then torch-semantics CosineAnnealingWarmRestarts (T_0=50,
T_mult=2) stepped once per epoch. Expressed as a pure function of the
global step so it composes with optax.

MultiStageLossScheduler mirrors src/training/multi_stage_scheduler.py:23-123:
an epoch -> stage mapping with contiguity validation and stage-change
reporting; the stage weights drive CombinedLoss.set_weights.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

from ..config import LossStage, SchedulerConfig

__all__ = ["cosine_warm_restarts", "lr_at_epoch", "MultiStageLossScheduler"]


def cosine_warm_restarts(epoch: float, base_lr: float, eta_min: float,
                         t_0: int, t_mult: int) -> float:
    """torch.optim.lr_scheduler.CosineAnnealingWarmRestarts at ``epoch``."""
    if t_mult == 1:
        t_cur = epoch % t_0
        t_i = t_0
    else:
        # Find the restart cycle containing `epoch`.
        n = int(math.log(max(epoch / t_0 * (t_mult - 1) + 1, 1), t_mult))
        start = t_0 * (t_mult ** n - 1) / (t_mult - 1)
        t_i = t_0 * t_mult ** n
        t_cur = epoch - start
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t_cur / t_i)) / 2


def lr_at_epoch(epoch, cfg: SchedulerConfig, base_lr: float):
    """jnp-traceable LR at ``epoch``: warmup epochs hold warmup_lr, then
    per-epoch cosine warm restarts (the reference steps its scheduler once
    per epoch post-warmup, train.py:1081-1082)."""
    return _lr_at_epoch_jnp(epoch, cfg, base_lr)


def _lr_at_epoch_jnp(epoch, cfg: SchedulerConfig, base_lr: float):
    import jax.numpy as jnp

    e = jnp.asarray(epoch, jnp.float32)
    warm = jnp.asarray(cfg.warmup_lr, jnp.float32)
    # Cosine epoch counts from the end of warmup, matching the reference
    # (scheduler.step() only runs post-warmup, train.py:1081-1082).
    ec = jnp.maximum(e - cfg.warmup_epochs, 0.0)
    if cfg.T_mult == 1:
        t_cur = jnp.mod(ec, cfg.T_0)
        t_i = jnp.asarray(float(cfg.T_0), jnp.float32)
    else:
        ratio = ec / cfg.T_0 * (cfg.T_mult - 1) + 1.0
        n = jnp.floor(jnp.log(jnp.maximum(ratio, 1.0)) / math.log(cfg.T_mult))
        start = cfg.T_0 * (cfg.T_mult ** n - 1.0) / (cfg.T_mult - 1)
        t_i = cfg.T_0 * cfg.T_mult ** n
        t_cur = ec - start
    cos_lr = cfg.eta_min + (base_lr - cfg.eta_min) * (
        1.0 + jnp.cos(math.pi * t_cur / t_i)) / 2.0
    # Linear warmup ramp (reference train.py:121-127).
    warm_lr = warm + (base_lr - warm) * e / max(cfg.warmup_epochs, 1)
    return jnp.where(e < cfg.warmup_epochs, warm_lr, cos_lr)


class MultiStageLossScheduler:
    """Epoch -> loss-stage mapping with continuity validation."""

    def __init__(self, stages: Sequence[LossStage]):
        if not stages:
            raise ValueError("at least one loss stage required")
        self.stages: List[LossStage] = list(stages)
        self._validate()
        self._current: Optional[int] = None

    def _validate(self) -> None:
        prev_end = None
        for s in self.stages:
            lo, hi = s.epochs
            if hi <= lo:
                raise ValueError(f"stage {s.stage_name}: empty range {s.epochs}")
            if prev_end is not None and lo != prev_end:
                raise ValueError(
                    f"stage {s.stage_name}: gap/overlap at epoch {lo} "
                    f"(previous stage ended at {prev_end})")
            prev_end = hi

    def stage_index(self, epoch: int) -> int:
        for i, s in enumerate(self.stages):
            if s.epochs[0] <= epoch < s.epochs[1]:
                return i
        return len(self.stages) - 1  # clamp past the last stage

    def step(self, epoch: int) -> Tuple[Dict[str, float], bool]:
        """Returns (weights for this epoch, changed_this_call)."""
        idx = self.stage_index(epoch)
        changed = idx != self._current
        self._current = idx
        return dict(self.stages[idx].weights), changed

    @property
    def current_stage(self) -> Optional[LossStage]:
        return None if self._current is None else self.stages[self._current]
