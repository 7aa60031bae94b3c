"""Training observability: JSONL metric log + console progress.

Replaces the reference's TensorBoardLogger / ProgressLogger / file logger
trio (src/utils/logger.py, utils/utils_logger.py) with a dependency-free
JSONL stream that scripts/monitoring can tail (the reference's
scripts/monitor_training.py pattern). TensorBoard can be layered on by
pointing it at the same values; the log format is stable.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Dict, Optional

__all__ = ["MetricLogger", "Stopwatch", "TensorBoardLogger"]


class TensorBoardLogger:
    """Optional TensorBoard channel (scalars, grouped scalars, image grids)
    mirroring the reference's src/utils/logger.py:31+. No-ops gracefully
    when tensorboard isn't importable — the JSONL MetricLogger remains the
    canonical record either way."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(logdir)
        except ImportError:  # pragma: no cover
            self._w = None

    @property
    def available(self) -> bool:
        return self._w is not None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._w:
            self._w.add_scalar(tag, float(value), step)

    def scalars(self, metrics: Dict[str, float], step: int,
                prefix: str = "") -> None:
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self.scalar(f"{prefix}{k}", v, step)

    def images(self, tag: str, images, step: int) -> None:
        """images: [N, H, W, C] float in [0,1] (NHWC, converted for TB)."""
        if self._w:
            import numpy as _np
            arr = _np.clip(_np.asarray(images), 0.0, 1.0)
            self._w.add_images(tag, arr, step, dataformats="NHWC")

    def flush(self) -> None:
        if self._w:
            self._w.flush()


class MetricLogger:
    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, metrics: Dict) -> None:
        rec = {"time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if isinstance(v, (int, float)) else v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read(self):
        if not self.path.exists():
            return []
        return [json.loads(line) for line in self.path.read_text().splitlines()
                if line.strip()]


class Stopwatch:
    """Wall-clock timing with named laps (replaces ad-hoc prints around
    train.py:1140-1159)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.laps: Dict[str, float] = {}

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.laps[name] = dt
        self.t0 = now
        return dt
