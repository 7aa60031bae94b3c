"""Checkpoint manager: atomic saves, best-K tracking, amnesia-proof resume.

Re-design of the reference's CheckpointManager (src/utils/
checkpoint_manager.py:25-317): atomic tmp+rename writes, best-K tracking
with the metric encoded in the filename, reconstruction of the best list
from on-disk ``best_*`` files after a restart (the "restart amnesia fix",
checkpoint_manager.py:63-86), a ``latest`` copy, and a JSON training
history. Checkpoints carry params + optimizer state + EMA shadow + epoch +
metrics (train.py:1116-1130).

Serialization is flax msgpack over the raw pytrees — single-host, crash-safe
via rename. (Orbax is the right tool once checkpoints shard across hosts;
the manager API here is storage-agnostic so that swap stays local.)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

__all__ = ["CheckpointManager", "save_pytree", "load_pytree"]

_BEST_RE = re.compile(r"best_(?P<metric>[-+0-9.eE]+)_epoch_(?P<epoch>\d+)\.ckpt$")


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any) -> None:
    """Atomic msgpack write (tmp + rename, checkpoint_manager.py:149-152)."""
    data = serialization.to_bytes(_to_numpy(tree))
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


class CheckpointManager:
    def __init__(self, directory: str, keep_best_k: int = 5,
                 keep_last_n: int = 10, metric: str = "psnr",
                 mode: str = "max"):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_best_k = keep_best_k
        self.keep_last_n = keep_last_n
        self.metric = metric
        self.mode = mode
        self.history_path = self.dir / "history.json"
        self.best: List[Tuple[float, Path]] = []
        self._reconstruct_best()

    # -- restart amnesia fix: rebuild best list from disk ----------------
    def _reconstruct_best(self) -> None:
        for p in self.dir.glob("best_*.ckpt"):
            m = _BEST_RE.search(p.name)
            if m:
                self.best.append((float(m.group("metric")), p))
        self._sort_best()

    def _sort_best(self) -> None:
        self.best.sort(key=lambda t: t[0], reverse=(self.mode == "max"))

    def _is_improvement(self, value: float) -> bool:
        if len(self.best) < self.keep_best_k:
            return True
        worst = self.best[-1][0]
        return value > worst if self.mode == "max" else value < worst

    # -- public API -------------------------------------------------------
    def save(self, tree: Any, epoch: int, metrics: Optional[Dict[str, float]] = None,
             scheduled: bool = False) -> Dict[str, str]:
        """Save ``tree`` for ``epoch``; manages epoch/best/latest copies."""
        metrics = metrics or {}
        written: Dict[str, str] = {}

        if scheduled:
            path = self.dir / f"epoch_{epoch:04d}.ckpt"
            save_pytree(str(path), tree)
            written["epoch"] = str(path)
            self._prune_last_n()

        value = metrics.get(self.metric)
        if value is not None and self._is_improvement(float(value)):
            path = self.dir / f"best_{float(value):.4f}_epoch_{epoch:04d}.ckpt"
            save_pytree(str(path), tree)
            self.best.append((float(value), path))
            self._sort_best()
            while len(self.best) > self.keep_best_k:
                _, drop = self.best.pop()
                drop.unlink(missing_ok=True)
            written["best"] = str(path)

        latest = self.dir / "latest.ckpt"
        save_pytree(str(latest), tree)
        written["latest"] = str(latest)

        self._append_history(epoch, metrics)
        return written

    def _prune_last_n(self) -> None:
        epochs = sorted(self.dir.glob("epoch_*.ckpt"))
        while len(epochs) > self.keep_last_n:
            epochs.pop(0).unlink(missing_ok=True)

    def _append_history(self, epoch: int, metrics: Dict[str, float]) -> None:
        history = []
        if self.history_path.exists():
            try:
                history = json.loads(self.history_path.read_text())
            except json.JSONDecodeError:
                history = []
        history.append({"epoch": epoch, "time": time.time(),
                        **{k: float(v) for k, v in metrics.items()}})
        tmp = self.history_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(history, indent=1))
        os.replace(tmp, self.history_path)

    def latest_path(self) -> Optional[str]:
        p = self.dir / "latest.ckpt"
        return str(p) if p.exists() else None

    def best_path(self) -> Optional[str]:
        return str(self.best[0][1]) if self.best else None

    def restore(self, target: Any, path: Optional[str] = None) -> Any:
        path = path or self.latest_path()
        if path is None:
            raise FileNotFoundError(f"no checkpoint in {self.dir}")
        return load_pytree(path, target)

    def history(self) -> List[Dict[str, float]]:
        if self.history_path.exists():
            return json.loads(self.history_path.read_text())
        return []
