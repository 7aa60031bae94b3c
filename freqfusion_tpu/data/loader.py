"""Minimal batching iterator over map-style datasets.

Replaces torch DataLoader for the fusion training loop. Host-sharded input:
``Batcher(shard_id, num_shards)`` partitions the sample index space, which
is how per-host loading composes with a data mesh (each host feeds its
local devices; see parallel/mesh.py).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import numpy as np

__all__ = ["Batcher", "PrefetchLoader"]


class PrefetchLoader:
    """Background-thread prefetch around any batch iterable.

    Overlaps host-side loading/augmentation with device compute — the
    TPU-side replacement for torch DataLoader's worker processes
    (num_workers, configs/train_config.yaml:104). Threads suffice here:
    the heavy per-sample work (image decode via cv2, the C crop_geom
    kernel) releases the GIL.
    """

    def __init__(self, batcher, prefetch: int = 2):
        self.batcher = batcher
        self.prefetch = prefetch

    def set_epoch(self, epoch: int) -> None:
        self.batcher.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.batcher)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def put(item) -> bool:
            """Timed put so the worker can observe early consumer exit."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            # Loader/augmentation errors are enqueued and re-raised in the
            # consumer — a silent epoch truncation would train on partial
            # data with no signal.
            try:
                for batch in self.batcher:
                    if not put(batch):
                        return
                put(sentinel)
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                put(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while True:  # drain so a blocked worker sees `stop` and exits
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)


class Batcher:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 shard_id: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        idx = idx[self.shard_id :: self.num_shards]
        stop = (len(idx) // self.batch_size * self.batch_size
                if self.drop_last else len(idx))
        for start in range(0, stop, self.batch_size):
            items = [self.dataset[int(i)] for i in idx[start : start + self.batch_size]]
            yield _collate(items)


def _collate(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals  # e.g. names
    return out
