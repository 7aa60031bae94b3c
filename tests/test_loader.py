"""PrefetchLoader error propagation + early-exit behavior.

The reference's torch DataLoader surfaces worker exceptions in the consumer
process; our thread-prefetch wrapper must do the same instead of silently
truncating the epoch.
"""

import time

import numpy as np
import pytest

from freqfusion_tpu.data.loader import Batcher, PrefetchLoader


class _ListDataset:
    def __init__(self, n, poison_at=None):
        self.n = n
        self.poison_at = poison_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.poison_at is not None and i == self.poison_at:
            raise RuntimeError("corrupt sample")
        return {"x": np.full((2,), float(i), np.float32)}


def test_prefetch_loader_reraises_worker_exception():
    ds = _ListDataset(16, poison_at=3)
    loader = PrefetchLoader(
        Batcher(ds, batch_size=4, shuffle=False), prefetch=2)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in loader:
            pass


def test_prefetch_loader_full_epoch_and_early_break():
    ds = _ListDataset(16)
    loader = PrefetchLoader(
        Batcher(ds, batch_size=4, shuffle=False), prefetch=1)
    assert sum(1 for _ in loader) == 4

    # Early consumer break must not deadlock the worker thread.
    t0 = time.time()
    for _ in loader:
        break
    # iterate again to prove the loader is reusable after a break
    assert sum(1 for _ in loader) == 4
    assert time.time() - t0 < 10.0
