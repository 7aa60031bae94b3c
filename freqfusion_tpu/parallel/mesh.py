"""Device mesh and sharding helpers: the framework's parallelism layer.

The reference has no collective communication at all — its "distribution"
is mp.spawn file-sharding plus hand-carried zip files (SURVEY.md §2.7).
The TPU-native replacement is a named device mesh:

  - ``data`` axis: batch data parallelism for fusion training and batched
    expert inference (gradients all-reduce over ICI automatically under jit
    when params are replicated and the batch is sharded).
  - ``model`` axis (optional, default 1): spatial sharding of full-image
    expert inference — window/stripe attention partitions are independent,
    so images shard cleanly along H — or tensor parallelism
    (parallel/tensor_parallel.py: Megatron-style feature-axis param
    shardings, GSPMD-propagated).
  - expert parallelism (parallel/expert_parallel.py): one frozen expert
    per device, host-async dispatch; ensemble latency becomes
    max(expert latencies).

Pipeline parallelism is deliberately absent: the ensemble is wide, not
deep — the four experts are mutually independent (ep covers them) and no
single expert's layer stack is worth a pipeline bubble at batch 1.

Everything routes through NamedSharding; no per-device Python loops.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings",
           "P"]


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch with its leading axis over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim > 0
        else x, batch)


def data_parallel_shardings(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding]:
    """(replicated-params, batch-sharded) pair for jit in_shardings."""
    return replicate(mesh), batch_sharding(mesh)
