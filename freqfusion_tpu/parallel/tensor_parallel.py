"""Tensor-parallel sharding specs for expert inference.

The reference has no model parallelism (its experts fit one GPU; SURVEY.md
§2.7). On TPU pods the same models can be served tensor-parallel the
GSPMD way: annotate the PARAMETER shardings over the mesh's 'model' axis
and let XLA propagate and insert the collectives — no manual all-reduce
calls, no code changes in the models themselves.

Rule (the standard Megatron-style column split, applied automatically):
shard the OUTPUT-features axis of every weight whose output dimension
divides the axis size — dense kernels [in, out] on out, conv kernels
[kh, kw, in, out] on out, biases [out] on out. XLA then keeps each
matmul's output feature-sharded, re-gathering only where an op actually
needs the full feature axis (layer norms, reshapes through window
partitions, the final conv). For SR experts — dominated by feature-major
convs/matmuls — propagation keeps most of the network sharded end to end.

This is deliberately parameter-driven (works for any of the 8 expert
families without per-model plumbing); bespoke per-activation annotations
can only tighten it further.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_param_shardings", "tp_apply"]


def _leaf_spec(x, axis: str, size: int) -> P:
    shape = getattr(x, "shape", ())
    if len(shape) == 0:
        return P()
    out_dim = shape[-1]
    if out_dim % size == 0 and out_dim >= size:
        return P(*([None] * (len(shape) - 1) + [axis]))
    return P()


def tp_param_shardings(params: Any, mesh: Mesh,
                       axis: str = "model") -> Any:
    """NamedSharding tree for a params pytree: last (output-features) axis
    over the mesh 'model' axis wherever it divides evenly, else
    replicated."""
    size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _leaf_spec(x, axis, size)), params)


def tp_apply(model, params: Any, mesh: Mesh, axis: str = "model"):
    """Jit model.apply with tensor-parallel params and replicated input.

    Returns (jitted_fn, sharded_params). The input/output stay replicated;
    XLA inserts the feature-axis collectives where propagation demands."""
    shardings = tp_param_shardings(params, mesh, axis)
    sharded = jax.device_put(params, shardings)
    repl = NamedSharding(mesh, P())
    fn = jax.jit(lambda p, x: model.apply(p, x),
                 in_shardings=(shardings, repl), out_shardings=repl)
    return fn, sharded
