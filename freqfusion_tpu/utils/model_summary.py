"""Model summary: parameter counts and FLOPs.

Equivalent of utils/model_summary.py (fvcore FLOP counter,
get_model_flops/params :10-50) — on the XLA side, FLOPs come from the
compiler's own cost analysis of the lowered program, which is exact for
the executed HLO rather than an op-table estimate.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

__all__ = ["count_params", "estimate_flops", "summarize"]


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def estimate_flops(fn: Callable, *args: Any) -> Optional[float]:
    """FLOPs of fn(*args) from XLA cost analysis (None if unavailable)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:  # pragma: no cover — backend-specific
        return None


def summarize(name: str, params: Any, fn: Optional[Callable] = None,
              *args: Any) -> Dict[str, float]:
    out: Dict[str, float] = {"name": name,
                             "params_m": count_params(params) / 1e6}
    if fn is not None:
        flops = estimate_flops(fn, *args)
        if flops:
            out["gflops"] = flops / 1e9
    return out
