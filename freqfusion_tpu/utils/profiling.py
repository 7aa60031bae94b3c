"""Profiling / tracing hooks.

The reference's observability is ad-hoc CUDA-event and wall-clock prints
(test.py:63-70, train.py:1008-1024). TPU-native equivalents:

  - ``trace(logdir)``: jax.profiler trace context (open in TensorBoard /
    Perfetto) around any region.
  - ``annotate(name)``: TraceAnnotation so custom regions show in traces.
  - ``step_timer``: host-side per-step timing with jax block_until_ready
    semantics baked in.
  - ``hlo_dump(fn, *args)``: lowered/compiled HLO text for a jitted fn —
    the compiler-side "what did XLA do" hook.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator

import jax

__all__ = ["trace", "annotate", "StepTimer", "hlo_dump"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall timing that forces device completion."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self, result_ref=None):
        t0 = time.perf_counter()
        yield
        if result_ref is not None:
            jax.block_until_ready(result_ref)
        self.times.append(time.perf_counter() - t0)

    def summary(self):
        if not self.times:
            return {}
        import numpy as np
        arr = np.asarray(self.times)
        return {"mean_s": float(arr.mean()), "p50_s": float(np.median(arr)),
                "p95_s": float(np.percentile(arr, 95)), "n": len(arr)}


def hlo_dump(fn: Callable, *args: Any, optimized: bool = True) -> str:
    """Return the (optimized) HLO text for fn(*args)."""
    lowered = jax.jit(fn).lower(*args)
    if optimized:
        return lowered.compile().as_text()
    return lowered.as_text()
