"""Tracing / profiling utilities (SURVEY.md 5.1).

The reference's only instrumentation is an eval-time FLOP counter and a
cuda-synchronized throughput loop (`src/evaluation/metrics.py:58-97`). The
TPU-native equivalents:

  * `profile_trace`       — jax.profiler trace capture around a callable
                            (viewable in TensorBoard / Perfetto),
  * `StepTimer`           — block_until_ready-bracketed step timing with
                            percentile summary,
  * `step_cost_analysis`  — FLOPs / bytes-accessed from the compiled XLA
                            executable of any jitted function.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax
import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str | Path):
    """Capture a jax.profiler device trace into `log_dir`."""
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device synchronization."""

    def __init__(self):
        self.times_ms: list[float] = []

    @contextlib.contextmanager
    def measure(self, result_getter=None):
        start = time.perf_counter()
        yield
        self.times_ms.append((time.perf_counter() - start) * 1e3)

    def time_fn(self, fn, *args, iters: int = 20, warmup: int = 3):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        for _ in range(iters):
            start = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            self.times_ms.append((time.perf_counter() - start) * 1e3)
        return out

    def summary(self) -> dict[str, float]:
        t = np.asarray(self.times_ms)
        return {
            "mean_ms": float(t.mean()),
            "p50_ms": float(np.percentile(t, 50)),
            "p90_ms": float(np.percentile(t, 90)),
            "min_ms": float(t.min()),
            "steps": len(t),
        }


def step_cost_analysis(jitted_fn, *example_args) -> dict[str, float]:
    """FLOPs and bytes accessed of a jitted function's compiled executable
    (XLA cost model; TPU replacement for torch FlopCounterMode)."""
    compiled = jitted_fn.lower(*example_args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    if cost is None:
        return {}
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
        "transcendentals": float(cost.get("transcendentals", 0.0)),
    }
