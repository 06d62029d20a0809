"""Profiling / timing utilities.

TPU equivalents of the reference's measurement machinery (SURVEY.md §5.1):
``cuda.synchronize``-bracketed wall timing becomes ``block_until_ready``
bracketing; torch-free FLOPs accounting via the model's analytic ``flops()``
or XLA's cost analysis; ``jax.profiler`` traces replace the absent
torch.profiler.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


class StepTimer:
    """Synchronized per-step timing with percentile summary
    (the reference's per-sample timing, test_transmar_syndeeplesion.py:929-938)."""

    def __init__(self):
        self.times: List[float] = []

    @contextlib.contextmanager
    def measure(self, result_getter: Optional[Callable] = None):
        t0 = time.perf_counter()
        yield
        if result_getter is not None:
            jax.block_until_ready(result_getter())
        self.times.append(time.perf_counter() - t0)

    def time_fn(self, fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            self.times.append(time.perf_counter() - t0)
        return self.summary()["mean"]

    def summary(self) -> Dict[str, float]:
        t = np.asarray(self.times)
        if t.size == 0:
            return {}
        return {
            "mean": float(t.mean()),
            "median": float(np.median(t)),
            "p5": float(np.percentile(t, 5)),
            "p95": float(np.percentile(t, 95)),
            "n": int(t.size),
        }


@contextlib.contextmanager
def trace_profile(logdir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def model_flops(fn: Callable, *args) -> Optional[float]:
    """XLA-reported FLOPs for a jitted callable (None if unavailable)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None
