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


def parse_trace_device_ops(logdir: str, top: int = 30) -> List[Dict]:
    """Aggregate on-device op times from a ``trace_profile``/``jax.profiler``
    trace directory — a text-mode substitute for the TensorBoard trace
    viewer (no TB needed on a headless TPU host).

    Returns [{"op": <coarse op kind>, "ms": total, "count": n}, ...] sorted
    by time, aggregated over every device-lane complete event.  The coarse
    kind strips fusion/dot indices ("fusion.123" -> "fusion") so repeated
    layers collapse into one row.
    """
    import glob
    import gzip
    import json
    from collections import defaultdict

    agg: Dict[str, float] = defaultdict(float)
    cnt: Dict[str, int] = defaultdict(int)
    for path in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        pid_names = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        device_pids = {
            pid
            for pid, name in pid_names.items()
            if "TPU" in name or "/device" in name.lower() or "XLA" in name
        }
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            if device_pids and e.get("pid") not in device_pids:
                continue
            kind = e.get("name", "").split(".")[0].split("(")[0]
            agg[kind] += e.get("dur", 0) / 1e3
            cnt[kind] += 1
    rows = [
        {"op": k, "ms": round(v, 3), "count": cnt[k]}
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1])
    ]
    return rows[:top]


def device_profile(fn: Callable, *args, iters: int = 3, top: int = 30) -> List[Dict]:
    """One-call on-device profile of a jitted callable: runs ``fn`` under a
    jax.profiler trace and returns the aggregated per-op device times
    (ms per iteration).  The tool this framework's own kernel optimisation
    campaign ran on (PERF.md round 2)."""
    import tempfile

    out = fn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as logdir:
        with trace_profile(logdir):
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
        rows = parse_trace_device_ops(logdir, top=top)
    for r in rows:
        # ms is per ITERATION; count stays the total over the trace so
        # one-time ops (count < iters) are visible rather than floored to 0
        r["ms"] = round(r["ms"] / iters, 3)
    return rows
