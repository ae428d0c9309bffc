"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling").

The reference's only instrumentation is ad-hoc ``torch.cuda.memory_allocated``
prints (vn_pointr.py:581-650) and a kernel timing loop (unit_test.py:38-61).
TPU-native equivalents:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory (xplane) for a region of steps.
- :class:`StepTimer` — wall-clock per-step timing with warmup discard and
  percentile summary; forces a host sync via a scalar read so the numbers are
  real on asynchronous dispatch backends.
- :func:`device_memory_stats` — per-device HBM usage snapshot.
- :func:`log_compile_time` — wraps a jitted fn, reporting first-call
  (compile) versus steady-state latency.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a region: ``with trace('/tmp/tb'): run_steps()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Collects per-step wall times; ``summary()`` gives p50/p90/mean."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        ts = np.array(self.times[self.warmup :] or self.times)
        return {
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p90_s": float(np.percentile(ts, 90)),
            "steps": len(ts),
        }


def device_memory_stats() -> List[Dict[str, float]]:
    """Per-device memory snapshot (bytes); empty entries where unsupported."""
    out = []
    for d in jax.devices():
        stats = {}
        try:
            raw = d.memory_stats() or {}
            stats = {
                "bytes_in_use": raw.get("bytes_in_use", 0),
                "peak_bytes_in_use": raw.get("peak_bytes_in_use", 0),
                "bytes_limit": raw.get("bytes_limit", 0),
            }
        except Exception:
            pass
        stats["device"] = str(d)
        out.append(stats)
    return out


def log_compile_time(fn: Callable, *args, sync: Callable = None):
    """Run ``fn`` twice, returning (compile_plus_run_s, steady_run_s)."""

    def _sync(out):
        if sync is not None:
            return sync(out)
        leaves = jax.tree.leaves(out)
        if leaves:
            np.asarray(leaves[0]).ravel()
        return out

    t0 = time.perf_counter()
    _sync(fn(*args))
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sync(fn(*args))
    steady = time.perf_counter() - t0
    return first, steady
