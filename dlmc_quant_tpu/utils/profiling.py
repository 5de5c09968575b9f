"""Profiling helpers: jax.profiler traces + analytic rooflines.

TPU equivalents of the reference's tracing hooks (SURVEY.md §5):
``trace()`` wraps a region in a jax.profiler trace viewable in
TensorBoard/XProf; :func:`roofline` combines the analytic MAC count with
measured step time into achieved-vs-peak utilization.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

# v5e (TPU v5 lite) single-chip peaks
PEAK_TOPS = {"int8": 394.0e12, "bf16": 197.0e12, "f32": 98.5e12}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """``with trace(dir): ...`` → profiler dump for TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with host-fetch fencing (the axon tunnel's
    block_until_ready does not synchronize)."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, fence_value=None):
        if fence_value is not None:
            float(jax.numpy.sum(fence_value))
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def roofline(macs: int, seconds: float, dtype: str = "int8") -> Dict:
    """Achieved TOP/s and fraction of single-chip peak."""
    achieved = 2.0 * macs / seconds
    peak = PEAK_TOPS.get(dtype, PEAK_TOPS["bf16"])
    return {"achieved_tops": achieved / 1e12,
            "peak_tops": peak / 1e12,
            "utilization": achieved / peak}
