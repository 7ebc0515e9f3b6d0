"""Latency instrumentation.

The analog of the reference's CUDA-event latency machinery
(stable_diffusion_pipeline.py:145-150, 486-503 print_summary) and NVTX
ranges (:358-366). On TPU the stamp is ONE device program, so per-stage
breakdown comes from (a) named wall-clock stages around program dispatch
+ block_until_ready and (b) `jax.profiler` traces for intra-program
analysis.
"""

from __future__ import annotations

import contextlib
import logging
import statistics
import time
from collections import defaultdict

import jax

logger = logging.getLogger(__name__)


class StageTimer:
    """Named wall-clock stages with a printable latency table."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.records = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        tic = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - tic) * 1000.0
            self.records[name].append(ms)
            logger.debug("%s: %.2f ms", name, ms)

    def summary(self) -> str:
        """Formatted table like the reference's print_summary."""
        lines = ["|----------------------|---------|---------|---------|-------|",
                 "| {:^20} | {:^7} | {:^7} | {:^7} | {:^5} |".format(
                     "Stage", "p50 ms", "p99 ms", "last ms", "n"),
                 "|----------------------|---------|---------|---------|-------|"]
        for name, vals in self.records.items():
            s = sorted(vals)
            p50 = s[len(s) // 2]
            p99 = s[min(len(s) - 1, int(len(s) * 0.99))]
            lines.append("| {:<20} | {:>7.2f} | {:>7.2f} | {:>7.2f} | {:>5d} |".format(
                name[:20], p50, p99, vals[-1], len(vals)))
        lines.append(lines[0])
        return "\n".join(lines)

    def print_summary(self):
        print(self.summary())


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (the NVTX-range analog; view in
    TensorBoard / XProf)."""
    with jax.profiler.trace(log_dir):
        yield


def timed_call(fn, *args, **kwargs):
    """Dispatch + block_until_ready, returning (result, milliseconds)."""
    tic = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - tic) * 1000.0


def percentile_stats(samples_ms):
    s = sorted(samples_ms)
    n = len(s)
    return {
        "p50": s[n // 2],
        "p90": s[min(n - 1, int(n * 0.90))],
        "p99": s[min(n - 1, int(n * 0.99))],
        "mean": statistics.fmean(s),
        "min": s[0],
        "max": s[-1],
        "n": n,
    }
