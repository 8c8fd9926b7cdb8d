"""Tracing / profiling harness (SURVEY.md §5.1).

The reference had nothing beyond TensorBoard step timing; here:
`jax.profiler` traces on demand plus a wall-clock step timer that forces a
host transfer (the axon relay's `block_until_ready` returns early, so timing
must round-trip — see .claude/skills/verify/SKILL.md)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Callable, Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture a jax.profiler trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, trials: int = 5, warmup: int = 1) -> Dict[str, float]:
    """Median/percentile wall times of `fn(*args)`, forcing host transfer."""
    for _ in range(warmup):
        jax.tree.map(np.asarray, fn(*args))
    times: List[float] = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(*args))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "median_s": float(np.median(arr)),
        "p10_s": float(np.percentile(arr, 10)),
        "p90_s": float(np.percentile(arr, 90)),
        "trials": float(trials),
    }
