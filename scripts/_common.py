"""Shared helpers for the profiling scripts.

One copy of the timing discipline (CLAUDE.md "the relay lies"): force the
program by reducing to a scalar on device and fetching THAT (float(f(...))
— never block_until_ready, which returns early over the axon relay), report
compile+run for the first call, then the median wall time of `reps` repeat
calls in milliseconds.
"""

from __future__ import annotations

import time

import numpy as np


def timed(tag, f, *args, reps: int = 5) -> float:
    t0 = time.perf_counter()
    r = float(f(*args))
    print(f"{tag}: compile+run {time.perf_counter() - t0:.1f}s "
          f"({'finite' if np.isfinite(r) else 'NONFINITE'})", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1000
    print(f"{tag}: median {med:.1f} ms", flush=True)
    return med
