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


_MARKER_FN = None


def dispatch_marker_ms(reps: int = 11) -> float:
    """The repo's standard window-health marker: median per-call wall of a
    trivial jitted scalar program (CLAUDE.md: <10 ms = healthy, ~30-45 ms
    = dispatch-degraded).  One shared implementation so cross-script
    marker values stay comparable (round-5 review finding: four scripts
    had hand-rolled copies with drifting probe shapes).  bench.py /
    bench_all.py keep their own in-file probe — their marker fields are
    part of the recorded artifact series.

    The jitted probe is cached at module level: long-lived callers (the
    window watcher probes every few minutes) must not pay a re-trace —
    or worse, a degraded-window remote recompile — per reading.
    """
    global _MARKER_FN
    import jax
    import jax.numpy as jnp

    if _MARKER_FN is None:
        _MARKER_FN = jax.jit(lambda x: x + 1.0)
        float(_MARKER_FN(jnp.zeros(())))  # compile + warm once
    x = jnp.zeros(())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(_MARKER_FN(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


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
