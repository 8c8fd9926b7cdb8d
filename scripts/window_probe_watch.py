"""Minimal long-lived relay window-health watcher.

Compiles ONE trivial jitted program (the degraded remote compile service
makes every first-in-process compile cost minutes; this watcher pays it
once) and then re-times the dispatch-overhead marker every INTERVAL_S
seconds, appending one JSON line per round to LOG_PATH.  The marker is the
repo's standard window-health probe (CLAUDE.md: <10 ms/call = healthy,
~30-45 ms = dispatch-degraded); the healthy-window re-take of the
BASELINE sweep (round-3 verdict ask #2) waits on a <10 ms round here.

Cheaper than scripts/gl_window_watch.py (no GL-60 compiles, no GL compute
while idle) — use that one when the split-vs-fused comparison itself needs
re-checking.

Run detached:  timeout 43200 python scripts/window_probe_watch.py &
Inspect:       tail /tmp/window_probe_watch.jsonl
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

LOG_PATH = "/tmp/window_probe_watch.jsonl"
INTERVAL_S = 480.0
REPS = 11


def main() -> None:
    t0 = time.perf_counter()
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))
    print(f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    while True:
        ts = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(f(x))
            ts.append((time.perf_counter() - t1) * 1e3)
        rec = {
            "t": time.strftime("%Y-%m-%d %H:%M:%S"),
            "marker_ms": round(float(np.median(ts)), 1),
            "min_ms": round(min(ts), 1),
        }
        with open(LOG_PATH, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        time.sleep(INTERVAL_S)


if __name__ == "__main__":
    main()
