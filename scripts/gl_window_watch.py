"""Long-lived fused-vs-split Griffin-Lim watcher.

Compiles both GL-60 iteration implementations ONCE (the degraded remote
compile service makes per-process compiles cost minutes), then re-times both
every `INTERVAL_S` seconds and appends one JSON line per round to
`LOG_PATH`.  The split-impl median at b=4 x 800 frames is the window-health
marker (~22 ms healthy, ~44 ms degraded — CLAUDE.md); rounds where it drops
well below the degraded floor are the ones where the fused-vs-split
comparison is meaningful.

Run detached:  timeout 43200 python scripts/gl_window_watch.py &
Inspect:       tail /tmp/gl_window_watch.jsonl
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

LOG_PATH = "/tmp/gl_window_watch.jsonl"
INTERVAL_S = 600.0
REPS = 7


def main() -> None:
    from sstts.dsp import griffin_lim as gl

    n_fft, hop, win = 2048, 275, 1102
    B, T = 4, 800
    length = (T - 1) * hop
    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.random((B, T, n_fft // 2 + 1), np.float32) ** 2)

    fns = {}
    for impl in ("split", "fused"):
        def make(impl):
            def f(m):
                return jnp.sum(
                    gl.griffin_lim(
                        m, n_fft, hop, win, 60, length,
                        fft_impl="dft_default", iter_impl=impl,
                    ).astype(jnp.float32)
                )
            return jax.jit(f)
        fns[impl] = make(impl)
        t0 = time.perf_counter()
        r = float(fns[impl](mag))
        print(
            f"{impl}: compile+run {time.perf_counter() - t0:.1f}s "
            f"{'finite' if np.isfinite(r) else 'NONFINITE'}",
            flush=True,
        )

    while True:
        row = {"t": time.strftime("%Y-%m-%dT%H:%M:%S")}
        for impl, f in fns.items():
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(f(mag))
                times.append(time.perf_counter() - t0)
            row[impl + "_ms"] = round(float(np.median(times)) * 1000, 2)
        with open(LOG_PATH, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(row, flush=True)
        time.sleep(INTERVAL_S)


if __name__ == "__main__":
    main()
