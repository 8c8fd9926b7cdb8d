"""Relay window-health watcher with automatic healthy-window capture.

Compiles ONE trivial jitted program (the degraded remote compile service
makes every first-in-process compile cost minutes; this watcher pays it
once) and then re-times the dispatch-overhead marker every INTERVAL_S
seconds, appending one JSON line per round to LOG_PATH.  The marker is the
repo's standard window-health probe (CLAUDE.md: <10 ms/call = healthy,
~30-45 ms = dispatch-degraded).

Round-5 upgrade (round-4 verdict ask #2): the watcher now ACTS.  When the
marker drops below CAPTURE_THRESH_MS it launches the measurement sweep
itself — `python bench.py` then `python benchmarks/bench_all.py --out` —
into benchmarks/results/healthy_<stamp>*.json, pausing its own probing
while the sweep runs (the bench host has ONE core; a concurrent probe
would contend).  A cooldown bounds repeat captures, and the probe loop is
exception-guarded (one transient relay error must not kill a 12-hour
watch — round-4 advisor finding).

Coordination: touch SUSPEND_PATH to pause probing (used while a human-run
training/measurement batch owns the chip); remove it to resume.  The
watcher never probes or captures while it exists.

Run detached:  timeout 43200 python scripts/window_probe_watch.py &
Inspect:       tail /tmp/window_probe_watch.jsonl
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts._common import dispatch_marker_ms  # noqa: E402
LOG_PATH = "/tmp/window_probe_watch.jsonl"
SUSPEND_PATH = "/tmp/sstts_watch_suspend"
INTERVAL_S = 480.0
REPS = 11
CAPTURE_THRESH_MS = 10.0
CAPTURE_COOLDOWN_S = 6 * 3600.0
BENCH_TIMEOUT_S = 3600  # generous: killing a compile degrades the service


def _log(rec: dict) -> None:
    rec = {"t": time.strftime("%Y-%m-%d %H:%M:%S"), **rec}
    with open(LOG_PATH, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _capture(stamp: str) -> None:
    """Run the full sweep in subprocesses (each pays its own compiles but
    sees the healthy window; the watcher sleeps while they run)."""
    outdir = REPO / "benchmarks" / "results"
    outdir.mkdir(parents=True, exist_ok=True)
    py = sys.executable  # the watcher's interpreter, not whatever PATH says
    for tag, cmd, outfile in (
        ("bench", [py, "bench.py"], outdir / f"healthy_{stamp}_headline.log"),
        (
            "bench_all",
            [
                py, "benchmarks/bench_all.py", "--out",
                str(outdir / f"healthy_{stamp}_bench_all.json"),
            ],
            outdir / f"healthy_{stamp}_bench_all.log",
        ),
    ):
        if os.path.exists(SUSPEND_PATH):
            # A human claimed the chip between capture stages (the 1-core
            # host cannot run two compile-heavy processes) — stop here.
            _log({"capture": tag, "skipped": "suspended mid-capture"})
            return
        t0 = time.time()
        try:
            with open(outfile, "w") as fh:
                subprocess.run(
                    cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT,
                    timeout=BENCH_TIMEOUT_S, check=False,
                )
            _log({"capture": tag, "wall_s": round(time.time() - t0, 1),
                  "out": str(outfile)})
        except Exception as e:  # noqa: BLE001 — keep watching regardless
            _log({"capture": tag, "error": repr(e)})


def main() -> None:
    t0 = time.perf_counter()
    dispatch_marker_ms(reps=1)  # pay the one trivial compile up front
    print(f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    last_capture = 0.0
    while True:
        if os.path.exists(SUSPEND_PATH):
            _log({"suspended": True})
            time.sleep(INTERVAL_S)
            continue
        try:
            marker = dispatch_marker_ms(reps=REPS)
            _log({"marker_ms": round(marker, 1)})
            if (
                marker < CAPTURE_THRESH_MS
                and time.time() - last_capture > CAPTURE_COOLDOWN_S
                and not os.path.exists(SUSPEND_PATH)
            ):
                stamp = time.strftime("%Y-%m-%d_%H%M")
                _log({"capture_start": stamp, "marker_ms": round(marker, 1)})
                _capture(stamp)
                last_capture = time.time()
        except Exception as e:  # noqa: BLE001 — transient relay errors
            _log({"probe_error": repr(e)})
        time.sleep(INTERVAL_S)


if __name__ == "__main__":
    main()
