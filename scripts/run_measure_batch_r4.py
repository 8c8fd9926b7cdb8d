"""One-process round-4 measurement batch (FFT reconciliation + GL ablation).

The axon relay's remote compile service charges the FIRST compile of every
process minutes in a degraded window; subsequent compiles in the same
process take seconds (CLAUDE.md).  So the two round-4 measurement scripts
run back-to-back in ONE process instead of two.

Usage: timeout 5400 python scripts/run_measure_batch_r4.py
"""

from __future__ import annotations

import runpy
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    for script, argv in (
        ("scripts/profile_fft_recon.py", []),
        ("scripts/profile_gl_ablate.py", []),
        # Classic GL-60 ablation arm too: the semi kernel is also the
        # GL-60 default, so attribute at both operating points.
        ("scripts/profile_gl_ablate.py", ["--iters", "60", "--momentum", "0.0"]),
    ):
        print(f"\n===== {script} {' '.join(argv)} =====", flush=True)
        sys.argv = [script, *argv]
        t0 = time.perf_counter()
        runpy.run_path(str(ROOT / script), run_name="__main__")
        print(f"===== done in {time.perf_counter() - t0:.0f}s =====", flush=True)


if __name__ == "__main__":
    main()
