"""One-process round-4 trained-checkpoint A/B batch (GL arm + wire arm).

Runs `scripts/gl_trained_ab.py` twice — once over the GL serving
candidates (now incl. the round-4 GL-25/GL-20 @ m=0.99 entries) and once
over the wire codecs (now incl. adpcm3) — against the round-4 flagship
checkpoint.  One process so the degraded remote compile service charges
its minutes-long first-compile tax once (CLAUDE.md).

Usage: timeout 5400 python scripts/run_trained_ab_r4.py [workdir]
"""

from __future__ import annotations

import runpy
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "runs/demo_r4"
    for argv in (
        ["--workdir", workdir],
        ["--workdir", workdir, "--wire"],
    ):
        print(f"\n===== gl_trained_ab {' '.join(argv)} =====", flush=True)
        sys.argv = ["scripts/gl_trained_ab.py", *argv]
        t0 = time.perf_counter()
        try:
            runpy.run_path(
                str(ROOT / "scripts/gl_trained_ab.py"), run_name="__main__"
            )
        except SystemExit as e:  # gl_trained_ab exits 0 per arm
            if e.code not in (0, None):
                raise
        print(f"===== done in {time.perf_counter() - t0:.0f}s =====", flush=True)


if __name__ == "__main__":
    main()
