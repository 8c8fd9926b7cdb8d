"""Split the semi-fused GL call into fixed (prologue/epilogue) vs per-iter cost.

Round-4 follow-up to `profile_gl_ablate.py`: the ablation arms left ~33 ms
(GL-30 @ m=0.99) / ~36 ms (GL-60 @ m=0) unattributed between the full
kernel and the pure-2-GEMM floor.  Solving the two operating points as
fixed + per-iter suggested the bulk is FIXED per `griffin_lim` call
(phase init + lane packing prologue, final f32/HIGH synthesis epilogue),
but momentum changes the per-iter cost too, so the two-point solve is
confounded.  This script measures the in-program cost of the production
semi path at iters in {0, 15, 30, 60} for each momentum arm — iters=0 IS
the fixed cost (fori_loop(0, 0) elides the loop), and the slope is the
clean per-iteration cost.

Usage: timeout 3600 python scripts/profile_gl_fixed_cost.py [K] [B] [T]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
T = int(sys.argv[3]) if len(sys.argv) > 3 else 800


def main() -> None:
    from sstts.dsp import griffin_lim as gl

    n_fft, hop, win = 2048, 275, 1102
    length = (T - 1) * hop
    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.random((B, T, n_fft // 2 + 1), np.float32) ** 2)

    def chain(iters: int, mom: float):
        def f(m):
            acc = jnp.float32(0.0)
            for _ in range(K):
                y = gl.griffin_lim(
                    m, n_fft, hop, win, iters, length, momentum=mom,
                    fft_impl="dft_default", iter_impl="semi",
                ).astype(jnp.float32)
                s = jnp.sum(y)
                acc = acc + s
                m = m + (s * 1e-20).astype(m.dtype)
            return acc
        return jax.jit(f)

    base_fn = jax.jit(lambda m: jnp.sum(m) * 2.0)
    t_base = timed("empty baseline", base_fn, mag)
    print(
        f"semi GL fixed-vs-per-iter at b={B} x T={T} "
        f"(chained x{K}, baseline {t_base:.1f} ms):",
        flush=True,
    )
    for mom in (0.99, 0.0):
        pts = []
        for iters in (0, 15, 30, 60):
            tt = timed(f"m={mom} iters={iters}", chain(iters, mom), mag)
            per = (tt - t_base) / K
            pts.append((iters, per))
            print(f"  m={mom} iters={iters:2d}: {per:6.1f} ms/GL", flush=True)
        # Least-squares slope/intercept over the four points.
        xs = np.array([p[0] for p in pts], np.float64)
        ys = np.array([p[1] for p in pts], np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        print(
            f"  m={mom}: fixed {intercept:.1f} ms + {slope:.3f} ms/iter "
            f"(fit over iters {list(xs.astype(int))})",
            flush=True,
        )


if __name__ == "__main__":
    main()
