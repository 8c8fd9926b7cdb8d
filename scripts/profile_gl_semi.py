"""Chained in-program A/B: split vs semi-fused Griffin-Lim iteration.

The semi-fused path (iter_impl="semi", gl_fused.fused_reproject_analyze)
keeps GEMM1 in XLA and fuses reprojection + analysis GEMM + renorm into one
Pallas kernel, saving two full HBM round-trips per iteration (frames and
spectrum) vs the split path.  This measures whether the traffic saving
beats the in-kernel GEMM's block-M penalty (the fully fused kernel lost 7%
to split at b=4 x 800 — docs/performance.md §7).

Also A/Bs the fast-GL momentum configs (GL-30 @ m=0.99, the quality-gated
serving candidate from scripts/gl_momentum_gate.py) on both paths.

Usage: timeout 3600 python scripts/profile_gl_semi.py [K] [B] [T]
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
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
T = int(sys.argv[3]) if len(sys.argv) > 3 else 800


def main() -> None:
    from sstts.dsp import griffin_lim as gl

    n_fft, hop, win = 2048, 275, 1102
    length = (T - 1) * hop
    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.random((B, T, n_fft // 2 + 1), np.float32) ** 2)

    def chain(impl, iters, momentum):
        def f(m):
            acc = jnp.float32(0.0)
            for _ in range(K):
                y = gl.griffin_lim(
                    m, n_fft, hop, win, iters, length, momentum=momentum,
                    fft_impl="dft_default", iter_impl=impl,
                ).astype(jnp.float32)
                s = jnp.sum(y)
                acc = acc + s
                m = m + (s * 1e-20).astype(m.dtype)
            return acc
        return jax.jit(f)

    base = jax.jit(lambda m: jnp.sum(m) * 2.0)
    t_base = timed("baseline", base, mag)
    cases = [
        ("split", 60, 0.0),
        ("semi", 60, 0.0),
        ("split", 30, 0.99),
        ("semi", 30, 0.99),
    ]
    print(f"\nin-program GL (b={B}, T={T}, chained x{K}):", flush=True)
    for impl, iters, m in cases:
        t = timed(f"{impl} GL-{iters}@m{m} x{K}", chain(impl, iters, m), mag)
        print(
            f"  {impl} GL-{iters}@m{m}: {(t - t_base) / K:.1f} ms in-program",
            flush=True,
        )


if __name__ == "__main__":
    main()
