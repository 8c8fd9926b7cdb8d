"""Chained in-program A/B: fused vs split Griffin-Lim iteration.

Single-call A/Bs kept landing on the degraded-window dispatch floor
(~44 ms at b=4 x 800), where compute differences are invisible
(docs/performance.md §7).  Chaining K data-dependent GL-60 runs inside ONE
jit call and subtracting an empty-program baseline measures the in-program
cost directly — the same technique that resolved the AR decoder
(scripts/profile_decoder_chain.py).

Usage: timeout 3600 python scripts/profile_gl_chain.py [K] [B] [T]
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

    def chain(impl):
        def f(m):
            acc = jnp.float32(0.0)
            for _ in range(K):
                y = gl.griffin_lim(
                    m, n_fft, hop, win, 60, length,
                    fft_impl="dft_default", iter_impl=impl,
                ).astype(jnp.float32)
                s = jnp.sum(y)
                acc = acc + s
                m = m + (s * 1e-20).astype(m.dtype)
            return acc
        return jax.jit(f)

    base = jax.jit(lambda m: jnp.sum(m) * 2.0)
    t_base = timed("baseline", base, mag)
    results = {}
    for impl in ("split", "fused"):
        t = timed(f"{impl} GL-60 x{K} (b={B}, T={T})", chain(impl), mag)
        results[impl] = (t - t_base) / K
    print(
        f"\nin-program GL-60 (b={B}, T={T}): "
        f"split {results['split']:.1f} ms, fused {results['fused']:.1f} ms "
        f"({results['split'] / max(results['fused'], 1e-9):.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
