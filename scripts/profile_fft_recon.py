"""Reconcile the recorded XLA-FFT-vs-DFT-GEMM numbers (round-3 verdict #8).

`sstts/dsp/fft.py:3` recorded "~15 ms per batched rFFT-2048 pass" and
`docs/performance.md` "~6 ms per (25600, 2048) pass" for what reads as the
same comparison; neither named its shape/window.  This measures all three
implementations at the named shape with the chained in-program method so
the two documents can cite ONE number with its provenance:

  xla      — jnp.fft.rfft       (XLA's TPU FFT lowering)
  matmul   — sstts.dsp.fft.rfft (four-step Cooley-Tukey DFT matmuls)
  direct   — the GL loop's support-reduced direct DFT GEMM pair
             (measured via one analysis GEMM of the same shape)

Usage: timeout 3600 python scripts/profile_fft_recon.py [K] [ROWS]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 25600  # b=32 x 800 frames
N = 2048


def main() -> None:
    from sstts.dsp import fft as mfft

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((ROWS, N), np.float32)
    )

    def chain_xla(x):
        acc = jnp.float32(0.0)
        for _ in range(K):
            s = jnp.fft.rfft(x, axis=-1)
            r = jnp.sum(jnp.abs(s.real) + jnp.abs(s.imag))
            acc = acc + r
            x = x * (1.0 + r * 1e-20)
        return acc

    def chain_matmul(x):
        acc = jnp.float32(0.0)
        for _ in range(K):
            s = mfft.rfft(x, N)
            r = jnp.sum(jnp.abs(s.real) + jnp.abs(s.imag))
            acc = acc + r
            x = x * (1.0 + r * 1e-20)
        return acc

    # The GL loop's own form: one (ROWS, wp) x (wp, 2048) bf16 GEMM pair of
    # the analysis direction, support-reduced lane geometry.
    wp = -(-1102 // 128) * 128
    w_fwd = jax.random.normal(jax.random.PRNGKey(0), (wp, 2048), jnp.bfloat16)
    xw = jax.random.normal(jax.random.PRNGKey(1), (ROWS, wp), jnp.bfloat16)

    def chain_direct(x):
        acc = jnp.float32(0.0)
        for _ in range(K):
            s = jnp.dot(x, w_fwd, preferred_element_type=jnp.float32)
            r = jnp.sum(jnp.abs(s))
            acc = acc + r
            x = x * (1.0 + (r * 1e-20).astype(x.dtype))
        return acc

    base = timed("empty baseline", jax.jit(lambda v: jnp.sum(v) * 2.0), x)
    print(f"\nrFFT-{N} over ({ROWS}, {N}), chained x{K}:", flush=True)
    for tag, fn, arg in (
        ("xla jnp.fft.rfft", chain_xla, x),
        ("matmul four-step", chain_matmul, x),
        ("direct DFT GEMM (support-reduced, bf16)", chain_direct, xw),
    ):
        tt = timed(tag, jax.jit(fn), arg)
        print(f"  {tag}: {(tt - base) / K:6.2f} ms/pass in-program", flush=True)


if __name__ == "__main__":
    main()
