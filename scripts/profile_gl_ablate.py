"""Attribute the semi-fused GL kernel's distance to its pure-GEMM floor.

Round-3 VERDICT #5: GL-30 @ m=0.99 semi measures 76.6 ms at the headline
shapes vs a ~55 ms pure-GEMM floor — attribute the ~22 ms before touching
the kernel again.  This chains the full Griffin-Lim loop (the same
measurement as profile_gl_semi.py) under trace-time kernel ablations
(`gl_fused._ABLATE`):

  full        — the production kernel
  no_shift    — banded shift-add VPU loop skipped (Δ = VPU reprojection)
  no_renorm   — phase-renorm/rescale epilogue skipped (Δ = epilogue VPU)
  both        — both skipped; the remaining gap to the pure-GEMM floor is
                DMA + slab assembly + loop plumbing

Every ablated variant produces WRONG audio — this script only times.
Also times the two-GEMM floor itself (GEMM1+GEMM2 in XLA on the same
shapes, nothing between), so the attribution is self-contained.

Usage: timeout 3600 python scripts/profile_gl_ablate.py [K] [B] [T]
       [--iters N] [--momentum M]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

_ap = argparse.ArgumentParser()
_ap.add_argument("K", nargs="?", type=int, default=4)
_ap.add_argument("B", nargs="?", type=int, default=32)
_ap.add_argument("T", nargs="?", type=int, default=800)
_ap.add_argument("--iters", type=int, default=30)
_ap.add_argument("--momentum", type=float, default=0.99)
_args = _ap.parse_args()
K, B, T = _args.K, _args.B, _args.T


def main() -> None:
    from sstts.dsp import gl_fused
    from sstts.dsp import griffin_lim as gl

    n_fft, hop, win = 2048, 275, 1102
    length = (T - 1) * hop
    iters, mom = _args.iters, _args.momentum
    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.random((B, T, n_fft // 2 + 1), np.float32) ** 2)

    def chain():
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
        f"semi GL-{iters}@m{mom} ablation at b={B} x T={T} "
        f"(chained x{K}, baseline {t_base:.1f} ms):",
        flush=True,
    )
    results = {}
    variants = [None, "no_shift", "no_renorm"]
    for ab in variants:
        gl_fused._ABLATE = ab
        try:
            # Fresh trace per variant: _ABLATE is read at trace time, and
            # conftest-style cache clearing is unavailable here, so build a
            # NEW jitted callable each round (jit caches key on the
            # function object, which chain() recreates).
            tt = timed(f"ablate={ab}", chain(), mag)
        finally:
            gl_fused._ABLATE = None
        results[ab] = (tt - t_base) / K
        print(f"  {str(ab):10s}: {results[ab]:6.1f} ms/GL in-program", flush=True)

    full = results[None]
    print("\nattribution (Δ vs full kernel):", flush=True)
    for ab in variants[1:]:
        print(f"  {ab:10s}: {full - results[ab]:+6.1f} ms", flush=True)

    # Pure two-GEMM floor on the same shapes: spectrum->frames (GEMM1) and
    # frames->spectrum (GEMM2) with nothing in between, same dtypes as the
    # production loop (bf16 storage, f32 accumulate, Nyquist-packed lane
    # geometry: hp=1024 slots, wp=1152 window support).  Synthetic matrix
    # VALUES — GEMM cost depends only on shapes/dtypes.
    hp = 1024
    wp = -(-1102 // 128) * 128
    rngk = jax.random.PRNGKey(0)
    w_inv = jax.random.normal(rngk, (2 * hp, wp), jnp.bfloat16)
    w_fwd = jax.random.normal(rngk, (wp, 2 * hp), jnp.bfloat16)
    q0 = jax.random.normal(rngk, (B, T, 2 * hp), jnp.bfloat16)

    def gemm_floor(q):
        acc = jnp.float32(0.0)
        for _ in range(K):
            for _i in range(iters):
                fr = jnp.dot(
                    q, w_inv, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
                q = jnp.dot(
                    fr, w_fwd, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
            s = jnp.sum(q.astype(jnp.float32))
            acc = acc + s
            q = q * (1.0 + (s * 1e-20).astype(q.dtype))
        return acc

    tg = timed("pure 2-GEMM floor", jax.jit(gemm_floor), q0)
    print(
        f"\npure 2-GEMM floor ({iters} iters): {(tg - t_base) / K:6.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
