"""Bound the Griffin-Lim optimization headroom.

(a) GEMM-only loop: 60 iterations of the 4 GL GEMMs at the exact headline
    shapes/dtypes, no framing/OLA/elementwise — the FLOP floor.
(b) Aggregate host-link bandwidth with N concurrent fetch streams — the
    headline wall floor once compute is hidden.
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def force(x) -> float:
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def main() -> None:
    from sstts.dsp import fft as mmfft
    from sstts.dsp.stft import _window

    n_fft, hop, win_len = 2048, 275, 1102
    rows = 32 * 800  # batch * frames
    window = _window(n_fft, win_len)
    lo, w_len, cos_w, nsin_w, inv_re_w, inv_im_w = mmfft._rdft_matrices_windowed(
        n_fft, window
    )
    half = n_fft // 2 + 1

    def gemms_only(n_iters: int):
        mats = (
            jnp.asarray(cos_w, jnp.bfloat16),
            jnp.asarray(nsin_w, jnp.bfloat16),
            jnp.asarray(inv_re_w, jnp.bfloat16),
            jnp.asarray(inv_im_w, jnp.bfloat16),
        )

        def body(i, carry):
            sr, si = carry
            mm = lambda a, b: jnp.matmul(  # noqa: E731
                a, b, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            frames = (mm(sr, mats[2]) + mm(si, mats[3])).astype(jnp.bfloat16)
            sr2 = mm(frames, mats[0]).astype(jnp.bfloat16)
            si2 = mm(frames, mats[1]).astype(jnp.bfloat16)
            return sr2, si2

        sr0 = jnp.ones((rows, half), jnp.bfloat16)
        si0 = jnp.zeros((rows, half), jnp.bfloat16)
        out = jax.lax.fori_loop(0, n_iters, body, (sr0, si0))
        return out[0]

    f = jax.jit(gemms_only, static_argnums=0)
    force(f(60))
    for trial in range(3):
        t0 = time.perf_counter()
        force(f(60))
        dt = time.perf_counter() - t0
        tf = 60 * 4 * 2 * rows * half * w_len / dt / 1e12
        print(f"gemms-only 60 iters: {dt*1e3:7.1f} ms  ({tf:.0f} TFLOP/s effective)")

    # (b) aggregate fetch bandwidth: 8 device buffers of 1.7 MiB, N streams.
    bufs = [
        jax.device_put(np.random.randint(-100, 100, (4, 219725), np.int16))
        for _ in range(8)
    ]
    for b in bufs:
        force(b)
    total = sum(b.nbytes for b in bufs)
    for threads in (1, 2, 4, 8):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            with ThreadPoolExecutor(threads) as ex:
                list(ex.map(jax.device_get, bufs))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"fetch {total/2**20:.1f} MiB, {threads} streams: "
            + " ".join(f"{t*1e3:6.1f}" for t in times)
            + f" ms  (best {total/2**20/best:.1f} MiB/s aggregate)"
        )


if __name__ == "__main__":
    main()
