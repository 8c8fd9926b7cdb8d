"""A/B the fused single-kernel Griffin-Lim iteration vs the split path.

Headline chunk shapes (B=4 x 800 frames, n_fft=2048, GL-60, bf16 packed
loop).  Timings force work by reducing to an on-device scalar (CLAUDE.md:
block_until_ready does not block over the relay).  A/B both sides in the
SAME session window — absolute numbers are not comparable across windows.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from sstts.dsp import griffin_lim as gl

    n_fft, hop, win = 2048, 275, 1102
    B, T = 4, 800
    length = (T - 1) * hop
    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.random((B, T, n_fft // 2 + 1), np.float32) ** 2)

    from sstts.dsp import gl_fused

    args = [a for a in sys.argv[1:]]
    impls = ("fused",) if "nosplit" in args else ("split", "fused")
    bt_sweep = [int(a) for a in args if a != "nosplit"] or [None]
    for impl in impls:
        for bt_max in [None] if impl == "split" else bt_sweep:
            gl.GL_ITER_IMPL = impl
            if bt_max is not None:
                gl_fused.BT_MAX = bt_max
            f = jax.jit(
                lambda m: jnp.sum(
                    gl.griffin_lim(
                        m, n_fft, hop, win, 60, length, fft_impl="dft_default"
                    ).astype(jnp.float32)
                )
            )
            tag = impl if bt_max is None else f"{impl}[bt_max={bt_max}]"
            t0 = time.perf_counter()
            r = float(f(mag))
            print(
                tag, "compile+run", round(time.perf_counter() - t0, 1), "s",
                "finite" if np.isfinite(r) else "NONFINITE", flush=True,
            )
            times = []
            for _ in range(7):
                t0 = time.perf_counter()
                float(f(mag))
                times.append(time.perf_counter() - t0)
            print(
                tag, "median", round(float(np.median(times)) * 1000, 1),
                "ms", flush=True,
            )


if __name__ == "__main__":
    main()
