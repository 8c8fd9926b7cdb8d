"""A/B the Pallas fused-sequence GRU vs the XLA lax.scan path on TPU.

Times the two real BiGRU workloads (encoder: T=128, post-CBHG: T=800, both
B=32, D=H=128) by chaining K sequence applications inside ONE jit call, so
the per-call relay overhead (~22-44 ms depending on window health) amortizes
and the in-program compute difference dominates.  An empty-program baseline
is measured and subtracted.  A/B both sides in the SAME session window
(CLAUDE.md: absolute numbers are not comparable across windows).

Usage: timeout 1800 python scripts/profile_gru.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sstts.ops.pallas_gru import gru_sequence, gru_sequence_xla

K = 16  # chained BiGRU applications per call
REPS = 7


def _time(f, *args) -> float:
    t0 = time.perf_counter()
    r = float(f(*args))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(r), "non-finite result"
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"    compile+run {compile_s:.1f}s, median {med * 1000:.2f} ms")
    return med


def main() -> None:
    rng = np.random.default_rng(0)
    shapes = {
        "encoder(T=128)": (32, 128, 128, 128),
        "post(T=800)": (32, 800, 128, 128),
    }
    results = {}
    for name, (B, T, D, H) in shapes.items():
        x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
        wx = jnp.asarray(rng.standard_normal((D, 3 * H)) * 0.05, jnp.float32)
        wh = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.05, jnp.float32)
        b = jnp.zeros((3 * H,), jnp.float32)
        mask = jnp.ones((B, T), jnp.float32)

        def chain(seq_fn):
            def f(x):
                for _ in range(K):
                    fwd = seq_fn(x, wx, wh, b, mask, reverse=False)
                    bwd = seq_fn(x, wx, wh, b, mask, reverse=True)
                    x = 0.5 * x + 0.25 * (fwd[..., :D] + bwd[..., :D])
                return jnp.sum(x)
            return jax.jit(f)

        baseline = jax.jit(lambda x: jnp.sum(x) * 2.0)
        print(f"{name}: baseline (empty program)")
        t_base = _time(baseline, x)
        for label, fn in (("xla", gru_sequence_xla), ("pallas", gru_sequence)):
            print(f"{name}: {label} x{K} BiGRU")
            t = _time(chain(fn), x)
            per = (t - t_base) / K * 1000
            results[(name, label)] = per
            print(f"    => {per:.2f} ms per BiGRU application")

    print("\nsummary (ms per BiGRU application, call overhead subtracted):")
    for name in shapes:
        x_ms = results[(name, "xla")]
        p_ms = results[(name, "pallas")]
        ratio = x_ms / p_ms if p_ms > 0 else float("inf")
        print(
            f"  {name}: xla {x_ms:.2f}  pallas {p_ms:.2f}  "
            f"(pallas is {ratio:.2f}x)"
        )


if __name__ == "__main__":
    main()
