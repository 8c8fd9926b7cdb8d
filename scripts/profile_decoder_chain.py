"""Chained decode A/B: amortize the per-call relay overhead.

K data-dependent decodes run inside ONE jit call; (t_K - t_base) / K is the
in-program cost per decode, immune to the degraded-window dispatch floor
that clamped the single-call A/B (scripts/profile_decoder.py measured
decode==prepare==33 ms — pure overhead).

Usage: timeout 3600 python scripts/profile_decoder_chain.py [K]
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


def main() -> None:
    from sstts.config import Config
    from sstts.model.tacotron import Tacotron
    from sstts.ops.pallas_decoder import fused_decode
    from sstts.train import create_state

    cfg = Config()
    a = cfg.arch
    state = create_state(cfg)
    model = Tacotron(a, cfg.dataset)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    B, L, S = 32, 128, 160
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        np.where(rng.random((B, L)) < 0.9, rng.integers(1, 30, (B, L)), 0),
        jnp.int32,
    )
    encode = jax.jit(
        lambda v, i, r: model.apply(
            v, i, False, method=Tacotron.encode, rngs={"dropout": r}
        )
    )
    memory, mmask = encode(variables, ids, jax.random.PRNGKey(0))
    memory = jax.block_until_ready(memory)

    def xla_once(v, m, mm, r):
        return model.apply(
            v, m, mm, S, 1.5, 8, method=Tacotron.decode_infer,
            rngs={"dropout": r},
        )["mel"]

    def fused_once(v, m, mm):
        return fused_decode(
            v["params"]["decoder_cell"], m, mm, S,
            n_mels=cfg.dataset.n_mels, reduction=a.reduction_factor,
            stop_threshold=1.5, min_steps=8,
            dropout_rate=a.prenet_dropout,
            apply_dropout=a.prenet_dropout_at_inference, seed=0,
        )["mel"]

    def chain(once, with_rng):
        def f(v, m, mm, r):
            acc = jnp.float32(0.0)
            for i in range(K):
                if with_rng:
                    mel = once(v, m, mm, jax.random.fold_in(r, i))
                else:
                    mel = once(v, m, mm)
                s = jnp.sum(mel)
                acc = acc + s
                # Data dependence: the next decode sees a perturbed memory.
                m = m + (s * 1e-12).astype(m.dtype)
            return acc
        return jax.jit(f)

    base = jax.jit(lambda v, m, mm, r: jnp.sum(m) * 2.0)
    t_base = timed("baseline", base, variables, memory, mmask,
                   jax.random.PRNGKey(1))
    t_x = timed(f"xla decode x{K}", chain(xla_once, True), variables, memory,
                mmask, jax.random.PRNGKey(1))
    t_f = timed(f"fused decode x{K}", chain(fused_once, False), variables,
                memory, mmask, jax.random.PRNGKey(1))
    print(
        f"\nper-decode in-program: xla {(t_x - t_base) / K:.2f} ms, "
        f"fused {(t_f - t_base) / K:.2f} ms "
        f"({(t_x - t_base) / max(t_f - t_base, 1e-9):.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
