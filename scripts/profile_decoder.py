"""TPU validation + A/B of the fused Pallas AR decoder vs the XLA scan.

One process (the first remote XLA compile pays the degraded-service toll;
the rest compile in seconds — CLAUDE.md).  Stages:

1. tiny-config end-to-end synthesis (validates the auto-selected Pallas GRU
   backend inside the full compiled pipeline),
2. flagship-shape decode A/B: `Tacotron.decode_infer` (XLA scan) vs
   `sstts.ops.pallas_decoder.fused_decode`, same params/memory,
3. full prepare-phase A/B (encoder + decode + post-CBHG + linear).

Timings force work via an on-device scalar reduction fetch; medians of 5.
A/B in the SAME window only.

Usage: timeout 3600 python scripts/profile_decoder.py
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from sstts.config import Config, tiny_config
    from sstts.model.tacotron import Tacotron
    from sstts.ops.pallas_decoder import fused_decode
    from sstts.synthesize import Synthesizer
    from sstts.train import create_state

    # --- 1. tiny end-to-end (validates pallas GRU auto backend) ---------- #
    cfg = tiny_config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, sample_rate=8000, mel_fmax=4000.0
        ),
        inference=dataclasses.replace(
            cfg.inference, max_decoder_steps=8, griffin_lim_iters=4,
            min_decoder_steps=2,
        ),
    )
    t0 = time.perf_counter()
    state = create_state(cfg)
    synth = Synthesizer(
        cfg, jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    wavs = synth.synthesize_batch(["hello tpu", "second row"])
    ok = all(np.isfinite(w).all() for w in wavs)
    print(
        f"tiny e2e (pallas GRU backend): {time.perf_counter() - t0:.1f}s, "
        f"shapes {[w.shape for w in wavs]}, finite={ok}", flush=True,
    )
    assert ok

    # --- 2. flagship decode A/B ------------------------------------------ #
    cfg = Config()
    a = cfg.arch
    state = create_state(cfg)
    model = Tacotron(a, cfg.dataset)
    variables = {
        "params": state.params, "batch_stats": state.batch_stats,
    }
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

    xla_decode = jax.jit(
        lambda v, m, mm, r: jnp.sum(
            model.apply(
                v, m, mm, S, 1.5, 8, method=Tacotron.decode_infer,
                rngs={"dropout": r},
            )["mel"]
        )
    )
    timed("decode XLA scan (S=160, b=32)", xla_decode, variables, memory,
          mmask, jax.random.PRNGKey(1))

    dec_params = state.params["decoder_cell"]
    fused = jax.jit(
        lambda p, m, mm: jnp.sum(
            fused_decode(
                p, m, mm, S, n_mels=cfg.dataset.n_mels,
                reduction=a.reduction_factor, stop_threshold=1.5,
                min_steps=8, dropout_rate=a.prenet_dropout,
                apply_dropout=a.prenet_dropout_at_inference, seed=0,
            )["mel"]
        )
    )
    timed("decode fused kernel (S=160, b=32)", fused, dec_params, memory, mmask)

    # --- 3. full prepare A/B --------------------------------------------- #
    def prepare(v, i, r, use_fused):
        mem, mm = model.apply(
            v, i, False, method=Tacotron.encode, rngs={"dropout": r}
        )
        if use_fused:
            dec = fused_decode(
                v["params"]["decoder_cell"], mem, mm, S,
                n_mels=cfg.dataset.n_mels, reduction=a.reduction_factor,
                stop_threshold=1.5, min_steps=8,
                dropout_rate=a.prenet_dropout,
                apply_dropout=a.prenet_dropout_at_inference, seed=0,
            )
        else:
            dec = model.apply(
                v, mem, mm, S, 1.5, 8, method=Tacotron.decode_infer,
                rngs={"dropout": r},
            )
        frame_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, dec["mel"].shape[1]), 1)
            < dec["n_frames"][:, None]
        )
        linear = model.apply(
            v, dec["mel"], frame_mask, False, method=Tacotron.postprocess
        )
        return jnp.sum(linear) + jnp.sum(dec["mel"])

    for use_fused in (False, True):
        f = jax.jit(lambda v, i, r: prepare(v, i, r, use_fused))
        timed(
            f"prepare {'fused' if use_fused else 'xla  '} (b=32, S=160)",
            f, variables, ids, jax.random.PRNGKey(2),
        )


if __name__ == "__main__":
    main()
