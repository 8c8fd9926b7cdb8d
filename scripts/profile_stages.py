"""Split headline compute: prepare (enc + AR decoder + post-CBHG) vs vocode.

Each stage is forced by reducing its output to a scalar on device (the relay
does not honor block_until_ready; see CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def force(x) -> float:
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def main() -> None:
    from sstts.config import Config
    from sstts.data import text as text_mod
    from sstts.synthesize import Synthesizer
    from sstts.train import create_state

    cfg = Config()
    cfg = cfg.replace(
        inference=dataclasses.replace(
            cfg.inference,
            max_decoder_steps=160,
            stop_threshold=1.1,
            griffin_lim_iters=60,
        )
    )
    batch = 32
    state = jax.device_get(create_state(cfg))
    synth = Synthesizer(cfg, state.params, state.batch_stats)
    enc = [text_mod.encode("the quick brown fox jumps over the lazy dog " * 2)]
    ids = np.zeros((batch, 96), np.int32)
    for i in range(batch):
        ids[i, : len(enc[0])] = enc[0]
    ids = jnp.asarray(ids)
    rng = jax.random.PRNGKey(0)
    ms = cfg.inference.max_decoder_steps

    prep = synth._prepare(synth.variables, ids, rng, max_steps=ms)
    force(prep["linear"])
    out = synth._vocode(prep["linear"])
    force(out["wav_wire"])

    for trial in range(3):
        t0 = time.perf_counter()
        prep = synth._prepare(synth.variables, ids, rng, max_steps=ms)
        force(prep["linear"])
        t_prep = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = synth._vocode(prep["linear"])
        force(out["wav_wire"])
        t_voc = time.perf_counter() - t0
        print(f"trial {trial}: prepare {t_prep*1e3:7.1f} ms   vocode(GL60) {t_voc*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
