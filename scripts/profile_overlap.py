"""Does a host fetch overlap device compute over the axon relay?

Experiment: split the headline synthesis into stage A (encoder + AR decoder +
post-CBHG, full batch) and C chunked Griffin-Lim programs.  Dispatch
everything asynchronously, then fetch chunk i in order — if the relay allows
a DMA-out while a later chunk computes, wall time approaches
max(total_compute, total_fetch) instead of their sum.

Also tests concurrent threaded fetches (is the ~45 MiB/s link per-stream?).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from sstts.config import Config
    from sstts.data import text as text_mod
    from sstts.dsp.griffin_lim import spectrogram_to_wav
    from sstts.model.losses import frame_mask_from_lengths
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
    texts = ["the quick brown fox jumps over the lazy dog " * 2] * batch
    enc = [text_mod.encode(t) for t in texts]
    ids = np.zeros((batch, 96), np.int32)
    for i, e in enumerate(enc):
        ids[i, : len(e)] = e
    ids = jnp.asarray(ids)
    rng = jax.random.PRNGKey(0)
    ms = cfg.inference.max_decoder_steps

    model, variables = synth.model, synth.variables

    def prepare(variables, char_ids, rng):
        from sstts.model.tacotron import Tacotron

        memory, mmask = model.apply(
            variables, char_ids, False, method=Tacotron.encode,
            rngs={"dropout": rng},
        )
        dec = model.apply(
            variables, memory, mmask, ms,
            cfg.inference.stop_threshold, cfg.inference.min_decoder_steps,
            method=Tacotron.decode_infer, rngs={"dropout": rng},
        )
        mel = dec["mel"]
        total = mel.shape[1]
        fmask = frame_mask_from_lengths(dec["n_frames"], total)
        linear = model.apply(
            variables, mel, fmask, False, method=Tacotron.postprocess,
        )
        linear = jnp.where(fmask[..., None], linear, 0.0)
        length = (total - 1) * cfg.dataset.hop_len
        n_samples = jnp.minimum(dec["n_frames"] * cfg.dataset.hop_len, length)
        return linear, n_samples

    def vocode(linear):
        length = (linear.shape[1] - 1) * cfg.dataset.hop_len
        wav = spectrogram_to_wav(linear, cfg, length)
        return jnp.round(jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

    prepare_j = jax.jit(prepare)
    vocode_j = jax.jit(vocode)

    def run(n_chunks: int, threads: int = 1) -> float:
        t0 = time.perf_counter()
        linear, n_samples = prepare_j(variables, ids, rng)
        cs = batch // n_chunks
        outs = [vocode_j(linear[i * cs : (i + 1) * cs]) for i in range(n_chunks)]
        if threads == 1:
            host = [jax.device_get(o) for o in outs]
        else:
            with ThreadPoolExecutor(threads) as ex:
                host = list(ex.map(jax.device_get, outs))
        jax.device_get(n_samples)
        wall = time.perf_counter() - t0
        assert sum(h.nbytes for h in host) == batch * (800 - 1) * cfg.dataset.hop_len * 2
        return wall

    # Warm-up compiles (each chunk size is its own program; use one size).
    for c in (1, 2, 4, 8):
        run(c)

    for c in (1, 2, 4, 8):
        for th in (1, 4):
            times = [run(c, th) for _ in range(3)]
            print(
                f"chunks={c} fetch_threads={th}: "
                + " ".join(f"{t*1e3:7.1f}" for t in times)
                + " ms"
            )


if __name__ == "__main__":
    main()
