"""Profile the headline synthesis benchmark: device compute vs host fetch.

Timing rules for the axon relay (CLAUDE.md): `block_until_ready()` does not
block, so device-compute time is measured by reducing the output to a scalar
on device and fetching that scalar; fetch time is measured separately as the
PCM16 `device_get` after the compute has been forced.
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
    """Force a device value by reducing to a scalar and fetching it."""
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def main() -> None:
    from sstts.config import Config
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

    encoded_ids = None
    # Build the padded id batch exactly as synthesize_batch does.
    from sstts.data import text as text_mod

    enc = [text_mod.encode(t) for t in texts]
    bucket = min(-(-max(len(e) for e in enc) // 32) * 32, cfg.dataset.max_text_len)
    ids = np.zeros((batch, max(bucket, max(len(e) for e in enc))), np.int32)
    for i, e in enumerate(enc):
        ids[i, : len(e)] = e
    ids = jnp.asarray(ids)
    rng = jax.random.PRNGKey(0)
    ms = cfg.inference.max_decoder_steps

    # Warm-up / compile.
    out = synth._program(synth.variables, ids, rng, max_steps=ms)
    force(out["wav_wire"])

    for trial in range(3):
        t0 = time.perf_counter()
        out = synth._program(synth.variables, ids, rng, max_steps=ms)
        force(out["wav_wire"])
        t_compute = time.perf_counter() - t0

        t0 = time.perf_counter()
        host = jax.device_get({k: out[k] for k in ("wav_wire", "n_samples")})
        t_fetch = time.perf_counter() - t0
        nbytes = host["wav_wire"].nbytes
        print(
            f"trial {trial}: compute {t_compute*1e3:8.1f} ms   "
            f"fetch {t_fetch*1e3:8.1f} ms ({nbytes/2**20:.1f} MiB, "
            f"{nbytes/2**20/t_fetch:.1f} MiB/s)"
        )


if __name__ == "__main__":
    main()
