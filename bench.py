"""Headline benchmark: batched synthesis RTF per chip, incl. 60-iter Griffin-Lim.

Measures BASELINE config 2 (batch=32 padded + stop-token masked synthesis)
end-to-end through the public Synthesizer: encoder + fixed-shape AR decoder
scan + post-CBHG + on-device Griffin-Lim, waveform fetched to host.  RTF =
seconds of audio synthesized per wall second per chip; north-star target is
>=50x (BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
`vs_baseline` is value / 50.0 (the reference publishes no numbers, so the
driver-set 50x north star is the baseline).
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import numpy as np


def main() -> None:
    from sstts.config import Config
    from sstts.synthesize import Synthesizer
    from sstts.train import create_state

    # Full-size flagship config; stop threshold > 1 so every utterance runs to
    # max_steps (untrained weights would otherwise stop instantly and the
    # measurement would be trivially fast).
    cfg = Config()
    cfg = cfg.replace(
        inference=dataclasses.replace(
            cfg.inference,
            max_decoder_steps=160,  # 160 * r(5) = 800 frames = 10 s / utterance
            stop_threshold=1.1,
            griffin_lim_iters=60,
            # Pipelined vocoding: fetch finished Griffin-Lim chunks while
            # later chunks compute (measured optimum on the v5e relay).
            pipeline_chunks=8,
            fetch_threads=4,
        )
    )
    batch = 32
    state = jax.device_get(create_state(cfg))
    synth = Synthesizer(cfg, state.params, state.batch_stats)

    texts = [
        "the quick brown fox jumps over the lazy dog " * 2,
    ] * batch

    # Warm-up compiles the programs.
    wavs = synth.synthesize_batch(texts)
    # Steady-state streaming throughput (the serving configuration): up to
    # `depth` batches in flight, so each batch's PCM16 fetch drains over the
    # host link while the next batch computes.  Per-call latency of a single
    # synthesize_batch is reported in BASELINE.md alongside.
    n_batches = 8
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        n_out = 0
        for out in synth.synthesize_stream([texts] * n_batches):
            n_out += len(out)
        times.append(time.perf_counter() - t0)
        assert n_out == n_batches * batch
    wall = float(np.median(times)) / n_batches
    frames = cfg.inference.max_decoder_steps * cfg.arch.reduction_factor
    audio_seconds = batch * (frames - 1) * cfg.dataset.hop_len / cfg.dataset.sample_rate
    rtf = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": "batched_synthesis_rtf_incl_griffin_lim",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip_b32",
                "vs_baseline": round(rtf / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
