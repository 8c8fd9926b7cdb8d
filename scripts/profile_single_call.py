"""Single-call vs streaming synthesis latency (VERDICT r1 item 6).

Measures, in ONE window: (a) `synthesize_batch` single-call wall for the
headline workload (b=32, 800 frames, GL-60) under PCM16 and mu-law wire,
(b) `synthesize_stream` steady-state per-batch wall with the same configs.
The single call pays prepare + all chunks + the last chunk's fetch tail;
the stream hides fetch under the next batch's compute — the residual gap
is the per-call serialization this item tracks.

Usage: timeout 3600 python scripts/profile_single_call.py
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main() -> None:
    from sstts.config import Config
    from sstts.synthesize import Synthesizer
    from sstts.train import create_state

    base = Config()
    base = base.replace(
        inference=dataclasses.replace(
            base.inference, max_decoder_steps=160, stop_threshold=1.1,
            griffin_lim_iters=60, pipeline_chunks=8, fetch_threads=4,
            griffin_lim_iter_impl="fused",
        )
    )
    batch = 32
    texts = ["the quick brown fox jumps over the lazy dog " * 2] * batch
    state = create_state(base)
    audio_s = batch * (160 * 5 - 1) * base.dataset.hop_len / base.dataset.sample_rate

    for wire in ("pcm16", "mulaw8"):
        cfg = base.replace(
            inference=dataclasses.replace(base.inference, wire_format=wire)
        )
        synth = Synthesizer(cfg, state.params, state.batch_stats)
        synth.synthesize_batch(texts)  # compile + warm
        singles = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = synth.synthesize_batch(texts)
            singles.append(time.perf_counter() - t0)
            assert len(out) == batch
        single = float(np.median(singles))
        t0 = time.perf_counter()
        n = 0
        for wavs in synth.synthesize_stream([texts] * 6, depth=3):
            n += len(wavs)
        stream = (time.perf_counter() - t0) / 6
        assert n == 6 * batch
        print(
            f"wire={wire}: single-call {single * 1000:.0f} ms "
            f"({audio_s / single:.0f}x), stream steady {stream * 1000:.0f} ms "
            f"({audio_s / stream:.0f}x), gap "
            f"{(single / stream - 1) * 100:.0f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
