"""Batch-shape lever: steady-state serving RTF at b=32 vs b=64.

The GL compute floor is settled ("floor reached", docs/performance.md)
and the wire floor stands at adpcm3, so the last named serving lever is
batch shape: doubling the batch amortizes the GL call's fixed
prologue/epilogue (~6.6 ms) and — on the relay — every per-CALL dispatch
overhead over twice the audio seconds.  BASELINE config 2 stays defined
at b=32; this is the measurement that says what a deployment gains by
choosing bigger request batches.

Same-window A/B through the exact serving stack bench.py measures
(steady-state `synthesize_stream`, the round-5 winning auto-tune config:
semi-GL-20 @ m=0.99, adpcm3 wire, chunks=8, threads=4, depth=3).

Usage: timeout 3600 python scripts/profile_batch_shape.py [N_BATCHES]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from scripts._common import dispatch_marker_ms as _marker  # noqa: E402

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def main() -> None:
    from sstts.config import Config
    from sstts.synthesize import Synthesizer
    from sstts.train import create_state

    cfg = Config()
    cfg = cfg.replace(
        inference=dataclasses.replace(
            cfg.inference,
            max_decoder_steps=160,  # 800 frames = 10 s / utterance
            stop_threshold=1.1,
            pipeline_chunks=8,
            fetch_threads=4,
            griffin_lim_iter_impl="semi",
            griffin_lim_iters=20,
            griffin_lim_momentum=0.99,
            wire_format="adpcm3",
        )
    )
    state = create_state(cfg)
    m0 = _marker()
    print(f"marker {m0:.1f} ms/call "
          f"({'healthy' if m0 < 10 else 'DEGRADED'})", flush=True)

    results = {}
    for batch in (32, 64):
        texts = ["the quick brown fox jumps over the lazy dog " * 2] * batch
        synth = Synthesizer(cfg, state.params, state.batch_stats)
        t0 = time.perf_counter()
        wavs = synth.synthesize_batch(texts)  # compile + warm
        print(f"b={batch}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        audio_s = sum(len(w) for w in wavs) / cfg.dataset.sample_rate
        t0 = time.perf_counter()
        n_out = sum(
            len(out)
            for out in synth.synthesize_stream([texts] * N_BATCHES, depth=3)
        )
        wall = time.perf_counter() - t0
        assert n_out == N_BATCHES * batch, (n_out, batch)
        rtf = audio_s * N_BATCHES / wall
        results[batch] = {
            "rtf": round(rtf, 1),
            "wall_per_batch_ms": round(wall / N_BATCHES * 1e3, 1),
            "audio_s_per_batch": round(audio_s, 1),
        }
        print(f"b={batch}: {rtf:.1f}x realtime "
              f"({wall / N_BATCHES * 1e3:.0f} ms/batch for {audio_s:.0f} s)",
              flush=True)

    m1 = _marker()
    print(json.dumps({
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "marker_ms": [round(m0, 1), round(m1, 1)],
        "config": "semi-20@m0.99/adpcm3/chunks8/depth3",
        "batches": results,
        "b64_over_b32": round(results[64]["rtf"] / results[32]["rtf"], 3),
    }))


if __name__ == "__main__":
    main()
