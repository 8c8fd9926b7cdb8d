"""Single-utterance TPU latency: one text -> one WAV at batch 1.

The reference's primary entry is `inference.py` — one text in, one WAV out
(SURVEY §3.2).  Every TPU record before round 5 was batched throughput;
this measures the serving question a b=1 user asks: how many ms from text
to waveform on the chip.

Three layers of answer, because the axon relay inflates per-call numbers
(CLAUDE.md):

1. relay-inclusive wall: median of single `Synthesizer.synthesize` calls
   through the public API (what THIS environment delivers end-to-end);
2. in-program decomposition: prepare (encoder + fused AR decoder +
   post-CBHG) and Griffin-Lim measured by chaining K data-dependent
   applications inside ONE jit call and subtracting an empty-program
   baseline — the device-side truth, marker-independent;
3. projected production latency: in-program compute + wire bytes over a
   production-class host link (8 GiB/s PCIe) — what a non-relay
   deployment would see.

Workload: one ~5 s utterance (400 frames = max_decoder_steps 80 at r=5,
the smallest frame bucket), stop threshold pinned so decode runs to
max_steps (worst case, same convention as bench.py).  Arms: classic
GL-60 + PCM16 wire (reference parity) and the fast preset
(GL-25 @ m=0.99; wire stays PCM16 at b=1 — 219 KB is already sub-ms at
production link rates, so sub-byte codecs buy nothing here).

Measurement discipline: b=1 phases are sub-millisecond to few-ms, so the
chained differentials use long chains (prepare x64, GL x32) with the
empty-program baseline bracketed before AND after — the relay's per-call
overhead drifts several ms between minutes, which at short chains can
even produce negative differentials (observed during development at K=8).

Usage: timeout 3600 python scripts/profile_b1_latency.py [K] [--json PATH]
(K scales the single-call wall reps only; chain lengths are fixed.)
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

K = 8
for a in sys.argv[1:]:
    if a.isdigit():
        K = int(a)
JSON_PATH = None
if "--json" in sys.argv:
    JSON_PATH = sys.argv[sys.argv.index("--json") + 1]

TEXT = "the quick brown fox jumps over the lazy dog near the river bank."
MAX_STEPS = 80  # -> 400 frames = 5.0 s of audio at r=5, hop 12.5 ms
PROD_LINK_GBPS = 8.0 * 1024**3  # PCIe-class host link for the projection
K_PREP = 64  # prepare is ~0.5-1 ms at b=1
K_GL = 32    # GL-25/60 is ~1-3 ms at b=1 x 400


def main() -> None:
    from sstts.config import Config
    from sstts.dsp import griffin_lim as gl
    from sstts.synthesize import Synthesizer
    from sstts.train import create_state

    cfg = Config()
    # Worst case: run the decoder to max_steps (untrained weights would
    # stop early or late nondeterministically otherwise).
    cfg = cfg.replace(
        inference=dataclasses.replace(
            cfg.inference, stop_threshold=2.0, max_decoder_steps=MAX_STEPS
        )
    )
    state = jax.device_get(create_state(cfg))
    results: dict[str, dict] = {}

    # Window marker for context.
    from scripts._common import dispatch_marker_ms

    marker = dispatch_marker_ms()
    print(f"dispatch marker: {marker:.1f} ms/call "
          f"({'healthy' if marker < 10 else 'DEGRADED'})", flush=True)

    n_fft, hop, win = (
        cfg.dataset.n_fft, cfg.dataset.hop_len, cfg.dataset.win_len
    )
    T = MAX_STEPS * cfg.arch.reduction_factor  # 400 frames
    length = (T - 1) * hop
    n_samples = MAX_STEPS * cfg.arch.reduction_factor * hop  # worst case
    wire_bytes = n_samples * 2  # PCM16

    # ---- layer 1: relay-inclusive wall through the public API ---------
    for tag, iters, mom in (("gl60", 60, 0.0), ("gl25_m99", 25, 0.99)):
        c = cfg.replace(
            inference=dataclasses.replace(
                cfg.inference, griffin_lim_iters=iters,
                griffin_lim_momentum=mom,
            )
        )
        s = Synthesizer(c, state.params, state.batch_stats)
        t0 = time.perf_counter()
        wav = s.synthesize(TEXT)
        print(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s "
              f"({len(wav)} samples = {len(wav)/c.dataset.sample_rate:.2f} s)",
              flush=True)
        walls = []
        for _ in range(K):
            t0 = time.perf_counter()
            s.synthesize(TEXT)
            walls.append((time.perf_counter() - t0) * 1e3)
        results[tag] = {"wall_ms": round(float(np.median(walls)), 1)}
        print(f"  {tag} single-call wall: {results[tag]['wall_ms']} ms "
              f"(median of {K})", flush=True)

        # ---- layer 2: in-program decomposition ------------------------
        # prepare: chain via a data-dependent PRNG key (ids are static).
        ids = s._encode_ids([TEXT], None)

        def chain_prepare(i, r, s=s):
            acc = jnp.float32(0.0)
            for k in range(K_PREP):
                out = s._prepare_fn(s.variables, i, r, MAX_STEPS)
                step_sum = jnp.sum(out["linear"]).astype(jnp.float32)
                acc = acc + step_sum
                r = jax.random.fold_in(r, (step_sum * 1e-20).astype(jnp.int32))
            return acc

        key = jax.random.PRNGKey(0)
        ids_j = jnp.asarray(ids)
        base_ids = jax.jit(lambda i, r: jnp.sum(i) * 2)
        b1_ = timed("  baseline(ids)", base_ids, ids_j, key)
        t = timed(f"  prepare x{K_PREP}", jax.jit(chain_prepare), ids_j, key,
                  reps=3)
        b2_ = timed("  baseline(ids)'", base_ids, ids_j, key)
        prep_ms = (t - (b1_ + b2_) / 2) / K_PREP

        # Full vocoder at b=1 x T: the real spectrogram_to_wav (denorm +
        # power raise + GL loop + de-emphasis), as the serving program
        # runs it — only the wire encode (a couple of elementwise ops)
        # is outside.
        rng = np.random.default_rng(0)
        mag = jnp.asarray(
            rng.random((1, T, n_fft // 2 + 1), np.float32).astype(np.float32)
        )

        def chain_gl(m, c=c):
            acc = jnp.float32(0.0)
            for _ in range(K_GL):
                y = gl.spectrogram_to_wav(m, c, length).astype(jnp.float32)
                ssum = jnp.sum(y)
                acc = acc + ssum
                m = m + (ssum * 1e-20).astype(m.dtype)
            return acc

        base_mag = jax.jit(lambda m: jnp.sum(m) * 2.0)
        b1_ = timed("  baseline(mag)", base_mag, mag)
        t = timed(f"  gl x{K_GL}", jax.jit(chain_gl), mag, reps=3)
        b2_ = timed("  baseline(mag)'", base_mag, mag)
        gl_ms = (t - (b1_ + b2_) / 2) / K_GL

        compute_ms = prep_ms + gl_ms
        prod_ms = compute_ms + wire_bytes / PROD_LINK_GBPS * 1e3
        results[tag].update(
            prepare_ms=round(prep_ms, 2),
            gl_ms=round(gl_ms, 2),
            in_program_ms=round(compute_ms, 2),
            wire_kb=round(wire_bytes / 1024, 1),
            projected_production_ms=round(prod_ms, 2),
            audio_s=round(n_samples / cfg.dataset.sample_rate, 2),
            rtf_in_program=round(
                n_samples / cfg.dataset.sample_rate / (compute_ms * 1e-3), 1
            ),
        )
        print(f"  {tag}: prepare {prep_ms:.2f} + GL {gl_ms:.2f} = "
              f"{compute_ms:.2f} ms in-program; projected production "
              f"{prod_ms:.2f} ms for {n_samples/cfg.dataset.sample_rate:.1f} s"
              f" audio (RTF {results[tag]['rtf_in_program']}x)", flush=True)

    out = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "marker_ms": round(marker, 1),
        "chained_k": K,
        "max_steps": MAX_STEPS,
        "frames": T,
        "arms": results,
    }
    if JSON_PATH:
        Path(JSON_PATH).write_text(json.dumps(out, indent=1))
        print(f"wrote {JSON_PATH}")
    else:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
