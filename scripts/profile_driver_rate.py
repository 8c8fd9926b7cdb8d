"""Sustained training-driver rate: steps_per_call x device_corpus_format.

The sustained driver rate through the relay is dispatch-bound (~45-48
steps/s measured round 2 vs ~80 steps/s device capability), so the lever
is fewer dispatches per step: `training.steps_per_call=S` scans S steps
inside one jitted call over the HBM-resident corpus.  This script measures
the real sustained rate (host wall clock over a fixed step count, exactly
what the train driver's steps_per_s metric reports) for each
(S, corpus format) combination in ONE process — the first compile pays the
remote compile service once, later programs compile in seconds (CLAUDE.md).

Unlike profile_train_chain's K-times-unrolled chain (a huge HLO that can
blow the degraded compile service), the grouped program is a lax.scan —
the step body compiles once regardless of S.

Usage: timeout 1800 python scripts/profile_driver_rate.py [S ...]
Defaults: S in (1, 8, 32), formats pcm16 + features + features_bf16,
b=32 x 400 frames.
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

S_LIST = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
MEASURE_STEPS = 192  # per combo, after warmup


def main() -> None:
    from sstts.config import Config
    from sstts.data.synthetic import make_utterances
    from sstts import train as train_mod

    cfg = Config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, dataset="synthetic"),
        training=dataclasses.replace(
            cfg.training,
            batch_size=32,
            frame_buckets=(400,),
            text_buckets=(cfg.training.text_buckets[0],),
        ),
    )
    # Enough rows for a full b=32 batch with varied gathers; tiny vs HBM.
    utts = make_utterances(64, cfg.dataset, min_words=4, max_words=10)

    for fmt in ("pcm16", "features", "features_bf16"):
        fcfg = cfg.replace(
            training=dataclasses.replace(
                cfg.training, device_corpus_format=fmt
            )
        )
        t0 = time.perf_counter()
        built, reason = train_mod.build_device_corpus(fcfg, utts)
        if built is None:
            print(f"[{fmt}] corpus build failed: {reason}")
            continue
        corpus, counts = built
        bucket = next(iter(sorted(counts)))
        n = counts[bucket]
        print(
            f"[{fmt}] corpus: {sum(counts.values())} rows, "
            f"build {time.perf_counter() - t0:.1f}s", flush=True,
        )
        rng = np.random.default_rng(0)

        for S in S_LIST:
            scfg = fcfg.replace(
                training=dataclasses.replace(
                    fcfg.training, steps_per_call=S
                )
            )
            state = train_mod.create_state(scfg)
            if S == 1:
                step_fn = train_mod.make_cached_train_step(scfg)

                def run(state, k):
                    for _ in range(k):
                        idx = rng.integers(0, n, (32,)).astype(np.int32)
                        state, m = step_fn(
                            state, corpus[bucket], idx,
                            np.ones(32, np.float32),
                        )
                    return state, m
            else:
                step_fn = train_mod.make_grouped_train_step(scfg)

                def run(state, k):
                    for _ in range(k // S):
                        idxs = rng.integers(0, n, (S, 32)).astype(np.int32)
                        state, m = step_fn(
                            state, corpus[bucket], idxs,
                            np.ones((S, 32), np.float32),
                        )
                    return state, m

            t0 = time.perf_counter()
            state, m = run(state, max(S, 8))  # compile + warm
            loss = float(np.asarray(jax.device_get(m["loss"])).reshape(-1)[-1])
            print(
                f"[{fmt}] S={S}: compile+warm "
                f"{time.perf_counter() - t0:.1f}s (loss {loss:.3f})",
                flush=True,
            )
            # At least one group even when S > MEASURE_STEPS (k=0 would
            # skip run()'s loop and leave m unbound).
            k = max(MEASURE_STEPS // S, 1) * S if S > 1 else MEASURE_STEPS
            t0 = time.perf_counter()
            state, m = run(state, k)
            # Force completion: fetch a scalar that depends on the last step.
            float(np.asarray(jax.device_get(m["loss"])).reshape(-1)[-1])
            wall = time.perf_counter() - t0
            print(
                f"[{fmt}] S={S}: {k} steps in {wall:.2f}s = "
                f"{k / wall:.1f} steps/s sustained", flush=True,
            )
        # Release this format's corpus before building the next.
        del corpus, built
    print("done")


if __name__ == "__main__":
    main()
