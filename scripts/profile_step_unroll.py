"""Chained in-program A/B: teacher-decoder scan unroll in the train step.

The round-2 attribution (scripts/profile_train_chain.py) put the b=32 x 400
train step at 12.2 ms = 5.1 fwd + 7.1 bwd/Adam, with the teacher scan's
backward the dominant bwd term (fwd 0.42 vs fwd+bwd 4.49 ms at S=80: the
backward pays per-iteration loop overhead the forward amortizes).
`arch.decoder_scan_unroll` replicates the scan body so XLA pipelines
across steps; this measures the full step and the features-corpus step at
each unroll factor, chained K-deep inside one jit call (CLAUDE.md
measurement discipline — per-call relay overhead subtracted via the
empty-program baseline).

Usage: timeout 3600 python scripts/profile_step_unroll.py [K] [unrolls...]
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

_args = sys.argv[1:]
K = int(_args[0]) if _args else 8
UNROLLS = [int(a) for a in _args[1:]] or [1, 2, 4, 8]


def main() -> None:
    from sstts.config import Config
    from sstts.dsp.ops import wav_to_features
    from sstts.train import _make_step_body, create_state

    cfg = Config()
    B, T = 32, 400
    L = cfg.training.text_buckets[0]
    hop = cfg.dataset.hop_len
    n_samples = (T - 1) * hop
    rng = np.random.default_rng(0)

    state = create_state(cfg)
    ids = np.where(
        rng.random((B, L)) < 0.8, rng.integers(1, 30, (B, L)), 0
    ).astype(np.int32)
    ids[:, 0] = 1
    batch = {
        "char_ids": jnp.asarray(ids),
        "text_len": jnp.asarray(np.maximum((ids != 0).sum(1), 1), jnp.int32),
        "samples": jnp.asarray(
            (rng.standard_normal((B, n_samples)) * 3000).astype(np.int16)
        ),
        "n_frames": jnp.full((B,), T, jnp.int32),
        "loss_frames": jnp.full((B,), T, jnp.int32),
    }
    samples_f = batch["samples"].astype(jnp.float32) * (1.0 / 32767.0)
    linear_gt, mel_gt = jax.jit(lambda s: wav_to_features(s, cfg.dataset))(
        samples_f
    )
    linear_gt = jax.block_until_ready(linear_gt)
    feat_batch = {k: v for k, v in batch.items() if k != "samples"}
    feat_batch["linear"] = linear_gt
    feat_batch["mel"] = mel_gt

    t_base = timed(
        "baseline", jax.jit(lambda st, b: jnp.sum(b["char_ids"]) * 2),
        state, batch,
    )

    def chained(body):
        def f(st, b):
            acc = jnp.float32(0.0)
            for _ in range(K):
                st, metrics = body(st, b)
                acc = acc + metrics["loss"]
            return acc
        return jax.jit(f)

    print(f"\ntrain step in-program cost (b={B}, T={T}, chained x{K}):")
    for u in UNROLLS:
        c = cfg.replace(
            arch=dataclasses.replace(cfg.arch, decoder_scan_unroll=u)
        )
        t = timed(f"step unroll={u} x{K}", chained(_make_step_body(c)),
                  state, batch)
        print(f"  pcm16    unroll={u}: {(t - t_base) / K:6.2f} ms/step",
              flush=True)
        tf = timed(
            f"feat step unroll={u} x{K}",
            chained(_make_step_body(c, from_features=True)), state, feat_batch,
        )
        print(f"  features unroll={u}: {(tf - t_base) / K:6.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
