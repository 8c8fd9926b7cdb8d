"""HBM accounting of the grouped train step with/without arch.remat_decoder.

The measured round-2 OOM: a near-budget "features" device corpus (~4.9 GiB
args) plus the steps_per_call=8 grouped program (11.8 GiB program footprint)
exceeds a v5e's 16 GiB.  `arch.remat_decoder` trades decoder-scan activation
HBM for recompute — this script quantifies how much, WITHOUT running
anything: AOT-lower the grouped program against ShapeDtypeStructs mirroring
the near-budget corpus and read `compiled.memory_analysis()`.  Compile-only,
so it is safe in degraded relay windows (one bounded remote compile per
variant, tiny HLO, no data upload).

Usage: timeout 900 python scripts/profile_remat_memory.py [S] [n_rows] [fmt]
Defaults: S=8, n_rows=2816 (~4.9 GiB features corpus at 400 frames),
fmt=features (pass features_bf16 to account the half-width corpus pairing).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# SSTTS_PLATFORM=cpu validates the script's plumbing without the TPU relay
# (the numbers are then CPU-compiler accounting, not v5e HBM).
if os.environ.get("SSTTS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SSTTS_PLATFORM"])

import jax.numpy as jnp
import numpy as np

S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 2816
FMT = sys.argv[3] if len(sys.argv) > 3 else "features"


def main() -> None:
    from sstts.config import Config
    from sstts import train as train_mod

    cfg = Config()
    cfg = cfg.replace(
        training=dataclasses.replace(
            cfg.training,
            batch_size=32,
            frame_buckets=(400,),
            text_buckets=(cfg.training.text_buckets[0],),
            device_corpus_format=FMT,
            steps_per_call=S,
        ),
    )
    B = cfg.training.batch_size
    T = cfg.training.frame_buckets[0]
    L = cfg.training.text_buckets[0]
    feat = jnp.bfloat16 if FMT == "features_bf16" else jnp.float32
    i32 = jnp.int32
    corpus = {
        "char_ids": jax.ShapeDtypeStruct((N_ROWS, L), i32),
        "text_len": jax.ShapeDtypeStruct((N_ROWS,), i32),
        "linear": jax.ShapeDtypeStruct((N_ROWS, T, cfg.dataset.n_linear), feat),
        "mel": jax.ShapeDtypeStruct((N_ROWS, T, cfg.dataset.n_mels), feat),
        "n_frames": jax.ShapeDtypeStruct((N_ROWS,), i32),
        "loss_frames": jax.ShapeDtypeStruct((N_ROWS,), i32),
    }
    corpus_gib = sum(
        np.prod(v.shape) * v.dtype.itemsize for v in corpus.values()
    ) / 2**30
    print(f"corpus args: {corpus_gib:.2f} GiB ({N_ROWS} rows x {T} frames)")

    state = jax.eval_shape(
        lambda: train_mod.create_state(cfg)
    )  # shapes only; no device init

    idxs = jax.ShapeDtypeStruct((S, B), i32)
    valids = jax.ShapeDtypeStruct((S, B), jnp.float32)

    for remat in (False, True):
        rcfg = cfg.replace(
            arch=dataclasses.replace(cfg.arch, remat_decoder=remat)
        )
        step = train_mod.make_grouped_train_step(rcfg)
        t0 = time.perf_counter()
        compiled = step.lower(state, corpus, idxs, valids).compile()
        mem = compiled.memory_analysis()
        dt = time.perf_counter() - t0
        gib = lambda b: b / 2**30  # noqa: E731
        print(
            f"remat={remat}: compile {dt:.0f}s | "
            f"temps {gib(mem.temp_size_in_bytes):.2f} GiB, "
            f"args {gib(mem.argument_size_in_bytes):.2f} GiB, "
            f"output {gib(mem.output_size_in_bytes):.2f} GiB, "
            f"code {gib(mem.generated_code_size_in_bytes):.3f} GiB",
            flush=True,
        )
        total = (
            mem.temp_size_in_bytes
            + mem.argument_size_in_bytes
            + mem.generated_code_size_in_bytes
        )
        print(
            f"remat={remat}: resident total (args+temps+code) "
            f"{gib(total):.2f} GiB vs 16 GiB HBM "
            f"({'FITS' if total < 15.5 * 2**30 else 'OOM'})",
            flush=True,
        )


if __name__ == "__main__":
    main()
