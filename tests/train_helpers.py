"""Shared fixtures-in-code for the training test modules.

`test_train.py` was split into two modules (driver/mesh/checkpoint vs
step-variant/EMA tests) so the per-module compiled-state clearing in
`tests/conftest.py` bounds XLA-CPU executable accumulation mid-way: the
full suite segfaulted natively inside `backend_compile_and_load` once the
single module grew past ~28 compile-heavy tests (2026-08-21, at
test_ema_update_math — the same class of crash conftest's module-scope
fixture was added for).  Both halves share these tiny builders.
"""

import dataclasses

from sstts.config import tiny_config
from sstts.data import pipeline as pipeline_mod
from sstts.data.synthetic import make_utterances


def _cfg(batch_size=2):
    cfg = tiny_config()
    return cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, dataset="synthetic", sample_rate=8000, mel_fmax=4000.0
        ),
        training=dataclasses.replace(
            cfg.training,
            batch_size=batch_size,
            text_buckets=(48,),
            frame_buckets=(96,),
            learning_rate=2e-3,
        ),
    )


def _one_batch(cfg, n=None):
    utts = make_utterances(8, cfg.dataset, min_words=1, max_words=2)
    b = pipeline_mod.Batcher(utts, cfg)
    for _, batch in b.epoch(0, n or cfg.training.batch_size):
        return batch
    raise AssertionError("no batch produced")
