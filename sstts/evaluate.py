"""Evaluation program (reference `tacotron/evaluate.py` — SURVEY.md §3.3).

Restores a checkpoint, runs teacher-forced losses over the eval split
(jitted, batched, masked), and optionally batched synthesis of the eval set
(BASELINE config 2)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sstts.checkpoint import CheckpointManager
from sstts.config import Config
from sstts.data import pipeline as pipeline_mod
from sstts.synthesize import Synthesizer
from sstts.train import TrainState, create_state, load_corpus, make_eval_step
from sstts.utils.logging import MetricsLogger


def evaluate_state(
    cfg: Config,
    state: TrainState,
    num_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Aggregate teacher-forced losses over the eval split."""
    _, eval_utts = load_corpus(cfg)
    if not eval_utts:
        raise ValueError("eval split is empty; lower eval_fraction or add data")
    batcher = pipeline_mod.Batcher(eval_utts, cfg)
    eval_step = make_eval_step(cfg)
    agg: Dict[str, float] = {}
    n = 0
    for _, batch in batcher.epoch(0, cfg.evaluation.batch_size):
        metrics, _ = eval_step(state, jax.tree.map(jnp.asarray, batch))
        for k, v in jax.device_get(metrics).items():
            agg[k] = agg.get(k, 0.0) + float(v)
        n += 1
        if num_batches is not None and n >= num_batches:
            break
    return {k: v / max(n, 1) for k, v in agg.items()}


def evaluate(
    cfg: Config,
    workdir: str | Path,
    num_batches: Optional[int] = None,
    synthesize_count: int = 0,
) -> Dict[str, float]:
    """Restore the latest checkpoint under `workdir` and evaluate it."""
    ckpt = CheckpointManager(cfg, workdir)
    state = create_state(cfg)
    step, state = ckpt.restore_latest(jax.device_get(state))
    if step is None:
        raise FileNotFoundError(f"no checkpoint found under {workdir}")
    metrics = evaluate_state(cfg, state, num_batches)
    logger = MetricsLogger(workdir)
    logger.log(step, metrics, prefix="eval")

    if synthesize_count > 0:
        _, eval_utts = load_corpus(cfg)
        synth = Synthesizer(cfg, state.params, state.batch_stats)
        outdir = Path(workdir) / cfg.inference.output_dir
        for u in eval_utts[:synthesize_count]:
            synth.to_file(u.text, outdir / f"eval_{u.uid}.wav")
        print(f"wrote {min(synthesize_count, len(eval_utts))} WAVs to {outdir}")
    logger.close()
    ckpt.close()
    return metrics
