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
        # Numpy batch straight into the jitted step — the transfer folds
        # into the async dispatch; eager per-array jnp.asarray would be a
        # blocking relay round-trip each (CLAUDE.md transfer discipline).
        metrics, _ = eval_step(state, batch)
        for k, v in jax.device_get(metrics).items():
            agg[k] = agg.get(k, 0.0) + float(v)
        n += 1
        if num_batches is not None and n >= num_batches:
            break
    if n == 0:
        raise ValueError(
            "eval split produced no batches: every utterance exceeded the "
            "configured text/frame buckets (check training.text_buckets / "
            "frame_buckets against the corpus)"
        )
    return {k: v / n for k, v in agg.items()}


def resynthesis_metrics(
    cfg: Config,
    state: TrainState,
    num_utterances: int = 8,
) -> Dict[str, float]:
    """The SURVEY.md §6 acceptance metric, self-consistent form: synthesize
    eval-split texts autoregressively and measure mel-L1 between the
    *generated* mel and the ground-truth features over the overlapping
    frames, plus stop-token length accuracy."""
    import numpy as np

    from sstts.data import pipeline as pm
    from sstts.data import text as text_mod
    from sstts.dsp.ops import wav_to_features

    train_utts, eval_utts = load_corpus(cfg)
    utts = (eval_utts or train_utts)[:num_utterances]
    # Build the batch directly in utterance order (the training Batcher
    # shuffles and bucket-drops, which would misalign rows vs texts here).
    r = cfg.arch.reduction_factor
    items = [
        (
            text_mod.encode(
                u.text,
                extra_chars=cfg.dataset.extra_chars,
                expand_numbers=cfg.dataset.expand_numbers,
            ),
            pm.load_audio(u, cfg),
        )
        for u in utts
    ]
    text_len = max(len(ids) for ids, _ in items)
    max_frames = max(1 + len(a) // cfg.dataset.hop_len for _, a in items)
    fr = -(-max_frames // r) * r
    batch = pm.make_batch(items, text_len, fr, cfg)
    # Numpy PCM16 straight into the jit; the int16->f32 scale runs on device.
    _, gt_mel = jax.jit(
        lambda s: wav_to_features(
            s.astype(jnp.float32) * (1.0 / 32767.0), cfg.dataset
        )
    )(batch["samples"])
    synth = Synthesizer(cfg, state.params, state.batch_stats)
    _, full = synth.synthesize_batch(
        [u.text for u in utts], full_output=True,
        fetch=("wav", "mel", "n_frames", "n_samples"),
    )
    l1s, len_errs = [], []
    for i in range(len(utts)):
        gt_frames = int(batch["loss_frames"][i])
        gen_frames = int(full["n_frames"][i])
        n = min(gt_frames, gen_frames)
        if n >= 8:
            l1s.append(
                float(
                    np.abs(
                        np.asarray(full["mel"][i, :n])
                        - np.asarray(gt_mel[i, :n])
                    ).mean()
                )
            )
        len_errs.append(abs(gen_frames - gt_frames) / max(gt_frames, 1))
    return {
        "resynthesis_mel_l1": float(np.mean(l1s)) if l1s else float("nan"),
        "resynthesis_len_rel_err": float(np.mean(len_errs)),
        "resynthesis_utterances": float(len(utts)),
    }


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
    if cfg.inference.use_ema:
        if state.ema_params is None:
            raise ValueError(
                f"inference.use_ema: checkpoint under {workdir} stores no "
                "ema_params tree (train with training.ema_decay > 0)"
            )
        # Evaluate the Polyak-averaged weights: swap them in as the params
        # for every downstream consumer (losses + resynthesis + WAV dumps).
        # batch_stats stay as stored — BN statistics are already running
        # averages.
        state = state.replace(params=state.ema_params)
    metrics = evaluate_state(cfg, state, num_batches)
    try:
        metrics.update(resynthesis_metrics(cfg, state))
    except (ValueError, FileNotFoundError) as e:
        print(f"[warn] resynthesis metrics skipped: {e}", flush=True)
    logger = MetricsLogger(workdir)
    logger.log(step, metrics, prefix="eval")

    if synthesize_count > 0:
        _, eval_utts = load_corpus(cfg)
        synth = Synthesizer(cfg, state.params, state.batch_stats)
        outdir = Path(workdir) / cfg.inference.output_dir
        outdir.mkdir(parents=True, exist_ok=True)
        utts = eval_utts[:synthesize_count]
        wavs, full = synth.synthesize_batch(
            [u.text for u in utts], full_output=True,
            fetch=("wav", "mel", "alignments", "n_frames", "n_samples"),
        )
        from sstts.data.wav import save_wav

        for i, u in enumerate(utts):
            save_wav(outdir / f"eval_{u.uid}.wav", wavs[i],
                     cfg.dataset.sample_rate)
        # Alignment / spectrogram plots (reference evaluate emitted plots —
        # SURVEY.md §3.3, §2.1 visualization); skipped when matplotlib is
        # unavailable.
        try:
            from sstts.utils.visualization import (
                plot_attention_alignment,
                plot_spectrogram,
            )

            import numpy as _np

            for i, u in enumerate(utts):
                nf = int(full["n_frames"][i])
                steps = max(1, nf // cfg.arch.reduction_factor)
                plot_attention_alignment(
                    _np.asarray(full["alignments"][i][:steps]),
                    title=f"alignment {u.uid}",
                    path=outdir / f"eval_{u.uid}_alignment.png",
                )
                plot_spectrogram(
                    _np.asarray(full["mel"][i][:nf]),
                    title=f"mel {u.uid}",
                    path=outdir / f"eval_{u.uid}_mel.png",
                )
        except ImportError:
            pass
        print(f"wrote {len(utts)} WAVs (+plots) to {outdir}")
    logger.close()
    ckpt.close()
    return metrics
