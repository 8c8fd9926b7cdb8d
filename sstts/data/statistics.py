"""Corpus feature statistics (reference `datasets/statistics.py` —
SURVEY.md §2.3): per-corpus dB distributions of linear/mel spectrograms,
used to sanity-check normalization ranges (`ref_level_db` / `min_level_db`)
against real data.  Computation is batched on device."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sstts.config import Config
from sstts.data import pipeline as pipeline_mod
from sstts.data.ljspeech import Utterance
from sstts.dsp import mel as mel_mod
from sstts.dsp import ops
import sstts.dsp.stft as stft_mod


def compute_statistics(
    utts: Sequence[Utterance],
    cfg: Config,
    limit: Optional[int] = 256,
) -> Dict[str, float]:
    """dB statistics over (up to `limit`) utterances.

    Returns min/max/mean for linear and mel dB (before normalization) plus
    the fraction of normalized values that clip at 0 or 1 — if either clip
    fraction is large, the configured dB range does not fit the corpus.
    """
    ds = cfg.dataset

    @jax.jit
    def featurize_db(y):
        y = ops.preemphasis(y.astype(jnp.float32), ds.preemphasis)
        spec = stft_mod.stft(y, ds.n_fft, ds.hop_len, ds.win_len)
        mag = jnp.abs(spec)
        lin_db = ops.magnitude_to_decibel(mag)
        mel_db = ops.magnitude_to_decibel(mel_mod.apply_mel(mag, ds))
        return lin_db, mel_db

    lin_stats = []
    mel_stats = []
    clip_lo = clip_hi = total = 0
    for u in list(utts)[: limit or len(utts)]:
        audio = pipeline_mod.load_audio(u, cfg)
        if len(audio) < ds.win_len:
            continue
        # Numpy straight into the jit (transfer folds into the dispatch).
        lin_db, mel_db = featurize_db(audio)
        lin_db = np.asarray(lin_db)
        mel_db = np.asarray(mel_db)
        lin_stats.append((lin_db.min(), lin_db.max(), lin_db.mean()))
        mel_stats.append((mel_db.min(), mel_db.max(), mel_db.mean()))
        norm = (lin_db - ds.ref_level_db - ds.min_level_db) / (-ds.min_level_db)
        clip_lo += int((norm <= 0).sum())
        clip_hi += int((norm >= 1).sum())
        total += norm.size
    if not lin_stats:
        raise ValueError("no usable utterances for statistics")
    lin = np.asarray(lin_stats)
    mel = np.asarray(mel_stats)
    return {
        "n_utterances": float(len(lin_stats)),
        "linear_db_min": float(lin[:, 0].min()),
        "linear_db_max": float(lin[:, 1].max()),
        "linear_db_mean": float(lin[:, 2].mean()),
        "mel_db_min": float(mel[:, 0].min()),
        "mel_db_max": float(mel[:, 1].max()),
        "mel_db_mean": float(mel[:, 2].mean()),
        "clip_frac_low": clip_lo / max(total, 1),
        "clip_frac_high": clip_hi / max(total, 1),
    }
