"""Deterministic synthetic corpus for tests, smoke training, and benchmarks.

The real LJSpeech tarball is not shipped with the repo (zero-egress image), so
this module fabricates an LJSpeech-shaped corpus: pseudo-sentences over the
real charset, paired with deterministic multi-tone waveforms whose spectral
content depends on the text.  Every config the benchmark suite exercises
(BASELINE.md configs 1-5) can run on it with identical shapes/dtypes to the
real corpus.
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np

from sstts.config import DatasetConfig
from sstts.data import wav as wav_mod
from sstts.data.ljspeech import Utterance

_WORDS = (
    "the quick brown fox jumps over a lazy dog while printing reports "
    "on speech synthesis with tacotron style models for the tpu native "
    "framework that reconstructs audio from mel spectrograms very well"
).split()


def make_utterances(
    n: int, cfg: DatasetConfig, min_words: int = 4, max_words: int = 12
) -> List[Utterance]:
    rng = np.random.default_rng(42)
    utts = []
    for i in range(n):
        k = int(rng.integers(min_words, max_words + 1))
        words = rng.choice(_WORDS, size=k)
        utts.append(Utterance(f"SYN-{i:05d}", f"<synthetic:{i}>", " ".join(words)))
    return utts


def synth_waveform(uid: str, text: str, cfg: DatasetConfig) -> np.ndarray:
    """Deterministic waveform for an utterance: per-character tone sequence.

    Each character maps to a distinct fundamental; duration scales with text
    length, so text length and audio length correlate as in real speech.
    """
    rng = np.random.default_rng(abs(hash(uid)) % 2**32)
    sr = cfg.sample_rate
    char_dur = int(0.06 * sr)
    segs = []
    phase = 0.0
    for c in text:
        f0 = 110.0 + 12.0 * (ord(c) % 32)
        t = np.arange(char_dur) / sr
        seg = 0.4 * np.sin(2 * np.pi * f0 * t + phase)
        seg += 0.15 * np.sin(2 * np.pi * 2 * f0 * t + phase)
        phase += 2 * np.pi * f0 * char_dur / sr
        segs.append(seg)
    y = np.concatenate(segs) if segs else np.zeros(char_dur)
    y += 0.01 * rng.standard_normal(len(y))
    return y.astype(np.float32)


def materialize_corpus(root: str | Path, n: int, cfg: DatasetConfig) -> Path:
    """Write a real on-disk LJSpeech-layout corpus (metadata.csv + wavs/)."""
    root = Path(root)
    (root / "wavs").mkdir(parents=True, exist_ok=True)
    utts = make_utterances(n, cfg)
    lines = []
    for u in utts:
        y = synth_waveform(u.uid, u.text, cfg)
        wav_mod.save_wav(root / "wavs" / f"{u.uid}.wav", y, cfg.sample_rate)
        lines.append(f"{u.uid}|{u.text}|{u.text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root
