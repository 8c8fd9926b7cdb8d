"""LJSpeech corpus definition.

Counterpart of the reference's `datasets/lj_speech.py` (SURVEY.md §2.3): parse
`metadata.csv`, normalize text, point at wavs, and produce a deterministic
train/eval split.  The split hashes utterance ids (stable across runs and
machines) instead of the reference's listing-order split.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from pathlib import Path
from typing import List, Tuple

from sstts.config import DatasetConfig
from sstts.data import text as text_mod


@dataclass(frozen=True)
class Utterance:
    uid: str
    wav_path: str
    text: str  # normalized


def _stable_fraction(uid: str) -> float:
    digest = hashlib.sha1(uid.encode()).digest()
    return int.from_bytes(digest[:8], "big") / 2**64


def load_metadata(cfg: DatasetConfig) -> List[Utterance]:
    """Parse LJSpeech metadata.csv -> normalized utterances.

    Format: ``id|raw transcription|normalized transcription`` per line; the
    normalized column (numbers expanded) is preferred when present.
    """
    root = Path(cfg.dataset_dir)
    meta = root / "metadata.csv"
    if not meta.exists():
        raise FileNotFoundError(
            f"LJSpeech metadata not found at {meta}; set DatasetConfig.dataset_dir"
        )
    utts: List[Utterance] = []
    for line in meta.read_text(encoding="utf-8").splitlines():
        if not line.strip():
            continue
        parts = line.split("|")
        uid = parts[0].strip()
        raw = parts[2] if len(parts) > 2 and parts[2].strip() else parts[1]
        norm = text_mod.normalize(raw, cfg.extra_chars, cfg.expand_numbers)
        if not norm or len(norm) + 1 > cfg.max_text_len:
            continue
        utts.append(Utterance(uid, str(root / "wavs" / f"{uid}.wav"), norm))
    return utts


def train_eval_split(
    utts: List[Utterance], eval_fraction: float
) -> Tuple[List[Utterance], List[Utterance]]:
    train, evals = [], []
    for u in utts:
        (evals if _stable_fraction(u.uid) < eval_fraction else train).append(u)
    return train, evals
