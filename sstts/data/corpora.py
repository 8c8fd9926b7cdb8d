"""Additional corpus definitions: Blizzard-2011 "Nancy" and CSS10.

SURVEY.md §2.3 lists the thesis's non-LJSpeech corpora (Blizzard-Nancy and a
German corpus) as [PK-low-conf] rows — the reference mount was empty, so
these loaders follow the corpora's PUBLIC distribution layouts rather than a
verified reference file:

* **Blizzard 2011 "Nancy"**: a festival-style ``prompts.data`` file of
  ``( <uid> "<text>" )`` records with waveforms in ``wavn/<uid>.wav``
  (``wavs/`` accepted as a fallback).
* **CSS10** (covers the German corpus case): ``transcript.txt`` of
  ``<wav path>|<raw text>|<normalized text>|<duration>`` rows relative to
  the corpus root.

Both normalize through the shared text front-end (sstts.data.text).  With
the default ASCII charset, non-ASCII (e.g. German umlauts) transliterates to
its closest ASCII form; configure ``dataset.extra_chars`` (e.g. ``("äöüß",)``)
to keep those distinctions — the charset the model embeds then carries them
natively (SURVEY.md §2.3's German corpus row).  Sample-rate mismatches are handled
by `sstts.data.pipeline.load_audio` (strict by default; polyphase resample
when ``dataset.resample_on_load`` is set).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List

from sstts.config import DatasetConfig
from sstts.data import text as text_mod
from sstts.data.ljspeech import Utterance

_PROMPT_RE = re.compile(r"\(\s*(\S+)\s+\"(.*?)\"\s*\)", re.DOTALL)


def _keep(cfg: DatasetConfig, norm: str) -> bool:
    return bool(norm) and len(norm) + 1 <= cfg.max_text_len


def load_blizzard_nancy(cfg: DatasetConfig) -> List[Utterance]:
    """Parse a Blizzard-2011 (Nancy corpus) style prompts file."""
    root = Path(cfg.dataset_dir)
    prompts = root / "prompts.data"
    if not prompts.exists():
        raise FileNotFoundError(
            f"Blizzard prompts file not found at {prompts}; "
            "set DatasetConfig.dataset_dir to the corpus root"
        )
    wav_dir = root / "wavn"
    if not wav_dir.is_dir():
        wav_dir = root / "wavs"
    utts: List[Utterance] = []
    for match in _PROMPT_RE.finditer(prompts.read_text(encoding="utf-8")):
        uid, raw = match.group(1), match.group(2)
        norm = text_mod.normalize(raw, cfg.extra_chars, cfg.expand_numbers)
        if not _keep(cfg, norm):
            continue
        utts.append(Utterance(uid, str(wav_dir / f"{uid}.wav"), norm))
    return utts


def load_css10(cfg: DatasetConfig) -> List[Utterance]:
    """Parse a CSS10-layout corpus (e.g. the German single-speaker set)."""
    root = Path(cfg.dataset_dir)
    meta = root / "transcript.txt"
    if not meta.exists():
        raise FileNotFoundError(
            f"CSS10 transcript not found at {meta}; "
            "set DatasetConfig.dataset_dir to the corpus root"
        )
    utts: List[Utterance] = []
    for line in meta.read_text(encoding="utf-8").splitlines():
        if not line.strip():
            continue
        parts = line.split("|")
        if len(parts) < 2:
            continue
        rel = parts[0].strip()
        # Prefer the normalized-transcript column when present.
        raw = parts[2] if len(parts) > 2 and parts[2].strip() else parts[1]
        norm = text_mod.normalize(raw, cfg.extra_chars, cfg.expand_numbers)
        if not _keep(cfg, norm):
            continue
        # uid keeps the directory part: CSS10 numbers files per book
        # ("book_a/1.wav", "book_b/1.wav"), so a bare stem would collide
        # in the uid-keyed features cache and train/eval split.
        uid = str(Path(rel).with_suffix("")).replace("/", "_")
        utts.append(Utterance(uid, str(root / rel), norm))
    return utts
