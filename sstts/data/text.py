"""Text front-end: normalization, charset, id mapping.

TPU-native counterpart of the reference's text handling inside its dataset
definitions (`datasets/lj_speech.py` — SURVEY.md §2.3).  The charset is
printable-ASCII-lowercase + punctuation (the reference charset could not be
verified against the empty mount; SURVEY.md §7.3 prescribes this fallback).

Encoding appends one EOS symbol; id 0 is padding, so masks are `ids != 0`.
"""

from __future__ import annotations

import re
import unicodedata
from typing import List

import numpy as np

PAD = "_"
EOS = "~"
_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789 !'\"(),-.:;?"
CHARSET: str = PAD + EOS + _CHARS

CHAR_TO_ID = {c: i for i, c in enumerate(CHARSET)}
ID_TO_CHAR = {i: c for i, c in enumerate(CHARSET)}

PAD_ID = CHAR_TO_ID[PAD]
EOS_ID = CHAR_TO_ID[EOS]

VOCAB_SIZE = len(CHARSET)

_WHITESPACE_RE = re.compile(r"\s+")

# Minimal abbreviation expansion for LJSpeech-style normalized text.
_ABBREVIATIONS = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), full)
    for abbr, full in [
        ("mr", "mister"),
        ("mrs", "misess"),
        ("dr", "doctor"),
        ("st", "saint"),
        ("co", "company"),
        ("jr", "junior"),
        ("maj", "major"),
        ("gen", "general"),
        ("drs", "doctors"),
        ("rev", "reverend"),
        ("lt", "lieutenant"),
        ("hon", "honorable"),
        ("sgt", "sergeant"),
        ("capt", "captain"),
        ("esq", "esquire"),
        ("ltd", "limited"),
        ("col", "colonel"),
        ("ft", "fort"),
    ]
]


def normalize(text: str) -> str:
    """Lowercase, strip accents, expand abbreviations, drop out-of-charset."""
    text = unicodedata.normalize("NFKD", text)
    text = text.encode("ascii", "ignore").decode("ascii")
    text = text.lower()
    for pattern, replacement in _ABBREVIATIONS:
        text = pattern.sub(replacement, text)
    text = _WHITESPACE_RE.sub(" ", text).strip()
    return "".join(c for c in text if c in CHAR_TO_ID and c not in (PAD, EOS))


def encode(text: str, max_len: int | None = None) -> np.ndarray:
    """Normalized text -> int32 ids with a trailing EOS; optionally padded."""
    ids = [CHAR_TO_ID[c] for c in normalize(text)] + [EOS_ID]
    if max_len is not None:
        if len(ids) > max_len:
            ids = ids[: max_len - 1] + [EOS_ID]
        ids = ids + [PAD_ID] * (max_len - len(ids))
    return np.asarray(ids, dtype=np.int32)


def decode(ids: np.ndarray) -> str:
    out: List[str] = []
    for i in np.asarray(ids).tolist():
        c = ID_TO_CHAR.get(int(i), "")
        if c == EOS:
            break
        if c != PAD:
            out.append(c)
    return "".join(out)


_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?;])\s+")


def split_sentences(text: str, max_chars: int) -> List[str]:
    """Split long text into synthesis chunks of <= max_chars (normalized).

    Splits at sentence punctuation first; sentences that still exceed the
    budget split at word boundaries (a single word longer than max_chars is
    hard-cut).  Adjacent short sentences pack into one chunk so the decoder
    sees natural prosodic groups instead of fragments.  Serves paragraph /
    document synthesis past the model's max_text_len (the reference's only
    long-input strategy was more decoder steps — SURVEY.md §5.7).
    """
    if max_chars < 1:
        raise ValueError("max_chars must be positive")
    norm = normalize(text)
    if not norm:
        return []
    # Emit ordered pieces (whole sentences, or words / hard-cut fragments of
    # oversized sentences), then pack adjacent pieces greedily in ONE pass —
    # packing never reorders, so document order is preserved.
    pieces: List[str] = []
    for sentence in _SENTENCE_SPLIT_RE.split(norm):
        if len(sentence) <= max_chars:
            pieces.append(sentence)
            continue
        for w in sentence.split(" "):
            while len(w) > max_chars:  # pathological single word
                pieces.append(w[:max_chars])
                w = w[max_chars:]
            if w:
                pieces.append(w)
    chunks: List[str] = []
    cur = ""
    for p in pieces:
        if not cur:
            cur = p
        elif len(cur) + 1 + len(p) <= max_chars:
            cur = f"{cur} {p}"
        else:
            chunks.append(cur)
            cur = p
    if cur:
        chunks.append(cur)
    return chunks
