"""Text front-end: normalization, charset, id mapping.

TPU-native counterpart of the reference's text handling inside its dataset
definitions (`datasets/lj_speech.py` — SURVEY.md §2.3).  The base charset is
printable-ASCII-lowercase + punctuation (the reference charset could not be
verified against the empty mount; SURVEY.md §7.3 prescribes this fallback).
Non-English corpora (SURVEY.md §2.3's German corpus row) extend it through
``DatasetConfig.extra_chars``: configured characters are APPENDED to the base
charset (so base ids — and therefore LJSpeech checkpoints — never shift) and
survive normalization instead of being transliterated to nearest-ASCII.

Encoding appends one EOS symbol; id 0 is padding, so masks are `ids != 0`.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache
from typing import List, Tuple

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


class Charset:
    """One charset instance: the base charset plus configured extra chars.

    Extra characters append AFTER the base charset, so the id of every base
    character (and PAD/EOS) is identical across all charsets — an LJSpeech
    checkpoint's embedding rows stay valid when the table merely grows.
    """

    def __init__(self, extra_chars: Tuple[str, ...] = ()):
        extras: List[str] = []
        for ch in extra_chars:
            for c in ch:  # accept multi-char strings like "äöü"
                c = c.lower()
                if c not in CHAR_TO_ID and c not in extras:
                    extras.append(c)
        self.extra_chars: Tuple[str, ...] = tuple(extras)
        self.charset: str = CHARSET + "".join(extras)
        self.char_to_id = {c: i for i, c in enumerate(self.charset)}
        self.id_to_char = {i: c for i, c in enumerate(self.charset)}
        self.vocab_size = len(self.charset)

    def normalize(self, text: str) -> str:
        """Lowercase, expand abbreviations, keep configured chars,
        transliterate the rest toward ASCII, drop what remains foreign."""
        text = unicodedata.normalize("NFC", text).lower()
        for pattern, replacement in _ABBREVIATIONS:
            text = pattern.sub(replacement, text)
        text = _WHITESPACE_RE.sub(" ", text).strip()
        out: List[str] = []
        for c in text:
            if c in self.char_to_id:
                if c not in (PAD, EOS):
                    out.append(c)
                continue
            if c == "ß":  # NFKD does not decompose ß; use the standard form
                out.append("ss" if "s" in self.char_to_id else "")
                continue
            # Closest-ASCII transliteration (ä→a, é→e, …) for anything the
            # configured charset does not carry natively.
            t = (
                unicodedata.normalize("NFKD", c)
                .encode("ascii", "ignore")
                .decode("ascii")
            )
            out.extend(x for x in t if x in self.char_to_id and x not in (PAD, EOS))
        return "".join(out)

    def encode(self, text: str, max_len: int | None = None) -> np.ndarray:
        """Normalized text -> int32 ids with a trailing EOS; optionally padded."""
        ids = [self.char_to_id[c] for c in self.normalize(text)] + [EOS_ID]
        if max_len is not None:
            if len(ids) > max_len:
                ids = ids[: max_len - 1] + [EOS_ID]
            ids = ids + [PAD_ID] * (max_len - len(ids))
        return np.asarray(ids, dtype=np.int32)

    def decode(self, ids: np.ndarray) -> str:
        out: List[str] = []
        for i in np.asarray(ids).tolist():
            c = self.id_to_char.get(int(i), "")
            if c == EOS:
                break
            if c != PAD:
                out.append(c)
        return "".join(out)


@lru_cache(maxsize=None)
def charset_for(extra_chars: Tuple[str, ...] = ()) -> Charset:
    """Memoized charset factory; pass `cfg.dataset.extra_chars`."""
    return Charset(tuple(extra_chars))

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


def normalize(text: str, extra_chars: Tuple[str, ...] = ()) -> str:
    """Lowercase, expand abbreviations, drop/transliterate out-of-charset."""
    return charset_for(extra_chars).normalize(text)


def encode(
    text: str,
    max_len: int | None = None,
    extra_chars: Tuple[str, ...] = (),
) -> np.ndarray:
    """Normalized text -> int32 ids with a trailing EOS; optionally padded."""
    return charset_for(extra_chars).encode(text, max_len)


def decode(ids: np.ndarray, extra_chars: Tuple[str, ...] = ()) -> str:
    return charset_for(extra_chars).decode(ids)


_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?;])\s+")


def split_sentences(
    text: str, max_chars: int, extra_chars: Tuple[str, ...] = ()
) -> List[str]:
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
    norm = normalize(text, extra_chars)
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
