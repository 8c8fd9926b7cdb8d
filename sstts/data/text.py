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

Numbers are expanded to English words at normalization time (default on,
``DatasetConfig.expand_numbers``): LJSpeech's normalized transcripts spell
numbers out, so feeding raw digit ids at serving time would be
out-of-distribution for any model trained on them (round-3 verdict
Missing #4).  Supported scope is documented on :meth:`Charset.normalize`.

Behavior change (2026-08-19, round 3): 'ß' now normalizes to "ss" (the
standard expansion); before round 3 it was silently DROPPED by the
NFKD+ascii-ignore transliteration.  This changes tokenization of
ß-containing text without a fingerprint bump — acceptable because no
shipped checkpoint was trained on ß text (the synthetic corpus and the
round-1..3 demo runs are pure lowercase ASCII, and German-corpus support
via ``extra_chars`` postdates the change).
"""

from __future__ import annotations

import re
import unicodedata
import warnings
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

    ``expand_numbers`` controls digit→word expansion in :meth:`normalize`
    (default on; see there for the supported scope).  It does not change
    the charset itself, so it never affects vocab size or checkpoint
    fingerprints — only tokenization of digit-containing input.
    """

    def __init__(
        self, extra_chars: Tuple[str, ...] = (), expand_numbers: bool = True
    ):
        self.expand_numbers = bool(expand_numbers)
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
        """Lowercase, expand abbreviations and numbers, keep configured
        chars, transliterate the rest toward ASCII, drop what remains
        foreign.

        Number expansion (when ``expand_numbers``, the default) covers:
        comma-grouped integers ("1,234"), cardinals up to 10^15-1,
        four-digit years 1000–2999 read in the conventional pair form
        ("1876" → "eighteen seventy six", "1905" → "nineteen oh five",
        "2000" → "two thousand"), ordinal suffixes ("2nd" → "second",
        "21st" → "twenty first"), and decimals read digit-by-digit after
        "point" ("3.14" → "three point one four").  NOT handled (out of
        scope, documented): currency/percent symbols (not in the
        charset), negative signs, fractions, roman numerals, and
        digit-grouped codes like phone numbers (read as one cardinal).
        """
        text = unicodedata.normalize("NFC", text).lower()
        for pattern, replacement in _ABBREVIATIONS:
            text = pattern.sub(replacement, text)
        if self.expand_numbers:
            text = _expand_numbers(text)
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
        """Normalized text -> int32 ids with a trailing EOS; optionally padded.

        When ``max_len`` is given and the normalized text (plus EOS) exceeds
        it, the TAIL OF THE TEXT IS DROPPED — the result is the first
        ``max_len - 1`` ids plus EOS — and a ``UserWarning`` is emitted.
        Batch paths never hit this (the Batcher pre-filters by
        ``max_text_len`` and the serving path raises with a pointer at
        `synthesize_longform`); the warning exists for direct API callers,
        for whom silent truncation would corrupt the utterance end.
        """
        ids = [self.char_to_id[c] for c in self.normalize(text)] + [EOS_ID]
        if max_len is not None:
            if len(ids) > max_len:
                warnings.warn(
                    f"Charset.encode: normalized text of {len(ids) - 1} chars "
                    f"exceeds max_len={max_len}; truncating to the first "
                    f"{max_len - 1} chars + EOS (the utterance tail is "
                    "dropped). Split the text or raise max_len.",
                    UserWarning,
                    stacklevel=2,
                )
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
def charset_for(
    extra_chars: Tuple[str, ...] = (), expand_numbers: bool = True
) -> Charset:
    """Memoized charset factory; pass `cfg.dataset.extra_chars` (and
    `cfg.dataset.expand_numbers` when normalizing/encoding)."""
    return Charset(tuple(extra_chars), expand_numbers)

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

# ---------------------------------------------------------------------------
# Number → word expansion (English; scope documented on Charset.normalize).

_ONES = (
    "zero one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
).split()
_TENS = (
    "_ _ twenty thirty forty fifty sixty seventy eighty ninety"
).split()
_SCALES = ("", "thousand", "million", "billion", "trillion")
# Irregular cardinal→ordinal final words; regular words take "th"
# ("four"→"fourth") and "-ty" tens soften to "-tieth" ("twenty"→"twentieth").
_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _two_digits_to_words(n: int) -> str:
    if n < 20:
        return _ONES[n]
    tens, ones = divmod(n, 10)
    return _TENS[tens] if ones == 0 else f"{_TENS[tens]} {_ONES[ones]}"


def _three_digits_to_words(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    parts = []
    if hundreds:
        parts.append(f"{_ONES[hundreds]} hundred")
    if rest or not hundreds:
        parts.append(_two_digits_to_words(rest))
    return " ".join(parts)


def _cardinal_to_words(n: int) -> str:
    """Non-negative integer → English words; groups beyond 10^15 read
    digit-by-digit (no sensible cardinal reading at that magnitude)."""
    if n < 1000:
        return _three_digits_to_words(n)
    if n >= 10 ** 15:
        return " ".join(_ONES[int(d)] for d in str(n))
    groups: List[str] = []
    scale = 0
    while n:
        n, g = divmod(n, 1000)
        if g:
            words = _three_digits_to_words(g)
            groups.append(f"{words} {_SCALES[scale]}".rstrip())
        scale += 1
    return " ".join(reversed(groups))


def _year_to_words(n: int) -> str:
    """Conventional English reading of a 4-digit year in [1000, 2999]."""
    hi, lo = divmod(n, 100)
    if lo == 0:
        # "1900" → "nineteen hundred", "2000" → "two thousand".
        if hi % 10 == 0:
            return _cardinal_to_words(n)
        return f"{_two_digits_to_words(hi)} hundred"
    if 2000 <= n < 2010:
        return f"two thousand {_ONES[lo]}"
    if lo < 10:
        return f"{_two_digits_to_words(hi)} oh {_ONES[lo]}"
    return f"{_two_digits_to_words(hi)} {_two_digits_to_words(lo)}"


def _ordinal_to_words(n: int) -> str:
    words = _cardinal_to_words(n)
    head, _, last = words.rpartition(" ")
    if last in _ORDINAL_IRREGULAR:
        last = _ORDINAL_IRREGULAR[last]
    elif last.endswith("ty"):
        last = last[:-1] + "ieth"
    else:
        last = last + "th"
    return f"{head} {last}".strip()


_COMMA_NUM_RE = re.compile(r"\b(\d{1,3}(?:,\d{3})+)(?:\.(\d+))?\b")
_ORDINAL_RE = re.compile(r"\b(\d+)(st|nd|rd|th)\b")
_DECIMAL_RE = re.compile(r"\b(\d+)\.(\d+)\b")
_NUMBER_RE = re.compile(r"\d+")


def _expand_numbers(text: str) -> str:
    """Digit sequences → English words (runs on lowercased text).

    Pattern order matters: comma-grouped numbers expand first and ALWAYS
    as cardinals (a written "1,234" is a quantity, never a year); then
    ordinal suffixes and decimals claim their digits before the
    bare-number pass rewrites whatever remains.  Bare 4-digit numbers in
    [1000, 2999] read as years (matching how LJSpeech-style normalized
    transcripts read them); other integers read as cardinals.
    """

    def _comma(m: re.Match) -> str:
        words = _cardinal_to_words(int(m.group(1).replace(",", "")))
        if m.group(2):
            words += " point " + " ".join(_ONES[int(d)] for d in m.group(2))
        return words

    text = _COMMA_NUM_RE.sub(_comma, text)
    text = _ORDINAL_RE.sub(lambda m: _ordinal_to_words(int(m.group(1))), text)
    text = _DECIMAL_RE.sub(
        lambda m: f"{_cardinal_to_words(int(m.group(1)))} point "
        + " ".join(_ONES[int(d)] for d in m.group(2)),
        text,
    )

    def _bare(m: re.Match) -> str:
        n = int(m.group(0))
        if 1000 <= n <= 2999 and len(m.group(0)) == 4:
            return _year_to_words(n)
        return _cardinal_to_words(n)

    return _NUMBER_RE.sub(_bare, text)


def normalize(
    text: str,
    extra_chars: Tuple[str, ...] = (),
    expand_numbers: bool = True,
) -> str:
    """Lowercase, expand abbreviations + numbers, drop/transliterate
    out-of-charset."""
    return charset_for(extra_chars, expand_numbers).normalize(text)


def encode(
    text: str,
    max_len: int | None = None,
    extra_chars: Tuple[str, ...] = (),
    expand_numbers: bool = True,
) -> np.ndarray:
    """Normalized text -> int32 ids with a trailing EOS; optionally padded."""
    return charset_for(extra_chars, expand_numbers).encode(text, max_len)


def decode(ids: np.ndarray, extra_chars: Tuple[str, ...] = ()) -> str:
    return charset_for(extra_chars).decode(ids)


_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?;])\s+")


def split_sentences(
    text: str,
    max_chars: int,
    extra_chars: Tuple[str, ...] = (),
    expand_numbers: bool = True,
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
    norm = normalize(text, extra_chars, expand_numbers)
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
