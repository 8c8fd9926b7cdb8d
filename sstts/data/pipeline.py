"""Input pipeline: bucketing, padding, batching.

Counterpart of the reference's feed pipeline (SURVEY.md §2.3 "Batching"), but
built for XLA's compile-once model: every batch is padded to one of a small
set of static (text_len, n_frames) bucket shapes, so the jitted train step
compiles once per bucket and never again.  Waveforms ship to device raw; the
STFT/mel front-end runs inside the train step (BASELINE config 5), so the
host->device boundary carries audio samples only.

Frame/sample accounting: a centered STFT over n samples yields
1 + n // hop frames.  Padded audio produces identical leading frames; only
frames whose analysis window crosses the valid-audio boundary differ, so the
loss mask ends `ceil((n_fft/2)/hop) + 1` frames early (conservative, keeps
padded-batch outputs consistent with unpadded inference).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from sstts.config import Config
from sstts.data import synthetic
from sstts.data import text as text_mod
from sstts.data import wav as wav_mod
from sstts.data.ljspeech import Utterance


Batch = Dict[str, np.ndarray]
# Batch fields:
#   char_ids:    (B, L)  int32, 0-padded, EOS-terminated
#   text_len:    (B,)    int32
#   samples:     (B, S)  int16 zero-padded waveform (PCM16 — half the
#                host->device bytes of f32; the corpus is 16-bit at source;
#                the train step dequantizes on device)
#   n_frames:    (B,)    int32  total valid STFT frames
#   loss_frames: (B,)    int32  frames included in the loss (see module doc)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def load_audio(utt: Utterance, cfg: Config) -> np.ndarray:
    """Load + trim an utterance waveform (host side).

    Uses the native C++ decoder/trimmer (sstts.data.native_loader) when the
    toolchain built it; otherwise the pure-numpy codec."""
    ds = cfg.dataset
    if utt.wav_path.startswith("<synthetic"):
        y = synthetic.synth_waveform(utt.uid, utt.text, ds)
    else:
        from sstts.data import native_loader

        if native_loader.available():
            y, sr = native_loader.load_wav(
                utt.wav_path, sample_rate_hint=ds.sample_rate
            )
        else:
            y, sr = wav_mod.load_wav(utt.wav_path)
        if sr != ds.sample_rate:
            if ds.resample_on_load:
                from sstts.dsp.resample import resample

                y = resample(y, sr, ds.sample_rate)
            else:
                raise ValueError(
                    f"{utt.wav_path}: sample rate {sr} != configured "
                    f"{ds.sample_rate} (set dataset.resample_on_load to "
                    "convert at load time)"
                )
        y = native_loader.trim_silence(y, ds.trim_top_db)
    return y


def frame_bucket_shapes(cfg: Config) -> List[Tuple[int, int]]:
    """Static (text_len, n_frames) bucket shapes; frames rounded to r."""
    r = cfg.arch.reduction_factor
    shapes = []
    for lt, fb in zip(cfg.training.text_buckets, cfg.training.frame_buckets):
        shapes.append((lt, _cdiv(fb, r) * r))
    return shapes


def assign_bucket(
    text_len: int, n_frames: int, shapes: Sequence[Tuple[int, int]]
) -> int:
    """Smallest bucket that fits, or -1 if none does."""
    for i, (lt, fr) in enumerate(shapes):
        if text_len <= lt and n_frames <= fr:
            return i
    return -1


def make_batch(
    items: Sequence[Tuple[np.ndarray, np.ndarray]],
    text_len: int,
    n_frames: int,
    cfg: Config,
) -> Batch:
    """Pad (ids, audio) pairs to the static bucket shape."""
    ds = cfg.dataset
    hop, n_fft = ds.hop_len, ds.n_fft
    n_samples = (n_frames - 1) * hop  # -> exactly n_frames centered frames
    bsz = len(items)
    char_ids = np.zeros((bsz, text_len), dtype=np.int32)
    samples = np.zeros((bsz, n_samples), dtype=np.int16)
    tlen = np.zeros((bsz,), dtype=np.int32)
    frames = np.zeros((bsz,), dtype=np.int32)
    loss_frames = np.zeros((bsz,), dtype=np.int32)
    guard = _cdiv(n_fft // 2, hop) + 1
    for b, (ids, audio) in enumerate(items):
        audio = audio[: n_samples]
        char_ids[b, : len(ids)] = ids
        tlen[b] = len(ids)
        samples[b, : len(audio)] = np.round(
            np.clip(audio, -1.0, 1.0) * 32767.0
        ).astype(np.int16)
        nf = min(n_frames, 1 + len(audio) // hop)
        frames[b] = nf
        loss_frames[b] = max(1, nf - guard)
    return {
        "char_ids": char_ids,
        "text_len": tlen,
        "samples": samples,
        "n_frames": frames,
        "loss_frames": loss_frames,
    }


class Batcher:
    """Bucketed batch iterator over a list of utterances.

    Audio is loaded lazily per epoch (LJSpeech does not fit in RAM as f32);
    text encoding and bucket assignment happen once up front using the audio
    length implied by the wav header-free estimate (actual load at yield
    time).  For determinism across runs the shuffle is seeded per epoch.
    """

    def __init__(
        self,
        utts: Sequence[Utterance],
        cfg: Config,
        drop_oversize: bool = True,
        audio_cache=None,
    ):
        self.cfg = cfg
        if audio_cache is None:
            from sstts.data import features_cache

            audio_cache = features_cache.open_cache(cfg)
        self.audio_cache = audio_cache
        self.shapes = frame_bucket_shapes(cfg)
        self.examples: List[Tuple[Utterance, np.ndarray]] = []
        self._audio_cache: Dict[str, np.ndarray] = {}
        self._len_cache: Dict[str, int] = {}  # uid -> trimmed sample count
        self._cache_all = len(utts) <= 4096  # small corpora stay resident
        skipped = 0
        for u in utts:
            ids = text_mod.encode(
                u.text,
                extra_chars=cfg.dataset.extra_chars,
                expand_numbers=cfg.dataset.expand_numbers,
            )
            if len(ids) > cfg.dataset.max_text_len:
                skipped += 1
                continue
            self.examples.append((u, ids))
        self.skipped = skipped

    def audio(self, u: Utterance) -> np.ndarray:
        """Load (or fetch from cache) one utterance's trimmed waveform."""
        return self._audio(u)

    def _audio(self, u: Utterance) -> np.ndarray:
        if self._cache_all and u.uid in self._audio_cache:
            return self._audio_cache[u.uid]
        if self.audio_cache is not None and u.uid in self.audio_cache:
            y = self.audio_cache.get(u.uid)
        else:
            y = load_audio(u, self.cfg)
        if self._cache_all:
            self._audio_cache[u.uid] = y
        return y

    def _audio_len(self, u: Utterance) -> int:
        """Trimmed sample count of one utterance, as cheaply as possible.

        Order of preference: the per-uid memo (filled by epoch() as it loads
        audio anyway), the consolidated cache's index (no I/O), and only then
        a real audio load.  Keeps `batches_per_epoch` — called at every
        startup/resume to derive the epoch counter — from decoding the whole
        corpus just to count batches (round-3 advisor finding)."""
        n = self._len_cache.get(u.uid)
        if n is None:
            if self.audio_cache is not None and u.uid in self.audio_cache:
                n = self.audio_cache.length(u.uid)
            else:
                n = len(self._audio(u))
            self._len_cache[u.uid] = n
        return n

    def batches_per_epoch(self, batch_size: int) -> int:
        """Deterministic batch count of one epoch (shuffle-invariant).

        Bucket assignment depends only on per-utterance text/frame lengths,
        so the count is the same for every epoch seed; used by the trainer
        to derive the epoch counter from a restored step (resume must
        continue the data order, not replay epoch 0).  Uses index/memoized
        lengths where available; otherwise loads each utterance's audio
        once (memoized, so repeat calls cost nothing)."""
        per_bucket: Dict[int, int] = {}
        hop = self.cfg.dataset.hop_len
        for u, ids in self.examples:
            nf = 1 + self._audio_len(u) // hop
            bucket = assign_bucket(len(ids), nf, self.shapes)
            if bucket >= 0:
                per_bucket[bucket] = per_bucket.get(bucket, 0) + 1
        return sum(-(-n // batch_size) for n in per_bucket.values())

    def epoch(self, seed: int, batch_size: int) -> Iterator[Tuple[int, Batch]]:
        """Yield (bucket_index, batch) pairs covering the corpus once."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.examples))
        pools: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}
        hop = self.cfg.dataset.hop_len
        for idx in order:
            u, ids = self.examples[idx]
            audio = self._audio(u)
            self._len_cache[u.uid] = len(audio)
            nf = 1 + len(audio) // hop
            bucket = assign_bucket(len(ids), nf, self.shapes)
            if bucket < 0:
                continue
            pools.setdefault(bucket, []).append((ids, audio))
            if len(pools[bucket]) == batch_size:
                lt, fr = self.shapes[bucket]
                yield bucket, make_batch(pools.pop(bucket), lt, fr, self.cfg)
        # Flush remainders, repeating entries to fill the static batch shape.
        # Fill rows are masked out of the loss (loss_frames=0) so repeated
        # utterances do not get double gradient weight at the epoch tail.
        for bucket, items in pools.items():
            n_real = len(items)
            while len(items) < batch_size:
                items.append(items[len(items) % n_real])
            lt, fr = self.shapes[bucket]
            batch = make_batch(items[:batch_size], lt, fr, self.cfg)
            batch["loss_frames"][n_real:] = 0
            yield bucket, batch
