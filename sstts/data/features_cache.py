"""Offline corpus pre-computation cache (SURVEY.md §2.3 "Feature cache /
stats", §3.4 dataset prep).

The reference precomputed per-utterance features (char-ids, mel, linear) to
``.npy`` files on host and trained from the cache.  The rebuild keeps feature
extraction *on device inside the train step* (BASELINE config 5) — so the
training cache stores what the host actually owes the device: the decoded,
silence-trimmed waveform, as PCM16 (the wire format).  A separate entry point
precomputes normalized mel/linear features (device-batched, same
`wav_to_features` code the train step runs) for offline analysis and tooling.

Layout (one consolidated store, not 13k tiny files):

    <cache_dir>/index.json   fingerprint + {uid: {"off": o, "len": n}} offsets
    <cache_dir>/audio.bin    concatenated int16 PCM (memory-mapped on open)
    <cache_dir>/mel.bin      optional, float16 (sum_frames, n_mels)
    <cache_dir>/linear.bin   optional, float16 (sum_frames, n_fft//2+1)

PCM16 is lossless w.r.t. training: `pipeline.make_batch` quantizes every
waveform to PCM16 for the host->device wire anyway, and f32->i16->f32->i16
round-trips bit-exactly, so batches built from the cache are byte-identical
to batches built from the original WAVs (tested in tests/test_data.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from sstts.config import Config
from sstts.data.ljspeech import Utterance

_INDEX = "index.json"
_AUDIO = "audio.bin"
_MEL = "mel.bin"
_LINEAR = "linear.bin"


def _fingerprint(cfg: Config) -> Dict[str, object]:
    """The config facts that invalidate cached audio/features."""
    ds = cfg.dataset
    return {
        "dataset": ds.dataset,
        "sample_rate": ds.sample_rate,
        "trim_top_db": ds.trim_top_db,
        "n_fft": ds.n_fft,
        "win_len_ms": ds.win_len_ms,
        "win_hop_ms": ds.win_hop_ms,
        "n_mels": ds.n_mels,
        "mel_fmin": ds.mel_fmin,
        "mel_fmax": ds.mel_fmax,
        "preemphasis": ds.preemphasis,
        "ref_level_db": ds.ref_level_db,
        "min_level_db": ds.min_level_db,
    }


def _quantize(y: np.ndarray) -> np.ndarray:
    """float waveform -> PCM16, matching pipeline.make_batch exactly."""
    return np.round(np.clip(y, -1.0, 1.0) * 32767.0).astype(np.int16)


def build_audio_cache(
    utts: Sequence[Utterance],
    cfg: Config,
    cache_dir: str | Path,
    progress_every: int = 1000,
) -> "AudioCache":
    """Decode + trim every utterance once, write the consolidated store."""
    from sstts.data import pipeline as pipeline_mod

    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    index: Dict[str, Dict[str, int]] = {}
    off = 0
    with open(cache_dir / _AUDIO, "wb") as f:
        for i, u in enumerate(utts):
            pcm = _quantize(pipeline_mod.load_audio(u, cfg))
            f.write(pcm.tobytes())
            index[u.uid] = {"off": off, "len": int(pcm.size)}
            off += int(pcm.size)
            if progress_every and (i + 1) % progress_every == 0:
                print(f"[cache] audio {i + 1}/{len(utts)}", flush=True)
    meta = {"fingerprint": _fingerprint(cfg), "audio": index}
    (cache_dir / _INDEX).write_text(json.dumps(meta))
    return AudioCache(cache_dir, cfg)


class AudioCache:
    """Memory-mapped read side of the consolidated audio store."""

    def __init__(self, cache_dir: str | Path, cfg: Config):
        self.dir = Path(cache_dir)
        meta = json.loads((self.dir / _INDEX).read_text())
        if meta["fingerprint"] != _fingerprint(cfg):
            raise ValueError(
                f"feature cache at {self.dir} was built with different "
                f"dataset hyperparameters; rebuild it "
                f"(cached={meta['fingerprint']})"
            )
        self._index: Dict[str, Dict[str, int]] = meta["audio"]
        self._pcm = np.memmap(self.dir / _AUDIO, dtype=np.int16, mode="r")
        self._features: Optional[Dict[str, Dict[str, int]]] = meta.get("features")
        self._mel = self._linear = None

    @staticmethod
    def exists(cache_dir: str | Path) -> bool:
        return (Path(cache_dir) / _INDEX).exists()

    def __contains__(self, uid: str) -> bool:
        return uid in self._index

    def __len__(self) -> int:
        return len(self._index)

    def get(self, uid: str) -> np.ndarray:
        """Trimmed waveform as float32 in [-1, 1] (dequantized PCM16)."""
        e = self._index[uid]
        pcm = self._pcm[e["off"] : e["off"] + e["len"]]
        return pcm.astype(np.float32) / 32767.0

    def get_pcm(self, uid: str) -> np.ndarray:
        e = self._index[uid]
        return np.asarray(self._pcm[e["off"] : e["off"] + e["len"]])

    def length(self, uid: str) -> int:
        """Trimmed-waveform sample count, straight from the index (no I/O).

        Lets the Batcher compute bucket assignments / epoch batch counts
        without touching audio bytes — resume of a large cached corpus
        would otherwise pay a full-corpus read just for the batch count.
        """
        return int(self._index[uid]["len"])

    # -- optional precomputed features ------------------------------------

    def _open_features(self, cfg: Config) -> None:
        n_lin = cfg.dataset.n_linear
        n_mel = cfg.dataset.n_mels
        self._mel = np.memmap(self.dir / _MEL, dtype=np.float16, mode="r").reshape(
            -1, n_mel
        )
        self._linear = np.memmap(
            self.dir / _LINEAR, dtype=np.float16, mode="r"
        ).reshape(-1, n_lin)

    def has_features(self) -> bool:
        return self._features is not None and (self.dir / _MEL).exists()

    def get_features(self, uid: str, cfg: Config) -> Tuple[np.ndarray, np.ndarray]:
        """(linear, mel) normalized spectrograms, float16, (n_frames, bins)."""
        if not self.has_features():
            raise KeyError("cache has no precomputed features; run precompute")
        if self._mel is None:
            self._open_features(cfg)
        e = self._features[uid]
        sl = slice(e["off"], e["off"] + e["len"])
        return np.asarray(self._linear[sl]), np.asarray(self._mel[sl])


def precompute_features(
    cache: AudioCache,
    utts: Sequence[Utterance],
    cfg: Config,
    batch_frames: int = 4096,
    progress_every: int = 1000,
) -> None:
    """Device-batched featurization of cached audio -> mel.bin / linear.bin.

    Runs the exact `wav_to_features` the train step runs (one STFT feeding
    both branches), batched by concatenating utterances into fixed
    `batch_frames`-frame segments so the program compiles once.  Features are
    stored per-utterance (frames computed utterance-at-a-time to keep frame
    boundaries exact, but chunks are padded to one static shape).
    """
    import jax
    import jax.numpy as jnp

    from sstts.dsp.ops import wav_to_features

    ds = cfg.dataset
    hop = ds.hop_len
    seg_samples = (batch_frames - 1) * hop

    @jax.jit
    def featurize(pcm):
        y = pcm.astype(jnp.float32) / 32767.0
        return wav_to_features(y, ds)

    index: Dict[str, Dict[str, int]] = {}
    off = 0
    with open(cache.dir / _MEL, "wb") as fm, open(cache.dir / _LINEAR, "wb") as fl:
        for i, u in enumerate(utts):
            pcm = cache.get_pcm(u.uid)
            n_frames = min(1 + len(pcm) // hop, batch_frames)
            buf = np.zeros((seg_samples,), dtype=np.int16)
            buf[: min(len(pcm), seg_samples)] = pcm[:seg_samples]
            linear, mel = featurize(buf)
            linear = np.asarray(linear[:n_frames], dtype=np.float16)
            mel = np.asarray(mel[:n_frames], dtype=np.float16)
            fm.write(mel.tobytes())
            fl.write(linear.tobytes())
            index[u.uid] = {"off": off, "len": int(n_frames)}
            off += int(n_frames)
            if progress_every and (i + 1) % progress_every == 0:
                print(f"[cache] features {i + 1}/{len(utts)}", flush=True)
    meta = json.loads((cache.dir / _INDEX).read_text())
    meta["features"] = index
    (cache.dir / _INDEX).write_text(json.dumps(meta))
    cache._features = index
    cache._mel = cache._linear = None


def open_cache(cfg: Config) -> Optional[AudioCache]:
    """Open the configured cache if `dataset.cache_dir` is set and built."""
    d = cfg.dataset.cache_dir
    if d and AudioCache.exists(d):
        return AudioCache(d, cfg)
    return None
