"""ctypes bindings for the native C++ WAV decode / trim path.

Builds `sstts/ops/native/wavio.cpp` with g++ on first use (cached under
`~/.cache/sstts`), falls back transparently to the pure-numpy codec
(`sstts.data.wav`) when no toolchain is available.  The numpy implementation
is the correctness oracle (tests/test_native.py)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "ops" / "native" / "wavio.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    cache = Path(os.environ.get("SSTTS_CACHE", Path.home() / ".cache" / "sstts"))
    cache.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha1(_SRC.read_bytes()).hexdigest()[:12]
    so = cache / f"libsstts_wavio_{tag}.so"
    if not so.exists():
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            str(_SRC), "-o", str(so),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.sstts_decode_wav.restype = ctypes.c_int64
    lib.sstts_decode_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sstts_trim_silence.restype = None
    lib.sstts_trim_silence.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sstts_decode_batch.restype = None
    lib.sstts_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.sstts_adpcm_decode.restype = None
    lib.sstts_adpcm_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    return lib


def available() -> bool:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB is not None


def load_wav(path: str | Path, max_seconds: float = 60.0, sample_rate_hint: int = 48000) -> Tuple[np.ndarray, int]:
    """Native WAV decode -> (float32 mono, sample_rate); numpy fallback."""
    if not available():
        from sstts.data import wav as wav_mod

        return wav_mod.load_wav(path)
    max_len = int(max_seconds * sample_rate_hint)
    buf = np.empty(max_len, dtype=np.float32)
    sr = ctypes.c_int32(0)
    n = _LIB.sstts_decode_wav(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len, ctypes.byref(sr),
    )
    if n == -5:  # buffer too small: retry with a generous bound
        return load_wav(path, max_seconds * 4, sample_rate_hint)
    if n < 0:
        raise ValueError(f"{path}: native WAV decode failed (code {n})")
    return buf[:n].copy(), int(sr.value)


def trim_silence(
    y: np.ndarray, top_db: float, frame_length: int = 2048, hop_length: int = 512
) -> np.ndarray:
    if not available():
        from sstts.dsp import reference as ref

        return ref.trim_silence(y, top_db, frame_length, hop_length).astype(
            np.float32
        )
    y = np.ascontiguousarray(y, dtype=np.float32)
    start = ctypes.c_int64(0)
    end = ctypes.c_int64(0)
    _LIB.sstts_trim_silence(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y),
        ctypes.c_float(top_db), frame_length, hop_length,
        ctypes.byref(start), ctypes.byref(end),
    )
    return y[start.value : end.value]


def adpcm_decode_rows(rows: np.ndarray, bits: int) -> Optional[np.ndarray]:
    """Native decode of an ADPCM wire matrix -> (bsz, nb*256) float32.

    `rows` is the (bsz, W) uint8 wire produced by
    `sstts.dsp.ops.adpcm{4,3}_encode_wire` (bits = 4 or 3).  Returns None
    when the native library is unavailable — the caller falls back to the
    numpy decoder, which is also the bitwise-parity oracle
    (tests/test_native.py).  Runs in the serving fetch pool: ctypes
    releases the GIL, so decode overlaps the link like the numpy path.
    """
    if not available():
        return None
    rows = np.ascontiguousarray(np.atleast_2d(np.asarray(rows, np.uint8)))
    per_block = 256 * bits // 8 + 4
    nb = rows.shape[1] // per_block
    out = np.empty((rows.shape[0], nb * 256), np.float32)
    _LIB.sstts_adpcm_decode(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows.shape[0], rows.shape[1], bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        min(rows.shape[0], os.cpu_count() or 1),
    )
    return out


def decode_batch(
    paths: List[str], max_len: int, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel decode -> (audio (n, max_len) f32, lengths (n,), srs (n,)).

    lengths[i] < 0 signals a per-file decode error (caller decides policy).
    """
    if not available():
        from sstts.data import wav as wav_mod

        out = np.zeros((len(paths), max_len), np.float32)
        lengths = np.zeros(len(paths), np.int64)
        srs = np.zeros(len(paths), np.int32)
        for i, p in enumerate(paths):
            try:
                y, sr = wav_mod.load_wav(p)
                y = y[:max_len]
                out[i, : len(y)] = y
                lengths[i], srs[i] = len(y), sr
            except (ValueError, OSError):
                lengths[i] = -1
        return out, lengths, srs
    out = np.zeros((len(paths), max_len), np.float32)
    lengths = np.zeros(len(paths), np.int64)
    srs = np.zeros(len(paths), np.int32)
    arr = (ctypes.c_char_p * len(paths))(*[str(p).encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(len(paths), os.cpu_count() or 4)
    _LIB.sstts_decode_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads,
    )
    return out, lengths, srs
