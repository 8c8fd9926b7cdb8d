"""Golden numpy (float64) DSP oracle.

The reference implements its audio front-end with librosa on the host
(`audio/features.py`, `audio/conversion.py`, `audio/synthesis.py` — SURVEY.md
§2.1).  librosa is not installed in this image, so this module re-implements
librosa's documented semantics in pure numpy at float64 precision:

* centered STFT with reflect padding and a periodic Hann window,
* inverse STFT with windowed overlap-add and window-sum normalization,
* Slaney-style mel filterbank (librosa default: ``htk=False, norm="slaney"``),
* Griffin-Lim phase reconstruction.

Everything here is the *oracle* for the on-device JAX implementations in
`sstts.dsp.stft` / `sstts.dsp.ops` / `sstts.dsp.griffin_lim`; the golden tests
in `tests/test_dsp.py` assert agreement.  This module is host-only and must
never appear on the jit compute path.
"""

from __future__ import annotations

import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic ("fftbins") Hann window, as used by librosa/scipy for STFT."""
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def pad_center(window: np.ndarray, size: int) -> np.ndarray:
    """Center-pad a window to `size` (librosa.util.pad_center)."""
    lpad = (size - len(window)) // 2
    rpad = size - len(window) - lpad
    return np.pad(window, (lpad, rpad))


def frame_count(n_samples: int, hop_length: int) -> int:
    """Number of STFT frames for a centered transform."""
    return 1 + n_samples // hop_length


def stft(
    y: np.ndarray, n_fft: int, hop_length: int, win_length: int
) -> np.ndarray:
    """Centered STFT -> complex (n_frames, n_fft // 2 + 1).

    librosa semantics: reflect-pad by n_fft//2, periodic Hann window of
    `win_length` center-padded to `n_fft`, rFFT per frame.
    """
    y = np.asarray(y, dtype=np.float64)
    window = pad_center(hann_window(win_length), n_fft)
    n_frames = frame_count(len(y), hop_length)
    y = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    frames = np.stack(
        [y[i * hop_length : i * hop_length + n_fft] for i in range(n_frames)]
    )
    return np.fft.rfft(frames * window[None, :], n=n_fft, axis=-1)


def istft(
    spec: np.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: int,
) -> np.ndarray:
    """Inverse STFT via windowed overlap-add with window-sum normalization.

    `spec` is complex (n_frames, n_fft // 2 + 1); returns `length` samples
    (the n_fft//2 center padding is trimmed, matching librosa.istft).
    """
    spec = np.asarray(spec)
    window = pad_center(hann_window(win_length), n_fft)
    frames = np.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]
    n_frames = frames.shape[0]
    total = (n_frames - 1) * hop_length + n_fft
    out = np.zeros(total, dtype=np.float64)
    wss = np.zeros(total, dtype=np.float64)
    w2 = window * window
    for i in range(n_frames):
        out[i * hop_length : i * hop_length + n_fft] += frames[i]
        wss[i * hop_length : i * hop_length + n_fft] += w2
    out = np.where(wss > 1e-10, out / np.maximum(wss, 1e-10), out)
    start = n_fft // 2
    return out[start : start + length]


def hz_to_mel(frequencies: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    frequencies = np.asarray(frequencies, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3.0
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = frequencies >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel
        + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3.0
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank (n_mels, n_fft//2 + 1)."""
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney-style normalization: each filter integrates to ~2 / bandwidth.
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    return weights * enorm[:, None]


def preemphasis(y: np.ndarray, coeff: float) -> np.ndarray:
    """y'[t] = y[t] - coeff * y[t-1]; y'[0] = y[0]."""
    y = np.asarray(y, dtype=np.float64)
    return np.concatenate([y[:1], y[1:] - coeff * y[:-1]])


def deemphasis(y: np.ndarray, coeff: float) -> np.ndarray:
    """Inverse of `preemphasis` (IIR: x[t] = y[t] + coeff * x[t-1])."""
    out = np.zeros_like(np.asarray(y, dtype=np.float64))
    acc = 0.0
    for t in range(len(y)):
        acc = y[t] + coeff * acc
        out[t] = acc
    return out


def magnitude_to_decibel(x: np.ndarray) -> np.ndarray:
    """20 * log10(max(1e-5, x)) — the reference's `audio/conversion.py` form."""
    return 20.0 * np.log10(np.maximum(1e-5, x))


def decibel_to_magnitude(db: np.ndarray) -> np.ndarray:
    return np.power(10.0, db / 20.0)


def normalize_decibel(db: np.ndarray, ref_db: float, min_db: float) -> np.ndarray:
    """Map dB to [0, 1]: clip(((db - ref) - min) / (-min), 0, 1)."""
    return np.clip((db - ref_db - min_db) / (-min_db), 0.0, 1.0)


def inv_normalize_decibel(
    s: np.ndarray, ref_db: float, min_db: float
) -> np.ndarray:
    return np.clip(s, 0.0, 1.0) * (-min_db) + min_db + ref_db


def linear_scale_spectrogram(
    y: np.ndarray, n_fft: int, hop_length: int, win_length: int
) -> np.ndarray:
    """|STFT| magnitude (n_frames, n_fft//2+1)."""
    return np.abs(stft(y, n_fft, hop_length, win_length))


def mel_scale_spectrogram(
    y: np.ndarray,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_mels: int,
    fmin: float,
    fmax: float,
) -> np.ndarray:
    """Mel magnitude spectrogram (n_frames, n_mels)."""
    mag = linear_scale_spectrogram(y, n_fft, hop_length, win_length)
    fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    return mag @ fb.T


def griffin_lim(
    magnitude: np.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iters: int,
    length: int,
) -> np.ndarray:
    """Iterative phase reconstruction (zero-phase init, deterministic).

    `magnitude` is (n_frames, n_fft//2+1); returns `length` samples.
    """
    angles = np.ones_like(magnitude, dtype=np.complex128)
    y = istft(magnitude * angles, n_fft, hop_length, win_length, length)
    for _ in range(n_iters):
        s = stft(y, n_fft, hop_length, win_length)
        angles = np.exp(1j * np.angle(s))
        y = istft(magnitude * angles, n_fft, hop_length, win_length, length)
    return y


def trim_silence(
    y: np.ndarray, top_db: float, frame_length: int = 2048, hop_length: int = 512
) -> np.ndarray:
    """Trim leading/trailing frames quieter than `top_db` below peak RMS."""
    y = np.asarray(y, dtype=np.float64)
    if len(y) == 0:
        return y
    n_frames = max(1, 1 + (len(y) - frame_length) // hop_length)
    rms = np.array(
        [
            np.sqrt(np.mean(y[i * hop_length : i * hop_length + frame_length] ** 2))
            for i in range(n_frames)
        ]
    )
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(np.max(rms), 1e-10))
    keep = np.where(db > -top_db)[0]
    if len(keep) == 0:
        return y[:0]
    start = keep[0] * hop_length
    end = min(len(y), keep[-1] * hop_length + frame_length)
    return y[start:end]
