"""On-device batched STFT / iSTFT for TPU.

The reference computes STFT/iSTFT on host with librosa (`audio/features.py`,
`audio/synthesis.py` — SURVEY.md §2.1).  Here both transforms run on device as
batched `jnp.fft.rfft/irfft` with framing and overlap-add expressed as
*static phase-decomposition reshapes* instead of gathers/scatter-adds:

With hop `h` and frame length `n`, frames `i` and `i + P` never overlap when
`P = ceil(n / h)`.  So the frame list splits into `P` interleaved streams of
non-overlapping frames; each stream is a plain `reshape` of a slice of the
(zero-padded) signal, and overlap-add is the sum of `P` reshaped streams.
Everything is static-shaped, which keeps the 60-iteration Griffin-Lim loop
(`sstts.dsp.griffin_lim`) a pure sequence of FFTs + copies on the TPU — no
scatter ops, no dynamic shapes, jit/vmap/pjit friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sstts.dsp import fft as mmfft
from sstts.dsp import reference as ref

#: Use the MXU matmul FFT (sstts.dsp.fft) instead of XLA's FFT lowering.
#: Measured on v5e (B=32 x 800 frames x 60 GL iters): jnp.fft 2.41s vs
#: matmul 4.85s at HIGHEST precision — XLA's FFT wins at f32 accuracy, so it
#: stays the default; the matmul path remains available for experimentation
#: (it is f32-exact and golden-tested).
USE_MATMUL_FFT = False


def _rfft(x: jnp.ndarray, n: int, impl: str = "default") -> jnp.ndarray:
    if impl == "default":
        impl = "ct_matmul" if USE_MATMUL_FFT else "xla"
    if impl == "xla" or not mmfft.supported(n):
        return jnp.fft.rfft(x, n=n, axis=-1)
    if impl == "ct_matmul":
        return mmfft.rfft(x, n)
    if impl.startswith("dft"):
        prec = {"dft_high": jax.lax.Precision.HIGH,
                "dft_highest": jax.lax.Precision.HIGHEST,
                "dft_default": jax.lax.Precision.DEFAULT}[impl]
        return mmfft.rdft(x, n, precision=prec)
    raise ValueError(f"unknown fft impl: {impl}")


def _irfft(spec: jnp.ndarray, n: int, impl: str = "default") -> jnp.ndarray:
    if impl == "default":
        impl = "ct_matmul" if USE_MATMUL_FFT else "xla"
    if impl == "xla" or not mmfft.supported(n):
        return jnp.fft.irfft(spec, n=n, axis=-1)
    if impl == "ct_matmul":
        return mmfft.irfft(spec, n)
    if impl.startswith("dft"):
        prec = {"dft_high": jax.lax.Precision.HIGH,
                "dft_highest": jax.lax.Precision.HIGHEST,
                "dft_default": jax.lax.Precision.DEFAULT}[impl]
        return mmfft.irdft(spec, n, precision=prec)
    raise ValueError(f"unknown fft impl: {impl}")


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=None)
def _window(n_fft: int, win_length: int) -> np.ndarray:
    """Periodic Hann window center-padded to n_fft (float32 host constant)."""
    return ref.pad_center(ref.hann_window(win_length), n_fft).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _window_sum_sq(
    n_fft: int, hop_length: int, win_length: int, n_frames: int
) -> np.ndarray:
    """Overlap-added squared-window envelope for iSTFT normalization.

    Depends only on static shapes, so it is computed on host at trace time and
    baked into the compiled program as a constant.
    """
    w2 = _window(n_fft, win_length).astype(np.float64) ** 2
    total = (n_frames - 1) * hop_length + n_fft
    wss = np.zeros(total, dtype=np.float64)
    for i in range(n_frames):
        wss[i * hop_length : i * hop_length + n_fft] += w2
    inv = np.where(wss > 1e-10, 1.0 / np.maximum(wss, 1e-10), 1.0)
    return inv.astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """(..., n_samples) already-padded signal -> (..., n_frames, n_fft) frames.

    Frame i covers samples [i*hop, i*hop + n_fft); n_frames is the maximum
    count that fits.  Implemented as P interleaved reshape streams (see module
    docstring) — no gather.
    """
    n_samples = y.shape[-1]
    n_frames = (n_samples - n_fft) // hop_length + 1
    p_phases = _cdiv(n_fft, hop_length)
    slot = p_phases * hop_length
    n_j = _cdiv(n_frames, p_phases)
    # Zero-pad so every phase stream has exactly n_j complete slots.
    need = (p_phases - 1) * hop_length + n_j * slot
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, max(0, need - n_samples))])
    batch = y.shape[:-1]
    streams = []
    for p in range(p_phases):
        seg = y[..., p * hop_length : p * hop_length + n_j * slot]
        seg = seg.reshape(*batch, n_j, slot)[..., :n_fft]
        streams.append(seg)
    # frames[..., j, p, :] is frame index j * P + p.
    frames = jnp.stack(streams, axis=-2)
    frames = frames.reshape(*batch, n_j * p_phases, n_fft)
    return frames[..., :n_frames, :]


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """(..., n_frames, n_fft) -> (..., (n_frames-1)*hop + n_fft) via OLA.

    Inverse of `frame_signal`: P non-overlapping reshape streams, shifted and
    summed.  No scatter-add.
    """
    *batch, n_frames, n_fft = frames.shape
    p_phases = _cdiv(n_fft, hop_length)
    slot = p_phases * hop_length
    n_j = _cdiv(n_frames, p_phases)
    pad_frames = n_j * p_phases - n_frames
    frames = jnp.pad(
        frames, [(0, 0)] * (len(batch)) + [(0, pad_frames), (0, 0)]
    )
    frames = frames.reshape(*batch, n_j, p_phases, n_fft)
    total = (p_phases - 1) * hop_length + n_j * slot
    out = jnp.zeros((*batch, total), dtype=frames.dtype)
    for p in range(p_phases):
        stream = frames[..., :, p, :]  # (..., n_j, n_fft)
        stream = jnp.pad(
            stream, [(0, 0)] * (len(batch) + 1) + [(0, slot - n_fft)]
        )
        stream = stream.reshape(*batch, n_j * slot)
        shift = p * hop_length
        stream = jnp.pad(
            stream,
            [(0, 0)] * len(batch) + [(shift, total - shift - n_j * slot)],
        )
        out = out + stream
    return out[..., : (n_frames - 1) * hop_length + n_fft]


def stft(
    y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
    fft_impl: str = "default",
) -> jnp.ndarray:
    """Centered batched STFT: (..., n_samples) -> complex (..., n_frames, bins).

    Matches `sstts.dsp.reference.stft` (librosa semantics: reflect padding by
    n_fft//2, periodic Hann of win_length center-padded to n_fft).
    """
    pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    y = jnp.pad(y, pad, mode="reflect")
    frames = frame_signal(y, n_fft, hop_length)
    window = jnp.asarray(_window(n_fft, win_length))
    return _rfft(frames * window, n_fft, fft_impl)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: int,
    fft_impl: str = "default",
) -> jnp.ndarray:
    """Inverse STFT: complex (..., n_frames, bins) -> (..., length) samples.

    Matches `sstts.dsp.reference.istft` (windowed OLA + window-sum
    normalization, center trim).
    """
    n_frames = spec.shape[-2]
    window = jnp.asarray(_window(n_fft, win_length))
    frames = _irfft(spec, n_fft, fft_impl) * window
    y = overlap_add(frames, hop_length)
    inv_wss = jnp.asarray(_window_sum_sq(n_fft, hop_length, win_length, n_frames))
    y = y * inv_wss
    start = n_fft // 2
    return y[..., start : start + length]


def num_frames(n_samples: int, hop_length: int) -> int:
    """Frame count of a centered STFT over n_samples (matches the oracle)."""
    return 1 + n_samples // hop_length
