"""On-device Griffin-Lim phase reconstruction.

The reference runs Griffin-Lim on host as a sequential librosa loop
(`audio/synthesis.py:spectrogram_to_wav` — SURVEY.md §3.5).  Here the entire
loop lives inside the compiled program as a `lax.fori_loop` whose body is a
batched iSTFT -> STFT phase projection (`jnp.fft` + static reshape OLA from
`sstts.dsp.stft`), so a whole batch of utterances reconstructs in one XLA
program with zero host round-trips.  The RTF target (BASELINE.md) includes
this loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sstts.config import Config
from sstts.dsp import ops
import sstts.dsp.stft as stft_mod


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iters: int,
    length: int,
) -> jnp.ndarray:
    """(..., n_frames, bins) magnitude -> (..., length) waveform.

    Deterministic zero-phase init, matching `reference.griffin_lim`.
    """
    magnitude = magnitude.astype(jnp.float32)
    n_frames = magnitude.shape[-2]
    if 1 + length // hop_length < n_frames:
        raise ValueError(
            f"length={length} too short for {n_frames} frames at hop={hop_length}"
        )

    def project(mag_angles):
        mag, angles = mag_angles
        y = stft_mod.istft(mag * angles, n_fft, hop_length, win_length, length)
        return y

    def body(_, carry):
        angles, _y = carry
        y = project((magnitude, angles))
        s = stft_mod.stft(y, n_fft, hop_length, win_length)
        # exp(i * angle(s)) without trig: s / |s|.
        denom = jnp.maximum(jnp.abs(s), 1e-16)
        angles = (s / denom)[..., : magnitude.shape[-2], :]
        return angles, y

    angles0 = jnp.ones_like(magnitude, dtype=jnp.complex64)
    y0 = project((magnitude, angles0))
    angles, _ = jax.lax.fori_loop(0, n_iters, body, (angles0, y0))
    return project((magnitude, angles))


def spectrogram_to_wav(
    linear_norm: jnp.ndarray, cfg: Config, length: int
) -> jnp.ndarray:
    """Normalized linear spectrogram -> waveform (reference `synthesis.py` API).

    De-normalize dB -> magnitude, raise to the Griffin-Lim power, reconstruct
    phase, de-emphasize.  Fully on device.
    """
    ds, inf = cfg.dataset, cfg.inference
    db = ops.inv_normalize_decibel(linear_norm, ds.ref_level_db, ds.min_level_db)
    mag = ops.decibel_to_magnitude(db) ** inf.griffin_lim_power
    y = griffin_lim(
        mag, ds.n_fft, ds.hop_len, ds.win_len, inf.griffin_lim_iters, length
    )
    return ops.deemphasis(y, ds.preemphasis)
