"""Mel filterbank as a device constant.

The reference builds its mel filterbank inside librosa (C BLAS under the hood —
SURVEY.md §2.6).  Here the Slaney-style filterbank is constructed once on host
(float64, `sstts.dsp.reference.mel_filterbank`) and applied on device as a
single (bins -> n_mels) matmul, which XLA fuses with the surrounding dB ops and
maps onto the MXU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from sstts.config import DatasetConfig
from sstts.dsp import reference as ref


@functools.lru_cache(maxsize=None)
def _filterbank_np(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    return ref.mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax).astype(
        np.float32
    )


def mel_filterbank(cfg: DatasetConfig) -> jnp.ndarray:
    """(n_mels, n_fft//2+1) float32 filterbank for `cfg`."""
    return jnp.asarray(
        _filterbank_np(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.mel_fmin, cfg.mel_fmax)
    )


def apply_mel(magnitude: jnp.ndarray, cfg: DatasetConfig) -> jnp.ndarray:
    """(..., frames, bins) linear magnitude -> (..., frames, n_mels)."""
    fb = mel_filterbank(cfg)
    return jnp.matmul(magnitude, fb.T, preferred_element_type=jnp.float32)
