"""TPU-native audio DSP (SURVEY.md layer R0).

On-device, batched, jit-able counterparts of the reference's host-side librosa
front-end, organized as submodules:

* `sstts.dsp.stft`        — batched STFT/iSTFT (static reshape framing/OLA)
* `sstts.dsp.mel`         — Slaney mel filterbank as a device matmul
* `sstts.dsp.ops`         — pre-emphasis, dB conversions, feature pipeline
* `sstts.dsp.griffin_lim` — on-device Griffin-Lim vocoder
* `sstts.dsp.reference`   — float64 numpy golden oracle (host-only)

Note: the submodules `stft` / `griffin_lim` contain same-named functions, so
they are deliberately NOT re-exported here — import them from their modules.
"""

from sstts.dsp.griffin_lim import spectrogram_to_wav
from sstts.dsp.mel import apply_mel, mel_filterbank
from sstts.dsp.ops import (
    decibel_to_magnitude,
    deemphasis,
    inv_normalize_decibel,
    linear_scale_spectrogram,
    magnitude_to_decibel,
    mel_scale_spectrogram,
    normalize_decibel,
    preemphasis,
    wav_to_features,
)
from sstts.dsp.stft import num_frames

__all__ = [
    "apply_mel",
    "decibel_to_magnitude",
    "deemphasis",
    "inv_normalize_decibel",
    "linear_scale_spectrogram",
    "magnitude_to_decibel",
    "mel_filterbank",
    "mel_scale_spectrogram",
    "normalize_decibel",
    "num_frames",
    "preemphasis",
    "spectrogram_to_wav",
    "wav_to_features",
]
