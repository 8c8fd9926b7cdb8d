"""sstts — TPU-native single-speaker TTS (JAX / XLA / Pallas / pjit).

A brand-new framework with the capabilities of `yweweler/single-speaker-tts`
(see SURVEY.md): CBHG encoder + Bahdanau-attention GRU decoder as jitted
`lax.scan` programs, on-device STFT/mel front-end and Griffin-Lim vocoder,
fixed-shape autoregressive synthesis, and data-parallel training over a
`jax.sharding.Mesh`.
"""

from sstts.config import (
    ArchitectureConfig,
    Config,
    DatasetConfig,
    EvaluationConfig,
    InferenceConfig,
    TrainingConfig,
    tiny_config,
)

__version__ = "0.1.0"

__all__ = [
    "ArchitectureConfig",
    "Config",
    "DatasetConfig",
    "EvaluationConfig",
    "InferenceConfig",
    "TrainingConfig",
    "tiny_config",
    "Synthesizer",
]

# Only names that do NOT collide with submodules (sstts.train etc. must
# keep resolving to their modules).
_LAZY = {
    "Synthesizer": ("sstts.synthesize", "Synthesizer"),
}


def __getattr__(name: str):
    """Lazy top-level entry points (importing sstts stays jax-import-free)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'sstts' has no attribute {name!r}")
