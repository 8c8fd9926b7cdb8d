"""TPU kernels and native components (SURVEY.md §2.6).

* `pallas_gru`     — fused full-sequence GRU kernel (+ lax.scan oracle,
                     differentiable `gru_sequence_ad` wrapper)
* `pallas_decoder` — the whole autoregressive decoder scan as one kernel
* `native/`        — C++ data-path (WAV decode, silence trim) via ctypes
"""

from sstts.ops.pallas_gru import (
    gru_sequence,
    gru_sequence_ad,
    gru_sequence_xla,
    gru_step_math,
)

__all__ = [
    "gru_sequence",
    "gru_sequence_ad",
    "gru_sequence_xla",
    "gru_step_math",
]
