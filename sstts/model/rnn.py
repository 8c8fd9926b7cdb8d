"""Scan-friendly GRU cells and bidirectional wrappers.

The reference used TF-1's `GRUCell` inside `tf.contrib.seq2seq` dynamic
decoding (SURVEY.md §2.2).  On TPU, small sequential matmuls underutilize the
MXU (SURVEY.md §7 "hard parts"), so this cell fuses all three gates into one
(in -> 3H) input matmul and one (H -> 3H) recurrent matmul per step, batch-major
layout, f32 accumulation.  The candidate uses the `r * (h @ U_n)` ("v3"/CuDNN)
formulation so the recurrent contribution is a single fused matmul; output
quality is equivalent to the classic `(r * h) @ U_n` form and the framework is
self-consistent.

Padded batches: scans are mask-gated — the carry freezes on padded steps, so
a padded batch produces exactly the same per-example outputs as batch=1
(SURVEY.md §4 "shape/mask unit tests").  This matters for the backward
direction of `BiGRU`, which reaches the padding *first*.

Full-sequence GRUs dispatch between two backends sharing one parameter set
and one step function (`sstts.ops.pallas_gru.gru_step_math`):

* "xla"    — `lax.scan` (correctness oracle; the only choice under a
             GSPMD-partitioned mesh, which cannot shard opaque custom calls),
* "pallas" — the fused single-kernel sequence GRU (weights resident in VMEM,
             carry in scratch, time as the pipelined grid), differentiable
             via an XLA-rematerialized backward (`gru_sequence_ad`).
             Measured on v5e (scripts/profile_gru.py, same-window A/B):
             2.2x the scan at the post-CBHG shape (B=32, T=800, H=128),
             parity at encoder length,
* "auto"   — (default) "pallas" on the TPU backend, "xla" elsewhere.

Select via `SSTTS_GRU_BACKEND`, `sstts.model.rnn.GRU_BACKEND`, or the
per-module `backend` attribute (used by mesh-aware callers to pin "xla"
under GSPMD partitioning).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sstts.ops.pallas_gru import (
    gru_sequence_ad,
    gru_sequence_xla,
    gru_step_math,
)

#: "auto" | "xla" | "pallas".  Overridable by the SSTTS_GRU_BACKEND env var.
GRU_BACKEND = os.environ.get("SSTTS_GRU_BACKEND", "auto")


def resolve_gru_backend(override: Optional[str] = None) -> str:
    """Resolve a backend choice ("auto"/None defers to the global, then to
    the platform: pallas on TPU, xla elsewhere)."""
    backend = override or GRU_BACKEND
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown GRU backend: {backend!r}")
    return backend


def _gru_params(module: nn.Module, d_in: int, features: int):
    wx = module.param(
        "wx", nn.initializers.lecun_normal(), (d_in, 3 * features)
    )
    wh = module.param(
        "wh", nn.initializers.orthogonal(), (features, 3 * features)
    )
    b = module.param("b", nn.initializers.zeros, (3 * features,))
    return wx, wh, b


class GRUCell(nn.Module):
    """Fused-gate GRU step.

    carry (B, H), inputs = (x: (B, D), step_mask: (B,) or None)
    -> (new_carry, output).  Where step_mask is 0 the carry passes through
    unchanged and the output is zero.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,
        inputs: Tuple[jnp.ndarray, Optional[jnp.ndarray]],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x, step_mask = inputs
        wx, wh, b = _gru_params(self, x.shape[-1], self.features)
        new_h = gru_step_math(x, h, wx, wh, b).astype(self.dtype)
        if step_mask is not None:
            m = step_mask[:, None].astype(new_h.dtype)
            new_h = m * new_h + (1.0 - m) * h
            out = m * new_h
        else:
            out = new_h
        return new_h, out

    @staticmethod
    def init_carry(batch: int, features: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, features), dtype)


class UnidirectionalGRU(nn.Module):
    """GRU over a full sequence: (B, T, D), optional (B, T) mask -> (B, T, H).

    `reverse=True` scans right-to-left with outputs aligned to the original
    order; with a mask, the carry freezes on padded steps so padding never
    contaminates valid outputs in either direction.
    """

    features: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32
    #: None = defer to the global GRU_BACKEND / platform auto-detection.
    backend: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        wx, wh, b = _gru_params(self, xs.shape[-1], self.features)
        if resolve_gru_backend(self.backend) == "pallas":
            ys = gru_sequence_ad(xs, wx, wh, b, mask, self.reverse)
        else:
            ys = gru_sequence_xla(xs, wx, wh, b, mask, reverse=self.reverse)
        return ys.astype(self.dtype)


class BiGRU(nn.Module):
    """Bidirectional GRU: concat(forward, backward) -> (B, T, 2H)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    backend: Optional[str] = None

    @nn.compact
    def __call__(
        self, xs: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if mask is not None:
            xs = xs * mask[..., None].astype(xs.dtype)
        fwd = UnidirectionalGRU(
            self.features, dtype=self.dtype, backend=self.backend,
            name="forward",
        )(xs, mask)
        bwd = UnidirectionalGRU(
            self.features, reverse=True, dtype=self.dtype,
            backend=self.backend, name="backward",
        )(xs, mask)
        return jnp.concatenate([fwd, bwd], axis=-1)
