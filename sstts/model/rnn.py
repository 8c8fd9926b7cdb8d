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

A Pallas-fused variant of the step lives in `sstts.ops.pallas_gru`; this XLA
path is the correctness oracle and fallback.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


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
        H = self.features
        # One fused input projection and one fused recurrent projection.
        gx = nn.Dense(3 * H, dtype=self.dtype, name="input_proj")(x)
        gh = nn.Dense(3 * H, use_bias=False, dtype=self.dtype, name="recurrent_proj")(h)
        xr, xz, xn = jnp.split(gx, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        new_h = z * h + (1.0 - z) * n
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
    """GRU over a full sequence via `lax.scan`.

    Input (B, T, D), optional mask (B, T) -> output (B, T, H).
    `reverse=True` scans right-to-left and returns outputs aligned to the
    original order; with a mask, the carry freezes on padded steps so padding
    never contaminates valid outputs in either direction.
    """

    features: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        h0: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        batch = xs.shape[0]
        if h0 is None:
            h0 = GRUCell.init_carry(batch, self.features, self.dtype)
        scan = nn.scan(
            GRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            reverse=self.reverse,
        )
        _, ys = scan(self.features, dtype=self.dtype, name="cell")(h0, (xs, mask))
        return ys


class BiGRU(nn.Module):
    """Bidirectional GRU: concat(forward, backward) -> (B, T, 2H)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xs: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if mask is not None:
            xs = xs * mask[..., None].astype(xs.dtype)
        fwd = UnidirectionalGRU(self.features, dtype=self.dtype, name="forward")(
            xs, mask
        )
        bwd = UnidirectionalGRU(
            self.features, reverse=True, dtype=self.dtype, name="backward"
        )(xs, mask)
        return jnp.concatenate([fwd, bwd], axis=-1)
