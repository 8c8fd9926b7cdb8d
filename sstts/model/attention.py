"""Attention mechanisms for the decoder.

The reference used `tf.contrib.seq2seq.BahdanauAttention`, plus a thesis-local
windowed Luong variant (SURVEY.md §2.2 — unverified against the empty mount,
implemented here behind a config switch).  Both are designed for use *inside*
a `lax.scan` step: memory keys are projected once per utterance (outside the
scan) and each step is a fused (B, T) score + masked softmax + (B, T) @
(B, T, D) context matmul — MXU-friendly, static shapes, no host control flow.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    scores = scores.astype(jnp.float32)  # f32 softmax under bf16 compute
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)
    return jax.nn.softmax(scores, axis=-1)


class BahdanauAttention(nn.Module):
    """Additive content-based attention (arXiv 1409.0473 as used in Tacotron).

    `init_keys(memory)` projects the encoder memory once; `__call__` scores a
    (B, Dq) query against the keys: v . tanh(keys + W_q q + b).
    """

    units: int
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.memory_proj = nn.Dense(self.units, use_bias=False, dtype=self.dtype)
        self.query_proj = nn.Dense(self.units, use_bias=False, dtype=self.dtype)
        self.score_bias = self.param("b", nn.initializers.zeros, (self.units,))
        self.v = self.param(
            "v",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0, maxval=1.0
            ) / jnp.sqrt(jnp.asarray(shape[0], jnp.float32)),
            (self.units,),
        )

    def init_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        """(B, T, Dm) -> (B, T, A); call once per utterance, outside the scan."""
        return self.memory_proj(memory)

    def __call__(
        self,
        query: jnp.ndarray,
        keys: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        prev_alignment: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        del prev_alignment  # content-based: history-free
        q = self.query_proj(query)[:, None, :]
        # Params stay f32 in the tree (checkpoint stability); cast at use so
        # bf16 compute doesn't silently promote the (B, T, A) tanh chain and
        # score einsum to f32 inside the scan (masked_softmax upcasts the
        # (B, T) scores itself — that one is a numerics requirement).
        s = jnp.tanh(keys + q + self.score_bias.astype(self.dtype))
        scores = jnp.einsum("bta,a->bt", s, self.v.astype(self.dtype))
        return masked_softmax(scores, mask)


class LocalLuongAttention(nn.Module):
    """Windowed multiplicative attention (the thesis's local variant).

    Scores are `q . W m` restricted to a window of half-width `window` around
    the previous alignment's expected position — computed with broadcasted
    iota, so the window is data-dependent but the shapes stay static.
    """

    units: int
    window: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.memory_proj = nn.Dense(self.units, use_bias=False, dtype=self.dtype)
        self.query_proj = nn.Dense(self.units, use_bias=False, dtype=self.dtype)

    def init_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.memory_proj(memory)

    def __call__(
        self,
        query: jnp.ndarray,
        keys: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        prev_alignment: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        q = self.query_proj(query)
        scores = jnp.einsum("ba,bta->bt", q, keys) / jnp.sqrt(
            jnp.asarray(self.units, jnp.float32)
        )
        if prev_alignment is not None:
            t_len = keys.shape[1]
            positions = jax.lax.broadcasted_iota(jnp.float32, (1, t_len), 1)
            center = jnp.sum(prev_alignment * positions, axis=-1, keepdims=True)
            in_window = jnp.abs(positions - center) <= float(self.window)
            mask = in_window if mask is None else jnp.logical_and(mask, in_window)
        return masked_softmax(scores, mask)


def attention_context(
    alignment: jnp.ndarray, memory: jnp.ndarray
) -> jnp.ndarray:
    """(B, T) alignment x (B, T, D) memory -> (B, D) context."""
    return jnp.einsum("bt,btd->bd", alignment, memory)


def make_attention(
    kind: str, units: int, dtype=jnp.float32, window: int = 16
) -> nn.Module:
    if kind == "bahdanau":
        return BahdanauAttention(units, dtype=dtype, name="attention")
    if kind == "local_luong":
        return LocalLuongAttention(
            units, window=window, dtype=dtype, name="attention"
        )
    raise ValueError(f"unknown attention type: {kind}")
