"""Core network blocks: pre-net, highway, conv bank, CBHG.

Counterparts of the reference's `tacotron/layers.py` (SURVEY.md §2.2),
re-designed TPU-first:

* conv banks/projections are `nn.Conv` (lowered to MXU matmuls by XLA),
* batch norm is *masked*: statistics are computed over valid (non-padded)
  positions only, so padded batches produce the same activations as
  unpadded ones — the reference's plain BN silently mixed padding into its
  statistics,
* every block takes an optional (B, T) mask and re-masks its output so
  padding never leaks through convolution halos.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sstts.model.rnn import BiGRU


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (batch, time) with padding-aware statistics.

    Train mode computes mean/var over valid positions only and updates EMA
    running stats (collection "batch_stats"); eval mode uses the EMAs.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train:
            if mask is not None:
                m = mask[..., None].astype(jnp.float32)
                count = jnp.maximum(m.sum(), 1.0)
                mean = (x * m).sum(axis=(0, 1)) / count
                var = (((x - mean) ** 2) * m).sum(axis=(0, 1)) / count
            else:
                mean = x.mean(axis=(0, 1))
                var = x.var(axis=(0, 1))
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class PreNet(nn.Module):
    """FC-ReLU-dropout stack; dropout stays active at inference when
    `always_dropout` (Tacotron-1 behaviour, SURVEY.md §7 hard parts)."""

    units: Sequence[int]
    dropout: float = 0.5
    always_dropout: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        deterministic = (not train) and (not self.always_dropout)
        for i, width in enumerate(self.units):
            x = nn.Dense(width, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class Highway(nn.Module):
    """Single highway layer: T * H(x) + (1 - T) * x."""

    units: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.units, dtype=self.dtype, name="h")(x))
        t = nn.sigmoid(
            nn.Dense(
                self.units,
                dtype=self.dtype,
                bias_init=nn.initializers.constant(-1.0),
                name="t",
            )(x)
        )
        return h * t + x * (1.0 - t)


class Conv1dBank(nn.Module):
    """K parallel conv1d's of widths 1..K, each BN+ReLU, concatenated.

    (B, T, D) -> (B, T, K * channels).

    Two compute paths over ONE parameter set (per-width kernels
    ``conv{k}``: (k, D, C)), so the flag can be flipped on an existing
    checkpoint:

    * ``fused=True`` (the [NS] fused conv-bank — SURVEY.md §2.6):
      the K kernels are zero-padded to width K at their SAME-padding
      alignment and concatenated into one (K, D, K*C) kernel, so the whole
      bank runs as a single wide conv — one implicit MXU GEMM with a
      K*D-deep contraction (2048 for the encoder bank) instead of K narrow
      convs.  The zero taps waste ~2x FLOPs (K^2 vs K(K+1)/2 tap-pairs).
      Measured on v5e the waste slightly outweighs the fusion win at
      Tacotron shapes (see config.ArchitectureConfig.fused_conv_bank), so
      this is opt-in rather than the default.
    * ``fused=False`` (default): K separate convs; also the oracle.
    """

    bank_k: int
    channels: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        d = x.shape[-1]
        kernels = [
            self.param(
                f"conv{k}",
                nn.initializers.lecun_normal(),
                (k, d, self.channels),
                jnp.float32,
            )
            for k in range(1, self.bank_k + 1)
        ]
        dn = ("NWC", "WIO", "NWC")
        x = x.astype(self.dtype)
        if self.fused:
            K = self.bank_k
            left = (K - 1) // 2
            # Width-k kernel tap j lands at window offset left-(k-1)//2+j.
            wide = jnp.concatenate(
                [
                    jnp.pad(
                        w, ((left - (k - 1) // 2, K - k - (left - (k - 1) // 2)),
                            (0, 0), (0, 0))
                    )
                    for k, w in enumerate(kernels, start=1)
                ],
                axis=-1,
            )
            y = jax.lax.conv_general_dilated(
                x, wide.astype(self.dtype), (1,), [(left, K - 1 - left)],
                dimension_numbers=dn,
            )
            ys = [
                y[..., (k - 1) * self.channels : k * self.channels]
                for k in range(1, self.bank_k + 1)
            ]
        else:
            ys = [
                jax.lax.conv_general_dilated(
                    x, w.astype(self.dtype), (1,), [((k - 1) // 2, k // 2)],
                    dimension_numbers=dn,
                )
                for k, w in enumerate(kernels, start=1)
            ]
        outs = []
        for k, y in enumerate(ys, start=1):
            y = MaskedBatchNorm(dtype=self.dtype, name=f"bn{k}")(y, mask, train)
            outs.append(nn.relu(y))
        out = jnp.concatenate(outs, axis=-1)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out


class CBHG(nn.Module):
    """Conv Bank + Highway + bidirectional GRU (Tacotron's workhorse block).

    bank -> max-pool(2, stride 1) -> two 3-wide conv projections (+BN, first
    ReLU) -> residual -> highway stack -> BiGRU.  (B, T, D) -> (B, T, 2*gru).
    """

    bank_k: int
    bank_channels: int
    proj_channels: Tuple[int, int]
    highway_layers: int
    highway_units: int
    gru_units: int
    dtype: jnp.dtype = jnp.float32
    fused_bank: bool = True
    #: GRU backend override (None = global/platform auto; "xla" is pinned by
    #: mesh-aware callers under GSPMD partitioning — see sstts.model.rnn).
    gru_backend: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        residual = x
        y = Conv1dBank(
            self.bank_k, self.bank_channels, dtype=self.dtype,
            fused=self.fused_bank, name="bank",
        )(x, mask, train)
        # Max-pool width 2, stride 1, SAME: max(y[t], y[t+1]).
        right = jnp.pad(y[:, 1:], ((0, 0), (0, 1), (0, 0)), constant_values=-jnp.inf)
        y = jnp.maximum(y, right)
        if mask is not None:
            y = jnp.where(mask[..., None], y, 0.0)
        y = nn.Conv(
            self.proj_channels[0], (3,), padding="SAME", use_bias=False,
            dtype=self.dtype, name="proj1",
        )(y)
        y = MaskedBatchNorm(dtype=self.dtype, name="proj1_bn")(y, mask, train)
        y = nn.relu(y)
        if mask is not None:
            y = y * mask[..., None].astype(y.dtype)
        y = nn.Conv(
            self.proj_channels[1], (3,), padding="SAME", use_bias=False,
            dtype=self.dtype, name="proj2",
        )(y)
        y = MaskedBatchNorm(dtype=self.dtype, name="proj2_bn")(y, mask, train)
        if y.shape[-1] != residual.shape[-1]:
            raise ValueError(
                f"CBHG residual dim mismatch: proj2={y.shape[-1]} vs input={residual.shape[-1]}"
            )
        y = y + residual
        if y.shape[-1] != self.highway_units:
            y = nn.Dense(self.highway_units, dtype=self.dtype, name="highway_in")(y)
        for i in range(self.highway_layers):
            y = Highway(self.highway_units, dtype=self.dtype, name=f"highway{i}")(y)
        if mask is not None:
            y = y * mask[..., None].astype(y.dtype)
        return BiGRU(
            self.gru_units, dtype=self.dtype, backend=self.gru_backend,
            name="gru",
        )(y, mask)
