"""On-device scalar/spectral conversions and the feature pipeline.

TPU-native counterpart of the reference's `audio/conversion.py` +
`audio/features.py` (SURVEY.md §2.1): pre-emphasis, magnitude<->dB,
dB normalization, and the wav -> (linear, mel) feature extraction used both
offline (golden tests) and inline on device in the training input path
(SURVEY.md §3.4, BASELINE config 5).  All functions are pure, batched over
leading dims, and jit/vmap/pjit friendly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sstts.config import DatasetConfig
from sstts.dsp import mel as mel_mod
import sstts.dsp.stft as stft_mod


def preemphasis(y: jnp.ndarray, coeff: float) -> jnp.ndarray:
    """y'[t] = y[t] - coeff * y[t-1] (y'[0] = y[0]); batched over leading dims."""
    shifted = jnp.pad(y[..., :-1], [(0, 0)] * (y.ndim - 1) + [(1, 0)])
    return y - coeff * shifted


def deemphasis(y: jnp.ndarray, coeff: float, block: int = 256) -> jnp.ndarray:
    """Inverse IIR x[t] = y[t] + coeff * x[t-1], block-parallel and exact.

    TPU-native formulation of the first-order recurrence: split the signal
    into `block`-sample blocks; within a block the zero-state response is one
    (block x block) lower-triangular Toeplitz matmul (MXU, f32); the block
    boundary states follow s_b = coeff^block * s_{b-1} + e_b — a tiny
    associative scan over n_blocks elements.  One matmul + one short scan:
    compiles in milliseconds and runs at MXU speed, where a per-sample
    `lax.scan` is sequential death and a full-length `associative_scan` took
    50+ s of XLA compile at 220k samples.
    """
    if coeff == 0.0:
        # Keep the f32 output contract dtype-independent of the coefficient.
        return y.astype(jnp.float32)
    n = y.shape[-1]
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    x = jnp.pad(y.astype(jnp.float32), [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    batch = x.shape[:-1]
    x = x.reshape(*batch, n_blocks, block)
    # T[i, j] = coeff^(i-j) for i >= j: zero-state in-block response.
    i = np.arange(block)
    toeplitz = np.where(
        i[:, None] >= i[None, :],
        np.power(float(coeff), (i[:, None] - i[None, :]).astype(np.float64)),
        0.0,
    ).astype(np.float32)
    zs = jnp.einsum(
        "...nl,lm->...nm",
        x,
        jnp.asarray(toeplitz.T),
        precision=jax.lax.Precision.HIGHEST,
    )
    # Boundary states: s_b = coeff^block * s_{b-1} + zs[..., b, -1].
    decay = float(coeff) ** block
    e = zs[..., -1]  # (..., n_blocks)
    a = jnp.full_like(e, decay)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, s = jax.lax.associative_scan(combine, (a, e), axis=-1)
    # Block b sees carry s_{b-1}, decayed by coeff^(t+1) inside the block.
    s_prev = jnp.pad(s[..., :-1], [(0, 0)] * (s.ndim - 1) + [(1, 0)])
    ramp = jnp.asarray(
        (float(coeff) ** np.arange(1, block + 1, dtype=np.float64)).astype(
            np.float32
        )
    )
    out = zs + s_prev[..., None] * ramp
    return out.reshape(*batch, n_blocks * block)[..., :n]


def deemphasis_exact(y: jnp.ndarray, coeff: float) -> jnp.ndarray:
    """Exact parallel-scan de-emphasis (oracle for `deemphasis`)."""
    a = jnp.full_like(y, coeff)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, x = jax.lax.associative_scan(combine, (a, y), axis=-1)
    return x


def magnitude_to_decibel(x: jnp.ndarray) -> jnp.ndarray:
    """20 * log10(max(1e-5, x)); matches `reference.magnitude_to_decibel`."""
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


def decibel_to_magnitude(db: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, db / 20.0)


def normalize_decibel(db: jnp.ndarray, ref_db: float, min_db: float) -> jnp.ndarray:
    return jnp.clip((db - ref_db - min_db) / (-min_db), 0.0, 1.0)


def inv_normalize_decibel(s: jnp.ndarray, ref_db: float, min_db: float) -> jnp.ndarray:
    return jnp.clip(s, 0.0, 1.0) * (-min_db) + min_db + ref_db


def mulaw_encode_u8(y: jnp.ndarray, mu: float = 255.0) -> jnp.ndarray:
    """Continuous mu-law companding of [-1, 1] audio to uint8 (on device).

    The serving wire codec for constrained host links (half the bytes of
    PCM16; ~38 dB SNR — above the Griffin-Lim quality floor).  Inverse:
    `mulaw_decode_host`.
    """
    y = jnp.clip(y, -1.0, 1.0)
    c = jnp.sign(y) * jnp.log1p(mu * jnp.abs(y)) / np.log1p(mu)
    return jnp.round((c + 1.0) * 127.5).astype(jnp.uint8)


_MULAW_LUT: dict = {}


def mulaw_decode_host(u8: np.ndarray, mu: float = 255.0) -> np.ndarray:
    """Host-side (numpy) inverse of `mulaw_encode_u8` -> float32 audio.

    Decode runs in the serving stream's hot loop (`Synthesizer._trim`), so
    it is one table gather per sample: there are only 256 codes, and the
    256-entry LUT is bitwise-identical to evaluating the expm1 expression
    per sample (measured ~10x cheaper at headline shapes on the 1-core
    bench host, where the expression was a visible slice of the steady
    state).
    """
    lut = _MULAW_LUT.get(mu)
    if lut is None:
        c = np.arange(256, dtype=np.float32) / 127.5 - 1.0
        lut = (
            np.sign(c) * (np.expm1(np.abs(c) * np.log1p(mu)) / mu)
        ).astype(np.float32)
        _MULAW_LUT[mu] = lut
    return lut[np.asarray(u8, np.uint8)]


# --- 4-bit ADPCM wire codec -------------------------------------------------
#
# Sub-8-bit candidate for the link-bound serving fetch (round-3 verdict ask
# #1: the headline steady state is bound by the host wire, not GL compute).
# Design constraints drove the shape of the codec:
#   * ENCODE runs inside the jitted synthesis program -> it must be a
#     fixed-shape, batched `lax.scan` (256 steps of elementwise VPU work over
#     all blocks of all utterances at once), never a per-sample host loop.
#   * DECODE runs on host per fetched chunk -> it must be vectorizable numpy.
#     The trick: the quantizer feedback loop (which stops quantization error
#     from accumulating) only needs to run at ENCODE time; the decoder's
#     reconstruction  rec[t] = rec[t-1] + q[t]*scale  telescopes to
#     seed + cumsum(q*scale), a plain `np.cumsum`.
#   * Residuals are taken in the LINEAR domain with a per-block f16 scale =
#     max|delta|/7 — level-invariant by construction (the f16 scale is
#     itself floating).  SNR is content-dependent as for any DPCM:
#     measured 42.6 dB on harmonic multitone, 37.1 dB on synthetic-corpus
#     speech, ~30 dB when strong broadband noise sets the block max-deltas
#     (all 2026-08-19).  The alternatives both lost the A/B: deltas in the
#     continuous mu-law domain collapse to 17.5 dB on loud signals
#     (mu-law's steep slope at zero makes zero-crossing deltas dominate
#     the block max), and quantile-based scales lose ~16 dB to
#     slope-overload catch-up.  Block adaptation at 11.6 ms already
#     provides the companding mu-law would have.
# Layout per utterance row (uint8):
#   [ packed 4-bit codes : n_pad//2 ][ f16 scales : 2*nb ][ i16 seeds : 2*nb ]
# with block = 256 samples, nb = ceil(n/256), n_pad = 256*nb.  Code slot 0 of
# each block is a dummy (the seed carries sample 0), kept so 256 codes pack
# into exactly 128 bytes.  Wire cost: 0.516 B/sample vs mu-law's 1.0 and
# PCM16's 2.0.  Quality gate: scripts/wire_codec_gate.py (SNR arms) + the
# trained-checkpoint audio-domain mel-L1 arm (scripts/gl_trained_ab.py
# --wire).
#
# adpcm3 (round 4) is the same codec at 3 bits/delta (clip [-4, 3], scale
# max|delta|/3; 8 codes pack into 3 bytes -> 100 B/block = 0.391 B/sample).
# One quantizer bit costs ~6 dB: expected ~31 dB on corpus speech vs
# adpcm4's 37 dB — whether that stays under the Griffin-Lim quality floor
# is exactly what the wire gate decides.

ADPCM_BLOCK = 256


def _dpcm_quantize_blocks(y, q_lo, q_hi, levels, offset=0.0, ns_beta=0.0):
    """Shared block-adaptive feedback-DPCM quantizer (device, lax.scan).

    [-1, 1] audio (B, n) -> (codes (B, nb, block) uint8 offset by -q_lo
    with dummy slot 0, scale (B, nb) f16, seeds (B, nb) i16).  `levels` is
    the positive-side step count the per-block scale divides by (7 for
    4-bit [-8, 7], 3 for 3-bit [-4, 3], 1.5 for the 2-bit mid-rise).

    `offset` selects the reconstruction lattice: 0.0 = mid-tread (a zero
    step exists; the 4- and 3-bit codecs), 0.5 = mid-rise (steps at
    (q+0.5)*scale, no zero — at 2 bits the four mid-rise levels
    {-1.5, -0.5, +0.5, +1.5}*scale measured +3.5 dB over the mid-tread
    {-2..1} mapping on corpus speech, 23.9 vs 20.4 dB, 2026-08-21,
    because mid-tread wastes one of only four codes on the asymmetric
    -2 extreme).

    `ns_beta` > 0 enables first-order error-feedback NOISE SHAPING: the
    quantizer targets u[t] - beta * e[t-1] (e = the previous step's raw
    quantizer error), so the reconstruction error spectrum is shaped by
    |1 - beta*z^-1| — a high-pass that moves quantization noise out of
    the low-frequency region where the mel metrics (and the ear) weigh
    it most, at the cost of ~(1 + beta^2)x total noise power pushed to
    high frequency.  Encoder-only: the decoder's telescoped-cumsum
    reconstruction is BIT-IDENTICAL to the unshaped codec — rec[t] =
    seed + cumsum((q + offset) * scale) — so every host/native decoder
    is shared.  The feedback error is clamped to +-2*scale so slope-
    overload clipping cannot destabilize the loop.
    """
    block = ADPCM_BLOCK
    bsz, n = y.shape
    nb = -(-n // block)
    y = jnp.pad(y, ((0, 0), (0, nb * block - n)), mode="edge")
    u = jnp.clip(y, -1.0, 1.0)
    blocks = u.reshape(bsz, nb, block)
    # Seeds quantize to int16; the feedback loop tracks the DECODER's seed.
    seeds_i16 = jnp.round(blocks[..., 0] * 32767.0).astype(jnp.int16)
    seed_rec = seeds_i16.astype(jnp.float32) / 32767.0
    # Per-block scale from the open-loop deltas (feedback deltas can exceed
    # the open-loop max by one quantization error; the clip to [q_lo, q_hi]
    # turns that into momentary slope overload, standard for ADPCM).  f16 on
    # the wire; the encoder must use the f16-rounded value the decoder sees.
    deltas = blocks[..., 1:] - blocks[..., :-1]
    scale = jnp.max(jnp.abs(deltas), axis=-1) / float(levels)
    scale = jnp.maximum(scale, 1e-6).astype(jnp.float16)
    scale_f = scale.astype(jnp.float32)

    # scan over the 255 in-block positions; every (batch, block) pair rides
    # in the lanes.  xs: (block-1, B, nb).
    xs = jnp.moveaxis(blocks[..., 1:], -1, 0)
    if ns_beta:

        def step_ns(carry, u_t):
            rec, e = carry
            tgt = u_t - ns_beta * e
            q = jnp.clip(
                jnp.round((tgt - rec) / scale_f - offset), q_lo, q_hi
            )
            rec2 = rec + (q + offset) * scale_f
            e2 = jnp.clip(rec2 - tgt, -2.0 * scale_f, 2.0 * scale_f)
            return (rec2, e2), q

        _, qs = jax.lax.scan(
            step_ns, (seed_rec, jnp.zeros_like(seed_rec)), xs
        )
    else:

        def step(rec, u_t):
            q = jnp.clip(
                jnp.round((u_t - rec) / scale_f - offset), q_lo, q_hi
            )
            return rec + (q + offset) * scale_f, q

        _, qs = jax.lax.scan(step, seed_rec, xs)
    codes = (jnp.moveaxis(qs, 0, -1) - q_lo).astype(jnp.uint8)  # (B, nb, 255)
    codes = jnp.concatenate(
        [jnp.full((bsz, nb, 1), -q_lo, jnp.uint8), codes], axis=-1
    )  # dummy slot 0 = "zero delta"
    return codes, scale, seeds_i16


def adpcm4_encode_wire(y: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] audio (B, n) -> uint8 wire rows (B, 132 * ceil(n/256)).

    Block-adaptive 4-bit feedback DPCM, linear domain (see the layout
    comment above).  Inverse: `adpcm4_decode_host`.
    """
    block = ADPCM_BLOCK
    bsz, n = y.shape
    nb = -(-n // block)
    codes, scale, seeds_i16 = _dpcm_quantize_blocks(y, -8.0, 7.0, 7)
    packed = codes[..., 0::2] | (codes[..., 1::2] << 4)  # (B, nb, 128)
    scale_u8 = jax.lax.bitcast_convert_type(scale, jnp.uint8)  # (B, nb, 2)
    seed_u8 = jax.lax.bitcast_convert_type(seeds_i16, jnp.uint8)  # (B, nb, 2)
    return jnp.concatenate(
        [
            packed.reshape(bsz, nb * (block // 2)),
            scale_u8.reshape(bsz, nb * 2),
            seed_u8.reshape(bsz, nb * 2),
        ],
        axis=1,
    )


def adpcm4_decode_host_rows(rows: np.ndarray) -> np.ndarray:
    """Host-side inverse of `adpcm4_encode_wire` -> (B, n_pad) float32.

    Dispatches to the native C++ row decoder when available (~5x the numpy
    path on the 1-core bench host, where decode is co-binding with the
    wire in the serving steady state — docs/performance.md "The
    steady-state floor"); the numpy implementation below is the fallback
    and the bitwise-parity oracle (tests/test_native.py).
    """
    from sstts.data import native_loader

    dec = native_loader.adpcm_decode_rows(rows, 4)
    if dec is not None:
        return dec
    return _adpcm4_decode_rows_np(rows)


def _adpcm4_decode_rows_np(rows: np.ndarray) -> np.ndarray:
    """Numpy (vectorized) inverse of `adpcm4_encode_wire`.

    `rows` is a (B, W) uint8 wire matrix; returns (B, n_pad) float32 audio
    (callers slice each row to its true length).  The encoder's feedback
    recursion telescopes to a cumulative sum, so decode is O(n) numpy with
    no Python-level loop — the whole batch decodes in one pass (decode
    runs in the serving stream's hot loop, `Synthesizer._trim`).
    """
    block = ADPCM_BLOCK
    rows = np.ascontiguousarray(np.atleast_2d(np.asarray(rows, np.uint8)))
    bsz = rows.shape[0]
    nb = rows.shape[1] // (block // 2 + 4)
    packed = rows[:, : nb * (block // 2)].reshape(bsz, nb, block // 2)
    scales = (
        rows[:, nb * (block // 2) : nb * (block // 2) + 2 * nb]
        .reshape(-1)
        .view(np.float16)
        .astype(np.float32)
        .reshape(bsz, nb, 1)
    )
    seeds = (
        rows[:, nb * (block // 2) + 2 * nb :]
        .reshape(-1)
        .view(np.int16)
        .astype(np.float32)
        .reshape(bsz, nb, 1)
        / 32767.0
    )
    codes = np.empty((bsz, nb, block), np.float32)
    codes[..., 0::2] = packed & 15
    codes[..., 1::2] = packed >> 4
    q = codes - 8.0
    q[..., 0] = 0.0  # dummy slot; sample 0 is the seed itself
    y = seeds + np.cumsum(q * scales, axis=-1)
    return y.reshape(bsz, nb * block).astype(np.float32)


def adpcm4_decode_host(row: np.ndarray, n_samples: int) -> np.ndarray:
    """Single-utterance convenience wrapper of `adpcm4_decode_host_rows`."""
    return adpcm4_decode_host_rows(row[None])[0, :n_samples]


def adpcm4_wire_bytes(n_samples: int) -> int:
    """Wire row width (bytes) produced by `adpcm4_encode_wire` for n samples."""
    nb = -(-n_samples // ADPCM_BLOCK)
    return nb * (ADPCM_BLOCK // 2 + 4)


def adpcm3_encode_wire(y: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] audio (B, n) -> uint8 wire rows (B, 100 * ceil(n/256)).

    Block-adaptive 3-bit feedback DPCM, linear domain — the adpcm4 codec
    at one fewer quantizer bit (0.391 B/sample).  Eight 3-bit codes pack
    little-endian into 3 bytes.  Inverse: `adpcm3_decode_host`.
    """
    block = ADPCM_BLOCK
    bsz, n = y.shape
    nb = -(-n // block)
    codes, scale, seeds_i16 = _dpcm_quantize_blocks(y, -4.0, 3.0, 3)
    # (B, nb, 256) 3-bit values -> (B, nb, 32, 8) -> 3 bytes per 8 codes.
    c = codes.reshape(bsz, nb, block // 8, 8)
    b0 = c[..., 0] | (c[..., 1] << 3) | ((c[..., 2] & 3) << 6)
    b1 = (c[..., 2] >> 2) | (c[..., 3] << 1) | (c[..., 4] << 4) | (
        (c[..., 5] & 1) << 7
    )
    b2 = (c[..., 5] >> 1) | (c[..., 6] << 2) | (c[..., 7] << 5)
    packed = jnp.stack([b0, b1, b2], axis=-1)  # (B, nb, 32, 3)
    scale_u8 = jax.lax.bitcast_convert_type(scale, jnp.uint8)  # (B, nb, 2)
    seed_u8 = jax.lax.bitcast_convert_type(seeds_i16, jnp.uint8)  # (B, nb, 2)
    return jnp.concatenate(
        [
            packed.reshape(bsz, nb * (block * 3 // 8)),
            scale_u8.reshape(bsz, nb * 2),
            seed_u8.reshape(bsz, nb * 2),
        ],
        axis=1,
    )


def adpcm3_decode_host_rows(rows: np.ndarray) -> np.ndarray:
    """Host-side inverse of `adpcm3_encode_wire` -> (B, n_pad) float32.

    Native C++ when available, numpy fallback/oracle — see
    `adpcm4_decode_host_rows`.
    """
    from sstts.data import native_loader

    dec = native_loader.adpcm_decode_rows(rows, 3)
    if dec is not None:
        return dec
    return _adpcm3_decode_rows_np(rows)


def _adpcm3_decode_rows_np(rows: np.ndarray) -> np.ndarray:
    """Numpy (vectorized) inverse of `adpcm3_encode_wire`.

    Same telescoped-cumsum structure as `_adpcm4_decode_rows_np`; only the
    bit unpacking differs (3 bytes -> 8 codes).
    """
    block = ADPCM_BLOCK
    rows = np.ascontiguousarray(np.atleast_2d(np.asarray(rows, np.uint8)))
    bsz = rows.shape[0]
    per_block = block * 3 // 8 + 4
    nb = rows.shape[1] // per_block
    npk = nb * (block * 3 // 8)
    packed = rows[:, :npk].reshape(bsz, nb, block // 8, 3)
    scales = (
        rows[:, npk : npk + 2 * nb]
        .reshape(-1)
        .view(np.float16)
        .astype(np.float32)
        .reshape(bsz, nb, 1)
    )
    seeds = (
        rows[:, npk + 2 * nb :]
        .reshape(-1)
        .view(np.int16)
        .astype(np.float32)
        .reshape(bsz, nb, 1)
        / 32767.0
    )
    b0 = packed[..., 0].astype(np.uint16)
    b1 = packed[..., 1].astype(np.uint16)
    b2 = packed[..., 2].astype(np.uint16)
    codes = np.empty((bsz, nb, block // 8, 8), np.float32)
    codes[..., 0] = b0 & 7
    codes[..., 1] = (b0 >> 3) & 7
    codes[..., 2] = ((b0 >> 6) | (b1 << 2)) & 7
    codes[..., 3] = (b1 >> 1) & 7
    codes[..., 4] = (b1 >> 4) & 7
    codes[..., 5] = ((b1 >> 7) | (b2 << 1)) & 7
    codes[..., 6] = (b2 >> 2) & 7
    codes[..., 7] = (b2 >> 5) & 7
    q = codes.reshape(bsz, nb, block) - 4.0
    q[..., 0] = 0.0  # dummy slot; sample 0 is the seed itself
    y = seeds + np.cumsum(q * scales, axis=-1)
    return y.reshape(bsz, nb * block).astype(np.float32)


def adpcm3_decode_host(row: np.ndarray, n_samples: int) -> np.ndarray:
    """Single-utterance convenience wrapper of `adpcm3_decode_host_rows`."""
    return adpcm3_decode_host_rows(row[None])[0, :n_samples]


def adpcm3_wire_bytes(n_samples: int) -> int:
    """Wire row width (bytes) produced by `adpcm3_encode_wire` for n samples."""
    nb = -(-n_samples // ADPCM_BLOCK)
    return nb * (ADPCM_BLOCK * 3 // 8 + 4)


def adpcm2_encode_wire(y: jnp.ndarray, ns_beta: float = 0.0) -> jnp.ndarray:
    """[-1, 1] audio (B, n) -> uint8 wire rows (B, 68 * ceil(n/256)).

    Block-adaptive 2-bit feedback DPCM (0.266 B/sample — 1.5x fewer bytes
    than adpcm3, 7.5x fewer than PCM16).  Unlike the 4/3-bit codecs this
    one is MID-RISE: stored codes {0..3} reconstruct as
    (code - 1.5) * scale with scale = max|delta|/1.5 — see the
    `_dpcm_quantize_blocks` offset note for the measured +3.5 dB over the
    mid-tread mapping.  Expected ~24 dB on corpus speech (~6 dB below
    adpcm3, one quantizer bit); admission is decided by the numeric gates
    (`scripts/wire_codec_gate.py`: spectral SNR >= GL floor + 10 dB,
    peak-spectral <= 1.02x lossless).  Four codes pack per byte.
    Inverse: `adpcm2_decode_host` (unchanged by `ns_beta` — shaping is
    encoder-only; see `_dpcm_quantize_blocks`).

    `ns_beta` disposition (2026-08-21, `scripts/ns_beta_sweep.py`):
    high-pass noise shaping does NOT rescue the 2-bit codec's failed
    copy-synthesis arm — best beta=0.4 reads 1.24x the lossless wire
    (bar 1.02x; unshaped 1.29x), beta>=0.8 is WORSE (the GL cargo's
    high-frequency mel bins are low-energy, so relocated noise still
    surfaces).  The arm fails on total 2-bit noise power, not on its
    spectral placement; the serving wire floor stands at adpcm3.
    """
    block = ADPCM_BLOCK
    bsz, n = y.shape
    nb = -(-n // block)
    codes, scale, seeds_i16 = _dpcm_quantize_blocks(
        y, -2.0, 1.0, 1.5, offset=0.5, ns_beta=ns_beta
    )
    c = codes.reshape(bsz, nb, block // 4, 4)
    packed = (
        c[..., 0] | (c[..., 1] << 2) | (c[..., 2] << 4) | (c[..., 3] << 6)
    )  # (B, nb, 64)
    scale_u8 = jax.lax.bitcast_convert_type(scale, jnp.uint8)  # (B, nb, 2)
    seed_u8 = jax.lax.bitcast_convert_type(seeds_i16, jnp.uint8)  # (B, nb, 2)
    return jnp.concatenate(
        [
            packed.reshape(bsz, nb * (block // 4)),
            scale_u8.reshape(bsz, nb * 2),
            seed_u8.reshape(bsz, nb * 2),
        ],
        axis=1,
    )


def adpcm2_decode_host_rows(rows: np.ndarray) -> np.ndarray:
    """Host-side inverse of `adpcm2_encode_wire` -> (B, n_pad) float32.

    Native C++ when available, numpy fallback/oracle — see
    `adpcm4_decode_host_rows`.
    """
    from sstts.data import native_loader

    dec = native_loader.adpcm_decode_rows(rows, 2)
    if dec is not None:
        return dec
    return _adpcm2_decode_rows_np(rows)


def _adpcm2_decode_rows_np(rows: np.ndarray) -> np.ndarray:
    """Numpy (vectorized) inverse of `adpcm2_encode_wire`.

    Same telescoped-cumsum structure as `_adpcm4_decode_rows_np`; the
    mid-rise offset folds into the summand ((code - 1.5) * scale)."""
    block = ADPCM_BLOCK
    rows = np.ascontiguousarray(np.atleast_2d(np.asarray(rows, np.uint8)))
    bsz = rows.shape[0]
    per_block = block // 4 + 4
    nb = rows.shape[1] // per_block
    npk = nb * (block // 4)
    packed = rows[:, :npk].reshape(bsz, nb, block // 4)
    scales = (
        rows[:, npk : npk + 2 * nb]
        .reshape(-1)
        .view(np.float16)
        .astype(np.float32)
        .reshape(bsz, nb, 1)
    )
    seeds = (
        rows[:, npk + 2 * nb :]
        .reshape(-1)
        .view(np.int16)
        .astype(np.float32)
        .reshape(bsz, nb, 1)
        / 32767.0
    )
    codes = np.empty((bsz, nb, block), np.float32)
    codes[..., 0::4] = packed & 3
    codes[..., 1::4] = (packed >> 2) & 3
    codes[..., 2::4] = (packed >> 4) & 3
    codes[..., 3::4] = packed >> 6
    q = codes - 1.5
    q[..., 0] = 0.0  # dummy slot; sample 0 is the seed itself
    y = seeds + np.cumsum(q * scales, axis=-1)
    return y.reshape(bsz, nb * block).astype(np.float32)


def adpcm2_decode_host(row: np.ndarray, n_samples: int) -> np.ndarray:
    """Single-utterance convenience wrapper of `adpcm2_decode_host_rows`."""
    return adpcm2_decode_host_rows(row[None])[0, :n_samples]


def adpcm2_wire_bytes(n_samples: int) -> int:
    """Wire row width (bytes) produced by `adpcm2_encode_wire` for n samples."""
    nb = -(-n_samples // ADPCM_BLOCK)
    return nb * (ADPCM_BLOCK // 4 + 4)


def _stft_magnitude_dft(
    y: jnp.ndarray, cfg: DatasetConfig, precision
) -> jnp.ndarray:
    """Magnitude STFT as two support-reduced window-folded GEMMs (MXU path).

    Feature extraction needs |STFT| only, so the transform runs as a direct
    real DFT restricted to the window's non-zero support (win_len taps inside
    n_fft — 46% less GEMM work at the default hparams) with the Hann window
    folded into the matrices (`sstts.dsp.fft._rdft_matrices_windowed`, the
    same formulation the Griffin-Lim loop uses).  Matches `stft` + `abs` to
    f32 accuracy at HIGHEST precision (tested); framing/padding semantics are
    identical (librosa-style reflect pad + centered frames).
    """
    from sstts.dsp import fft as mmfft

    n_fft = cfg.n_fft
    pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    y = jnp.pad(y, pad, mode="reflect")
    n_frames = (y.shape[-1] - n_fft) // cfg.hop_len + 1
    window = stft_mod._window(n_fft, cfg.win_len)
    lo, w_len, cos_w, nsin_w, _, _ = mmfft._rdft_matrices_windowed(
        n_fft, window
    )
    # Frame the lo-shifted signal at the window support directly (the
    # griffin_lim analyze() pattern): framing at n_fft and slicing to
    # [lo : lo+w_len] would materialize an ~2x-wider frames array on the
    # per-train-step hot path.  frame_signal fits more w_len-wide frames
    # than n_fft-wide ones, so slice back to the STFT's frame count.
    seg = stft_mod.frame_signal(y[..., lo:], w_len, cfg.hop_len)[
        ..., :n_frames, :
    ]
    mm = lambda a, b: jnp.matmul(  # noqa: E731
        a, b, precision=precision, preferred_element_type=jnp.float32
    )
    re = mm(seg, cos_w)
    im = mm(seg, nsin_w)
    return jnp.sqrt(re * re + im * im)


_FEATURE_FFT_PRECISION = {
    "dft_default": jax.lax.Precision.DEFAULT,
    "dft_high": jax.lax.Precision.HIGH,
    "dft_highest": jax.lax.Precision.HIGHEST,
}


def wav_to_features(
    y: jnp.ndarray, cfg: DatasetConfig, fft_impl: str = "default"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., n_samples) waveform -> (linear, mel) normalized spectrograms.

    One STFT feeds both branches (reference computed them separately on host;
    SURVEY.md §3.4).  Returns
    linear: (..., n_frames, n_fft//2+1), mel: (..., n_frames, n_mels),
    both normalized to [0, 1].

    `fft_impl` selects the transform: "default" (XLA FFT, the golden-tested
    oracle path) or "dft_default"/"dft_high"/"dft_highest" — a direct
    support-reduced DFT as MXU GEMMs (`_stft_magnitude_dft`), the perf knob
    behind `training.feature_fft_impl`.
    """
    if fft_impl != "default" and fft_impl not in _FEATURE_FFT_PRECISION:
        raise ValueError(
            f"unknown fft_impl {fft_impl!r}; valid: 'default', "
            + ", ".join(repr(k) for k in _FEATURE_FFT_PRECISION)
        )
    y = preemphasis(y.astype(jnp.float32), cfg.preemphasis)
    if fft_impl == "default":
        spec = stft_mod.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len)
        mag = jnp.abs(spec)
    else:
        mag = _stft_magnitude_dft(y, cfg, _FEATURE_FFT_PRECISION[fft_impl])
    linear = normalize_decibel(
        magnitude_to_decibel(mag), cfg.ref_level_db, cfg.min_level_db
    )
    mel_mag = mel_mod.apply_mel(mag, cfg)
    mel = normalize_decibel(
        magnitude_to_decibel(mel_mag), cfg.ref_level_db, cfg.min_level_db
    )
    return linear, mel


def linear_scale_spectrogram(y: jnp.ndarray, cfg: DatasetConfig) -> jnp.ndarray:
    """Normalized linear spectrogram only (reference `features.py` API)."""
    return wav_to_features(y, cfg)[0]


def mel_scale_spectrogram(y: jnp.ndarray, cfg: DatasetConfig) -> jnp.ndarray:
    """Normalized mel spectrogram only (reference `features.py` API)."""
    return wav_to_features(y, cfg)[1]
