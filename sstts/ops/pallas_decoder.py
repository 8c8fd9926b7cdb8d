"""Fused autoregressive Tacotron decoder: the whole scan as ONE Pallas kernel.

The inference "prepare" phase is latency-bound: S (=160 at the headline
workload) sequential decoder steps, each a chain of ~12 tiny matmuls
(prenet -> attention GRU -> Bahdanau attention -> 2 residual GRUs ->
frame/stop projections).  As an XLA `lax.scan` the step costs ~200 us — far
above its ~100 MFLOP of useful work — because every op in the unrolled step
body pays fixed overhead and pipeline bubbles at (32, 256)-sized operands
(docs/performance.md phase table; SURVEY.md §7 "Autoregressive scan with
attention" + north-star "Pallas-fused conv+GRU cells").

This kernel runs the ENTIRE autoregressive loop in one `pallas_call`:

* the step index is the grid — Pallas sequences the S steps on-core,
* every weight matrix uses a constant index map, so the full decoder cell
  (~1.6 M params, stored bf16) is DMA'd to VMEM once and stays resident
  across all S steps,
* the recurrent state (attention-GRU h, 2 decoder-GRU h's, context,
  previous frame, stop flags) lives in VMEM scratch for the whole decode —
  it never round-trips to HBM between steps,
* encoder memory and projected attention keys ride along in VMEM as bf16,
* matmuls hit the MXU in bf16 with f32 accumulation (the XLA baseline's
  f32 matmuls already execute as bf16 MXU passes, so numerics match the
  oracle to ~1e-2), gate math and the masked softmax run f32 on the VPU,
* prenet dropout (active at inference per Tacotron-1) uses the on-core
  PRNG, seeded per step — a different stream than the XLA path's
  `jax.random`, which is fine: the noise is not part of the parity
  contract (sstts.synthesize documents the same for shard_map).

Semantics mirror `sstts.model.decoder.DecoderCell` +
`Tacotron.decode_infer` exactly (stop-token mask accumulation, carry freeze
after finish, min-step gating); `tests/test_pallas_decoder.py` pins the
equivalence against the XLA scan in interpret mode.

Only the Bahdanau attention variant is fused (the reference default); the
local-Luong thesis variant stays on the XLA scan path.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: "auto" | "xla" | "fused".  Overridable by SSTTS_DECODER_IMPL; "auto"
#: resolves to the fused kernel on the TPU backend for Bahdanau attention
#: (measured 2.0x the XLA scan in-program: 0.88 vs 1.76 ms per b=32 S=160
#: decode, scripts/profile_decoder_chain.py), and the XLA scan elsewhere.
DECODER_IMPL = os.environ.get("SSTTS_DECODER_IMPL", "auto")


class DecoderWeights(NamedTuple):
    """Flat decoder-cell parameters, in kernel argument order."""

    prenet_w0: jnp.ndarray  # (M, P0)
    prenet_b0: jnp.ndarray  # (1, P0)
    prenet_w1: jnp.ndarray  # (P0, P1)
    prenet_b1: jnp.ndarray  # (1, P1)
    attn_wx: jnp.ndarray  # (P1 + Dm, 3*Ha)
    attn_wh: jnp.ndarray  # (Ha, 3*Ha)
    attn_b: jnp.ndarray  # (1, 3*Ha)
    query_w: jnp.ndarray  # (Ha, A)
    score_v: jnp.ndarray  # (1, A)
    score_b: jnp.ndarray  # (1, A)
    dec_w: jnp.ndarray  # (Ha + Dm, Hd)
    dec_b: jnp.ndarray  # (1, Hd)
    gru0_wx: jnp.ndarray  # (Hd, 3*Hd)
    gru0_wh: jnp.ndarray  # (Hd, 3*Hd)
    gru0_b: jnp.ndarray  # (1, 3*Hd)
    gru1_wx: jnp.ndarray  # (Hd, 3*Hd)
    gru1_wh: jnp.ndarray  # (Hd, 3*Hd)
    gru1_b: jnp.ndarray  # (1, 3*Hd)
    frame_w: jnp.ndarray  # (Hd, r*M)
    frame_b: jnp.ndarray  # (1, r*M)
    stop_w: jnp.ndarray  # (Hd, r)
    stop_b: jnp.ndarray  # (1, r)


def weights_from_tree(params: Any) -> DecoderWeights:
    """Extract the decoder cell's parameter arrays from a Tacotron param tree.

    `params` is `variables["params"]["decoder_cell"]` (flax layout created by
    sstts.model.decoder.DecoderCell.setup).  Raises if the tree carries
    layers the kernel does not implement (see `supports_arch`).
    """
    p = params
    extra = {k for k in p if k.startswith("dec_gru")} - {"dec_gru0", "dec_gru1"}
    extra |= {k for k in p["prenet"] if k.startswith("fc")} - {"fc0", "fc1"}
    if extra:
        raise ValueError(
            f"fused decoder supports 2 decoder GRUs and a 2-layer prenet; "
            f"param tree has extra layers {sorted(extra)} — use the XLA scan"
        )

    def row(x):  # biases/vectors as (1, N) — TPU wants >= 2D operands
        return jnp.asarray(x).reshape(1, -1)

    return DecoderWeights(
        prenet_w0=p["prenet"]["fc0"]["kernel"],
        prenet_b0=row(p["prenet"]["fc0"]["bias"]),
        prenet_w1=p["prenet"]["fc1"]["kernel"],
        prenet_b1=row(p["prenet"]["fc1"]["bias"]),
        attn_wx=p["attn_gru"]["wx"],
        attn_wh=p["attn_gru"]["wh"],
        attn_b=row(p["attn_gru"]["b"]),
        query_w=p["attention"]["query_proj"]["kernel"],
        score_v=row(p["attention"]["v"]),
        score_b=row(p["attention"]["b"]),
        dec_w=p["dec_proj"]["kernel"],
        dec_b=row(p["dec_proj"]["bias"]),
        gru0_wx=p["dec_gru0"]["wx"],
        gru0_wh=p["dec_gru0"]["wh"],
        gru0_b=row(p["dec_gru0"]["b"]),
        gru1_wx=p["dec_gru1"]["wx"],
        gru1_wh=p["dec_gru1"]["wh"],
        gru1_b=row(p["dec_gru1"]["b"]),
        frame_w=p["frame_proj"]["kernel"],
        frame_b=row(p["frame_proj"]["bias"]),
        stop_w=p["stop_proj"]["kernel"],
        stop_b=row(p["stop_proj"]["bias"]),
    )


def _make_dot(dt: jnp.dtype):
    """Matmul in `dt` with f32 accumulation.  bf16 (default) matches the
    XLA baseline's effective MXU numerics; f32 is for exact parity tests."""

    def dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(
            x.astype(dt), w.astype(dt), preferred_element_type=jnp.float32
        )

    return dot


def _gru_step(x, h, wx, wh, b, dot):
    """Same math as sstts.ops.pallas_gru.gru_step_math (MXU + f32 VPU)."""
    hidden = h.shape[-1]
    gx = dot(x, wx) + b
    gh = dot(h, wh)
    r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
    z = jax.nn.sigmoid(
        gx[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden]
    )
    n = jnp.tanh(gx[:, 2 * hidden :] + r * gh[:, 2 * hidden :])
    return z * h + (1.0 - z) * n


def _dropout(x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout from the on-core PRNG (caller must seed first)."""
    rate = min(max(float(rate), 0.0), 1.0)
    if rate >= 1.0:
        # flax Dropout semantics: rate 1.0 zeroes everything (the uint32
        # threshold below cannot represent 2**32, and 1/(1-rate) is inf).
        return jnp.zeros_like(x)
    bits = pltpu.prng_random_bits(x.shape)
    threshold = np.uint32(min(rate * 4294967296.0, 4294967295.0))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return jnp.where(keep, x * (1.0 / (1.0 - rate)), 0.0)


def fused_decode(
    params: Any,
    memory: jnp.ndarray,
    memory_mask: jnp.ndarray,
    max_steps: int,
    *,
    n_mels: int,
    reduction: int,
    stop_threshold: float = 0.5,
    min_steps: int = 8,
    dropout_rate: float = 0.5,
    apply_dropout: bool = True,
    seed: int = 0,
    matmul_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Autoregressive decode of `max_steps` steps as one fused kernel.

    Drop-in equivalent of `Tacotron.decode_infer` (same output dict) for the
    Bahdanau-attention configuration.  `params` is the decoder_cell param
    subtree; the attention key projection (the one per-utterance matmul that
    the XLA path also hoists out of the scan) runs in XLA before the kernel.
    """
    w = weights_from_tree(params)
    dot = _make_dot(matmul_dtype)
    B, T, Dm = memory.shape
    r, M = reduction, n_mels
    S = int(max_steps)
    Ha = w.attn_wh.shape[0]
    Hd = w.gru0_wh.shape[0]

    # Hoisted per-utterance work (identical in the XLA path).
    keys = jnp.dot(
        memory.astype(jnp.float32), params["attention"]["memory_proj"]["kernel"]
    )
    mem_dev = memory.astype(matmul_dtype)
    keys_dev = keys.astype(matmul_dtype)
    maskf = memory_mask.astype(jnp.float32)
    seed_arr = jnp.asarray([seed], jnp.int32)

    n_weights = len(w)

    def kernel(*refs):
        seed_ref = refs[0]
        w_refs = refs[1 : 1 + n_weights]
        mem_ref, keys_ref, mask_ref = refs[1 + n_weights : 4 + n_weights]
        mel_ref, stop_ref, align_ref, fin_ref = refs[4 + n_weights : 8 + n_weights]
        (attn_h, dec_h0, dec_h1, context, prev, fin) = refs[8 + n_weights :]
        wk = DecoderWeights(*[ref[...] for ref in w_refs])
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            attn_h[...] = jnp.zeros_like(attn_h)
            dec_h0[...] = jnp.zeros_like(dec_h0)
            dec_h1[...] = jnp.zeros_like(dec_h1)
            context[...] = jnp.zeros_like(context)
            prev[...] = jnp.zeros_like(prev)
            fin[...] = jnp.zeros_like(fin)

        fin_old = fin[...]  # (B, 1) f32: 1.0 = finished before this step

        # Pre-net (dropout active at inference per Tacotron-1).
        if apply_dropout:
            pltpu.prng_seed(seed_ref[0] + t)
        x = jnp.maximum(dot(prev[...], wk.prenet_w0) + wk.prenet_b0, 0.0)
        if apply_dropout:
            x = _dropout(x, dropout_rate)
        x = jnp.maximum(dot(x, wk.prenet_w1) + wk.prenet_b1, 0.0)
        if apply_dropout:
            x = _dropout(x, dropout_rate)

        # Attention GRU over [prenet, previous context].
        attn_in = jnp.concatenate([x, context[...]], axis=-1)
        h_a = _gru_step(attn_in, attn_h[...], wk.attn_wx, wk.attn_wh, wk.attn_b, dot)

        # Bahdanau attention: v . tanh(keys + W_q h + b), masked softmax (f32).
        q = dot(h_a, wk.query_w) + wk.score_b  # (B, A)
        s = jnp.tanh(keys_ref[...].astype(jnp.float32) + q[:, None, :])
        scores = jnp.sum(s * wk.score_v[None, :, :], axis=-1)  # (B, T)
        scores = jnp.where(mask_ref[...] > 0.0, scores, -1e9)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores)
        align = e / jnp.sum(e, axis=-1, keepdims=True)  # (B, T) f32
        ctx = jnp.sum(
            align[:, :, None] * mem_ref[...].astype(jnp.float32), axis=1
        )  # (B, Dm) f32

        # Decoder projection + 2 residual GRUs.
        d = dot(jnp.concatenate([h_a, ctx], axis=-1), wk.dec_w) + wk.dec_b
        h0 = _gru_step(d, dec_h0[...], wk.gru0_wx, wk.gru0_wh, wk.gru0_b, dot)
        d = d + h0
        h1 = _gru_step(d, dec_h1[...], wk.gru1_wx, wk.gru1_wh, wk.gru1_b, dot)
        d = d + h1

        mel = dot(d, wk.frame_w) + wk.frame_b  # (B, r*M)
        stop = dot(d, wk.stop_w) + wk.stop_b  # (B, r)

        # Stop-token mask accumulation (mirrors decode_infer + DecoderCell).
        mel = jnp.where(fin_old > 0.0, 0.0, mel)
        stop_sig = jax.nn.sigmoid(jnp.max(stop, axis=-1, keepdims=True))
        hit = jnp.where(stop_sig > stop_threshold, 1.0, 0.0)
        if min_steps > 0:
            hit = jnp.where(t >= min_steps - 1, hit, 0.0)
        fin_new = jnp.maximum(fin_old, hit)

        # Freeze carries once finished.
        def keep(new, old):
            return jnp.where(fin_old > 0.0, old, new)

        attn_h[...] = keep(h_a, attn_h[...])
        dec_h0[...] = keep(h0, dec_h0[...])
        dec_h1[...] = keep(h1, dec_h1[...])
        context[...] = keep(ctx, context[...])
        prev[...] = keep(mel[:, (r - 1) * M :], prev[...])
        fin[...] = fin_new

        mel_ref[0] = mel
        stop_ref[0] = stop
        align_ref[0] = align
        fin_ref[0] = fin_old

    step_map3 = lambda t: (t, 0, 0)  # noqa: E731
    const2 = lambda t: (0, 0)  # noqa: E731
    const3 = lambda t: (0, 0, 0)  # noqa: E731

    # Row-vector params (biases, score v/b — all shaped (1, N)) stay f32;
    # weight matrices ride in the matmul dtype (bf16 by default).
    w_dev = DecoderWeights(
        *[
            a.astype(jnp.float32) if a.shape[0] == 1
            else a.astype(matmul_dtype)
            for a in w
        ]
    )
    w_specs = [
        pl.BlockSpec(a.shape, const2, memory_space=pltpu.VMEM) for a in w_dev
    ]

    out_shape = (
        jax.ShapeDtypeStruct((S, B, r * M), jnp.float32),
        jax.ShapeDtypeStruct((S, B, r), jnp.float32),
        jax.ShapeDtypeStruct((S, B, T), jnp.float32),
        jax.ShapeDtypeStruct((S, B, 1), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, B, r * M), step_map3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, r), step_map3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, T), step_map3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, 1), step_map3, memory_space=pltpu.VMEM),
    )

    mel_s, stop_s, align_s, fin_s = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1,), lambda t: (0,), memory_space=pltpu.SMEM),
            *w_specs,
            pl.BlockSpec((B, T, Dm), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec(keys_dev.shape, const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, Ha), jnp.float32),
            pltpu.VMEM((B, Hd), jnp.float32),
            pltpu.VMEM((B, Hd), jnp.float32),
            pltpu.VMEM((B, Dm), jnp.float32),
            pltpu.VMEM((B, M), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, *w_dev, mem_dev, keys_dev, maskf)

    finished = jnp.swapaxes(fin_s[..., 0], 0, 1) > 0.5  # (B, S)
    mel = jnp.swapaxes(mel_s, 0, 1).reshape(B, S * r, M)
    stops = jnp.swapaxes(stop_s, 0, 1).reshape(B, S * r)
    return {
        "mel": mel,
        "stop_logits": stops,
        "alignments": jnp.swapaxes(align_s, 0, 1),
        "n_frames": jnp.sum(~finished, axis=1) * r,
    }


#: Teacher-forced scan implementation: "auto" | "xla" | "fused".  "auto"
#: resolves to "xla" — measured on v5e (scripts/profile_teacher_chain.py,
#: chained in-program A/B at b=32, S=80 flagship shapes): the fused kernel
#: LOSES to the XLA scan on both legs (fwd 0.65 vs 0.42 ms; fwd+bwd 5.07 vs
#: 4.49 ms/application).  Unlike the AR decode (2.0x win), the teacher body
#: is small after the prenet/projection hoisting and fully pipelined by XLA,
#: while the kernel re-reads its VMEM-resident weights per step for ~100 us
#: of work and its backward still rematerializes through the XLA oracle.
#: The kernel stays as a tested opt-in (force with "fused").
TEACHER_IMPL = os.environ.get("SSTTS_TF_DECODER_IMPL", "auto")


class TeacherWeights(NamedTuple):
    """Teacher-step parameters (the AR cell minus prenet/projections, which
    the teacher path hoists out of the scan — Tacotron.decode_teacher)."""

    attn_wx: jnp.ndarray  # (P1 + Dm, 3*Ha)
    attn_wh: jnp.ndarray  # (Ha, 3*Ha)
    attn_b: jnp.ndarray  # (1, 3*Ha)
    query_w: jnp.ndarray  # (Ha, A)
    score_v: jnp.ndarray  # (1, A)
    score_b: jnp.ndarray  # (1, A)
    dec_w: jnp.ndarray  # (Ha + Dm, Hd)
    dec_b: jnp.ndarray  # (1, Hd)
    gru0_wx: jnp.ndarray  # (Hd, 3*Hd)
    gru0_wh: jnp.ndarray  # (Hd, 3*Hd)
    gru0_b: jnp.ndarray  # (1, 3*Hd)
    gru1_wx: jnp.ndarray  # (Hd, 3*Hd)
    gru1_wh: jnp.ndarray  # (Hd, 3*Hd)
    gru1_b: jnp.ndarray  # (1, 3*Hd)


def teacher_weights_from_tree(params: Any) -> TeacherWeights:
    """`params` is variables["params"]["decoder_cell"]; raises on layer
    counts the kernel does not implement (see supports_teacher_arch)."""
    p = params
    extra = {k for k in p if k.startswith("dec_gru")} - {"dec_gru0", "dec_gru1"}
    if extra:
        raise ValueError(
            f"fused teacher decoder supports exactly 2 decoder GRUs; param "
            f"tree has extra layers {sorted(extra)} — use the XLA scan"
        )

    def row(x):
        return jnp.asarray(x).reshape(1, -1)

    return TeacherWeights(
        attn_wx=p["attn_gru"]["wx"],
        attn_wh=p["attn_gru"]["wh"],
        attn_b=row(p["attn_gru"]["b"]),
        query_w=p["attention"]["query_proj"]["kernel"],
        score_v=row(p["attention"]["v"]),
        score_b=row(p["attention"]["b"]),
        dec_w=p["dec_proj"]["kernel"],
        dec_b=row(p["dec_proj"]["bias"]),
        gru0_wx=p["dec_gru0"]["wx"],
        gru0_wh=p["dec_gru0"]["wh"],
        gru0_b=row(p["dec_gru0"]["b"]),
        gru1_wx=p["dec_gru1"]["wx"],
        gru1_wh=p["dec_gru1"]["wh"],
        gru1_b=row(p["dec_gru1"]["b"]),
    )


def _teacher_step_math(w: TeacherWeights, pre_t, attn_h, h0, h1, ctx,
                       memory, keys, maskf, dot):
    """One teacher-forced step: attention GRU -> Bahdanau attention -> dec
    projection -> 2 residual GRUs.  Shared by the Pallas kernel and the XLA
    oracle scan (identical math, f32 accumulation/softmax); mirrors
    sstts.model.decoder.DecoderCell.teacher_step."""
    attn_in = jnp.concatenate([pre_t, ctx], axis=-1)
    h_a = _gru_step(attn_in, attn_h, w.attn_wx, w.attn_wh, w.attn_b, dot)

    q = dot(h_a, w.query_w) + w.score_b  # (B, A)
    s = jnp.tanh(keys.astype(jnp.float32) + q[:, None, :])
    scores = jnp.sum(s * w.score_v[None, :, :], axis=-1)  # (B, T)
    scores = jnp.where(maskf > 0.0, scores, -1e9)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    align = e / jnp.sum(e, axis=-1, keepdims=True)  # (B, T) f32
    new_ctx = jnp.sum(
        align[:, :, None] * memory.astype(jnp.float32), axis=1
    )  # (B, Dm) f32

    d = dot(jnp.concatenate([h_a, new_ctx], axis=-1), w.dec_w) + w.dec_b
    h0_new = _gru_step(d, h0, w.gru0_wx, w.gru0_wh, w.gru0_b, dot)
    d = d + h0_new
    h1_new = _gru_step(d, h1, w.gru1_wx, w.gru1_wh, w.gru1_b, dot)
    d = d + h1_new
    return d, align, h_a, h0_new, h1_new, new_ctx


def fused_teacher_scan(
    w: TeacherWeights,
    pre: jnp.ndarray,
    memory: jnp.ndarray,
    keys: jnp.ndarray,
    maskf: jnp.ndarray,
    matmul_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
):
    """Teacher-forced decoder scan as ONE Pallas kernel.

    pre: (B, S, P1) hoisted prenet outputs; memory (B, T, Dm); keys
    (B, T, A); maskf (B, T) f32 {0,1}.  Returns (xs (B, S, Hd) f32 — the
    features the frame/stop projections consume — and align (B, S, T) f32).
    Same kernel economics as `fused_decode`: step index as the grid, all
    weights + memory/keys VMEM-resident across the S steps, recurrent state
    in VMEM scratch (never round-trips to HBM between steps).
    """
    dot = _make_dot(matmul_dtype)
    B, S, P1 = pre.shape
    _, T, Dm = memory.shape
    Ha = w.attn_wh.shape[0]
    Hd = w.gru0_wh.shape[0]

    pre_t = jnp.swapaxes(pre, 0, 1).astype(jnp.float32)  # (S, B, P1)
    mem_dev = memory.astype(matmul_dtype)
    keys_dev = keys.astype(matmul_dtype)

    w_dev = TeacherWeights(
        *[
            a.astype(jnp.float32) if a.shape[0] == 1
            else a.astype(matmul_dtype)
            for a in w
        ]
    )
    n_weights = len(w_dev)

    def kernel(*refs):
        w_refs = refs[:n_weights]
        pre_ref, mem_ref, keys_ref, mask_ref = refs[n_weights : n_weights + 4]
        xs_ref, align_ref = refs[n_weights + 4 : n_weights + 6]
        attn_h, dec_h0, dec_h1, context = refs[n_weights + 6 :]
        wk = TeacherWeights(*[ref[...] for ref in w_refs])
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            attn_h[...] = jnp.zeros_like(attn_h)
            dec_h0[...] = jnp.zeros_like(dec_h0)
            dec_h1[...] = jnp.zeros_like(dec_h1)
            context[...] = jnp.zeros_like(context)

        d, align, h_a, h0_new, h1_new, new_ctx = _teacher_step_math(
            wk, pre_ref[0], attn_h[...], dec_h0[...], dec_h1[...],
            context[...], mem_ref[...], keys_ref[...], mask_ref[...], dot,
        )
        attn_h[...] = h_a
        dec_h0[...] = h0_new
        dec_h1[...] = h1_new
        context[...] = new_ctx
        xs_ref[0] = d
        align_ref[0] = align

    step_map3 = lambda t: (t, 0, 0)  # noqa: E731
    const2 = lambda t: (0, 0)  # noqa: E731
    const3 = lambda t: (0, 0, 0)  # noqa: E731

    xs_s, align_s = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            *[
                pl.BlockSpec(a.shape, const2, memory_space=pltpu.VMEM)
                for a in w_dev
            ],
            pl.BlockSpec((1, B, P1), step_map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T, Dm), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec(keys_dev.shape, const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, Hd), step_map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, T), step_map3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, B, Hd), jnp.float32),
            jax.ShapeDtypeStruct((S, B, T), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, Ha), jnp.float32),
            pltpu.VMEM((B, Hd), jnp.float32),
            pltpu.VMEM((B, Hd), jnp.float32),
            pltpu.VMEM((B, Dm), jnp.float32),
        ],
        interpret=interpret,
    )(*w_dev, pre_t, mem_dev, keys_dev, maskf)

    return jnp.swapaxes(xs_s, 0, 1), jnp.swapaxes(align_s, 0, 1)


def teacher_scan_xla(
    w: TeacherWeights,
    pre: jnp.ndarray,
    memory: jnp.ndarray,
    keys: jnp.ndarray,
    maskf: jnp.ndarray,
):
    """f32 `lax.scan` oracle with math identical to `fused_teacher_scan`
    (used as its differentiation path and its correctness reference)."""
    dot = _make_dot(jnp.float32)
    B, S, _ = pre.shape
    _, T, Dm = memory.shape
    Ha = w.attn_wh.shape[0]
    Hd = w.gru0_wh.shape[0]
    pre_t = jnp.swapaxes(pre, 0, 1).astype(jnp.float32)
    mem32 = memory.astype(jnp.float32)
    keys32 = keys.astype(jnp.float32)

    def step(carry, pre_step):
        attn_h, h0, h1, ctx = carry
        d, align, h_a, h0_new, h1_new, new_ctx = _teacher_step_math(
            w, pre_step, attn_h, h0, h1, ctx, mem32, keys32, maskf, dot
        )
        return (h_a, h0_new, h1_new, new_ctx), (d, align)

    zeros = lambda n: jnp.zeros((B, n), jnp.float32)  # noqa: E731
    (_, (xs_s, align_s)) = jax.lax.scan(
        step, (zeros(Ha), zeros(Hd), zeros(Hd), zeros(Dm)), pre_t
    )
    return jnp.swapaxes(xs_s, 0, 1), jnp.swapaxes(align_s, 0, 1)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_teacher_scan_ad(
    w: TeacherWeights,
    pre: jnp.ndarray,
    memory: jnp.ndarray,
    keys: jnp.ndarray,
    maskf: jnp.ndarray,
    matmul_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
):
    """Differentiable fused teacher scan: Pallas forward, XLA backward.

    `pallas_call` has no autodiff rule, so the backward rematerializes the
    scan through `teacher_scan_xla` (identical math) and differentiates
    that — the same contract as sstts.ops.pallas_gru.gru_sequence_ad.
    """
    return fused_teacher_scan(
        w, pre, memory, keys, maskf, matmul_dtype, interpret
    )


def _teacher_ad_fwd(w, pre, memory, keys, maskf, matmul_dtype, interpret):
    out = fused_teacher_scan(
        w, pre, memory, keys, maskf, matmul_dtype, interpret
    )
    return out, (w, pre, memory, keys, maskf)


def _teacher_ad_bwd(matmul_dtype, interpret, residuals, g):
    w, pre, memory, keys, maskf = residuals

    def ref(w, pre, memory, keys):
        return teacher_scan_xla(w, pre, memory, keys, maskf)

    _, vjp = jax.vjp(ref, w, pre, memory, keys)
    dw, dpre, dmem, dkeys = vjp(g)
    return dw, dpre, dmem, dkeys, jnp.zeros_like(maskf)


fused_teacher_scan_ad.defvjp(_teacher_ad_fwd, _teacher_ad_bwd)


def supports_teacher_arch(arch) -> bool:
    """True iff the fused teacher scan implements this architecture exactly
    (the prenet runs outside the scan, so its depth does not matter here)."""
    return arch.attention_type == "bahdanau" and arch.decoder_gru_layers == 2


def resolve_teacher_impl(override: Optional[str], arch) -> str:
    """Resolve the teacher-forced scan implementation ("xla" | "fused").

    "auto" is "xla" — the fused kernel measured slower at flagship shapes
    (see TEACHER_IMPL).  An explicit "fused" on an unsupported architecture
    is an error rather than a silent fallback.
    """
    impl = override or TEACHER_IMPL
    if impl == "auto":
        impl = "xla"
    if impl == "fused" and not supports_teacher_arch(arch):
        raise ValueError(
            "teacher decoder impl 'fused' requires Bahdanau attention and "
            "exactly 2 decoder GRUs — use 'xla' for this architecture"
        )
    if impl not in ("xla", "fused"):
        raise ValueError(f"unknown teacher decoder impl: {impl!r}")
    return impl


def supports_arch(arch) -> bool:
    """True iff the fused kernel implements this architecture exactly.

    The kernel hard-codes the reference topology: Bahdanau attention, a
    two-layer pre-net, and exactly two residual decoder GRUs.  Any other
    shape must stay on the XLA scan — `weights_from_tree` would otherwise
    silently drop layers (e.g. dec_gru2) whose shapes happen to line up.
    """
    return (
        arch.attention_type == "bahdanau"
        and arch.decoder_gru_layers == 2
        and len(arch.prenet_units) == 2
    )


#: Serving admission budget for the fused kernel: ~3/4 of a v5e core's
#: 16 MiB VMEM (headroom for compiler temporaries).  Callers compare
#: `vmem_estimate_bytes(...) <= FUSED_VMEM_BUDGET`; keeping the threshold
#: HERE, next to the estimator, means a retune changes every consumer
#: (sstts.synthesize and the profiling scripts) together.
FUSED_VMEM_BUDGET = 12 * 1024 * 1024


def vmem_estimate_bytes(
    B: int, T: int, Dm: int, A: int, n_params: int
) -> int:
    """Rough VMEM footprint: weights (bf16) + memory/keys (bf16) + the f32
    (B, T, A) attention temporary + outputs/scratch.  Used by callers
    (sstts.synthesize) to fall back to the XLA scan when a workload would
    not fit on-core (gate: <= FUSED_VMEM_BUDGET)."""
    return (
        2 * n_params
        + 2 * B * T * (Dm + A)
        + 4 * B * T * A
        + 4 * B * (Dm + A) * 4
        + 4 * B * T
    )
