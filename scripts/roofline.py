"""Absolute hardware-utilization (roofline) accounting for the hot phases.

Every perf record in this repo before round 5 was relay-window-relative
RTF, which CLAUDE.md documents fluctuates ~2x between session windows.
This harness grounds the story in absolute terms: for each hot phase at
headline shapes it states an analytic FLOP and HBM-byte model (the
arithmetic is in the code, one function per phase), measures the achieved
in-program time with the chained method (K data-dependent applications
inside ONE jit call, empty-program baseline subtracted — immune to the
relay's per-call dispatch floor), and prints achieved GFLOP/s / GB/s as a
fraction of the chip's peaks.  The binding roofline (MXU vs HBM) falls out
of the arithmetic intensity vs the ridge point.

Peaks (TPU v5e, one chip, public spec): 197 TFLOP/s bf16 MXU,
819 GB/s HBM.  Ridge: 197e12/819e9 = 241 FLOP/byte — phases above that
intensity are MXU-bound, below it HBM-bound (if neither binds, the phase
is latency/occupancy-bound and the table says so).

Phases (SURVEY §6 / round-4 verdict ask #1):
  gl_gemm     one support-reduced windowed rDFT analysis GEMM pass —
              the GL loop's dominant op (sstts/dsp/fft.py)
  gl60 / gl25 whole griffin_lim calls (semi-fused TPU default) at the
              classic GL-60 and serving fast-GL-25@m0.99 operating
              points; iters=0 arms isolate fixed prologue/epilogue cost
              and the slope is the per-iteration cost
  ar_decode   fused Pallas AR decoder, b=32 x S=160 (serving prepare)
  features    wav->features (STFT/mel) at the train-step shape
  model_fwd   full teacher-forced forward incl. loss (b=32 x 400)
  train_step  forward + backward + Adam (the config-3 step)

Measurement discipline: the relay's per-call overhead DRIFTS several ms
between minutes (not just between sessions), so a chained differential is
only trustworthy when the chain total dwarfs the drift — a K=4 chain of a
0.4 ms GEMM produced a physically impossible 153%-of-peak reading during
development (K=128 with bracketed baselines: a stable 90%).  Each phase
therefore gets its own K targeting a >=40 ms chain, and the empty-program
baseline is measured BEFORE AND AFTER each phase (mean used, drift
printed).

Usage: timeout 3600 python scripts/roofline.py [--json PATH]
Run alone on the host (CLAUDE.md: 1-core host, never two compile-heavy
processes) and note the printed dispatch marker for window context.
SSTTS_ROOFLINE_SMOKE=1 shrinks every shape and runs on CPU — a script
correctness check only (utilization numbers are meaningless there).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SMOKE = bool(os.environ.get("SSTTS_ROOFLINE_SMOKE"))
if SMOKE:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from scripts._common import timed  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# TPU v5e single-chip peaks (public spec sheet).
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0
RIDGE = PEAK_BF16_TFLOPS * 1e12 / (PEAK_HBM_GBPS * 1e9)  # ~241 FLOP/byte

# Per-phase chain lengths: small phases need long chains (see module
# docstring); whole-GL calls are already 60-530 ms at K=4.
PHASE_K = {
    "gl_gemm": 128,
    "gl_call": 4,
    "ar_decode": 32,
    "features": 16,
    "model_fwd": 8,
    "train_step": 8,
}
if SMOKE:
    PHASE_K = {k: 2 for k in PHASE_K}
JSON_PATH = None
if "--json" in sys.argv:
    JSON_PATH = sys.argv[sys.argv.index("--json") + 1]

# Headline shapes (BASELINE config 2 / config 3).
B_SYN, T_SYN = 32, 800          # synthesis: 32 x 10 s utterances
B_TR, T_TR, L_TR = 32, 400, 128  # train step: config 3
if SMOKE:
    B_SYN, T_SYN = 2, 64
    B_TR, T_TR, L_TR = 2, 40, 16
N_FFT, HOP, WIN = 2048, 275, 1102
H = N_FFT // 2 + 1              # 1025 linear bins
R_SYN = B_SYN * T_SYN           # 25600 spectrogram rows
WP = -(-WIN // 128) * 128       # 1152: lane-padded window support


def _w_len() -> int:
    """Nonzero support of the periodic Hann window (matches fft.py)."""
    n = np.arange(WIN)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * n / WIN)
    nz = np.nonzero(w > 0)[0]
    return int(nz[-1]) + 1 - int(nz[0])


W_LEN = _w_len()  # 1101


# ---------------------------------------------------------------- models
# Each returns (flops, bytes) for ONE application at the stated shape.
# FLOPs are useful arithmetic (2*M*N*K per GEMM, no pad waste); bytes are
# the principal HBM arrays (reads + writes), stated per term.

def model_gl_gemm():
    """One analysis rDFT GEMM pass: [R, w_len] x [w_len, 2h] (cos|nsin
    packed), bf16 in / f32 accumulate.  The GL loop's synthesis pass is
    the transpose shape with identical counts."""
    flops = 2 * R_SYN * W_LEN * (2 * H)
    bytes_ = (
        R_SYN * WP * 2          # frames in, bf16 (lane-padded as stored)
        + WP * 2 * H * 2        # DFT matrices, bf16 (VMEM-resident, ~1 read)
        + R_SYN * 2 * H * 2     # spectrum out, bf16
    )
    return flops, bytes_


def model_gl_iter(momentum: bool):
    """One semi-fused GL iteration: synthesis GEMM (XLA) + Pallas kernel
    (banded reprojection + analysis GEMM + renorm [+ momentum]).  The
    banded shift-add is ~2*ceil(win/hop)+1 = 9 lane-shifted adds (VPU)."""
    gemm = 2 * R_SYN * W_LEN * (2 * H)
    flops = 2 * gemm + 9 * R_SYN * WP * 2
    bytes_ = (
        R_SYN * 2 * H * 2       # spectrum re|im read (synthesis GEMM)
        + R_SYN * WP * 2        # frames written by GEMM1, bf16
        + R_SYN * WP * 2        # frames read by the kernel
        + R_SYN * H * 2         # target magnitude read, bf16
        + R_SYN * 2 * H * 2     # projected spectrum written
    )
    if momentum:
        # Fast-GL extrapolation keeps the previous projected spectrum as
        # carry: one extra read + write of (re, im) per iteration.
        bytes_ += 2 * R_SYN * 2 * H * 2
    return flops, bytes_


def model_ar_decode(params, S: int):
    """Fused AR decoder, b=32, S steps: per step every decoder-cell matmul
    applies once per batch row (the key projection is hoisted, like the
    XLA path).  + Bahdanau score/context: tanh(k+q)@v and alpha@memory
    over L memory positions per step."""
    cell = params["decoder_cell"]
    matmul_params = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(cell)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.ndim >= 2 and "memory_proj" not in name:
            matmul_params += leaf.size
    Dm, Da = 256, 256
    flops = 2 * B_SYN * S * matmul_params + B_SYN * S * L_TR * (3 * Da + 2 * Dm)
    bytes_ = (
        matmul_params * 2           # weights, bf16 (VMEM-resident: ~1 read)
        + B_SYN * L_TR * Dm * 2 * 2  # memory + keys, bf16
        + B_SYN * S * (400 + 5) * 4  # frames + stops out, f32
    )
    return flops, bytes_


def model_tacotron(params, B, L, S, T):
    """Teacher-forced forward matmul/conv FLOPs from the parameter tree:
    each (in, out) kernel applies 2*in*out per position, each (k, cin,
    cout) conv 2*k*cin*cout per position; positions = L for the encoder
    (and the attention key projection), S for the decoder cell, T for the
    post-net/linear projection.  Embedding is a gather (no FLOPs).
    + Bahdanau score/context as in model_ar_decode."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.ndim < 2 or name.startswith("embedding"):
            continue
        if leaf.ndim == 3:
            k, cin, cout = leaf.shape
            per_pos = 2 * k * cin * cout
        else:
            cin, cout = leaf.shape
            per_pos = 2 * cin * cout
        if name.startswith(("encoder_",)) or "memory_proj" in name:
            n = L
        elif name.startswith("decoder_cell"):
            n = S
        else:  # post_cbhg, linear_proj
            n = T
        total += per_pos * n
    total += S * L * (3 * 256 + 2 * 256)
    return total * B


def model_features():
    """wav->features at (B_TR, T_TR): pre-emphasis + framing + rfft-2048
    (XLA FFT; ~2.5*N*log2 N flop-equivalent per frame) + |.| + mel matmul
    + two dB/normalize passes.  Byte model: principal arrays only."""
    Rf = B_TR * T_TR
    n_samples = (T_TR - 1) * HOP
    flops = (
        Rf * 2.5 * N_FFT * np.log2(N_FFT)  # rfft
        + 2 * Rf * H * 80                  # mel filterbank GEMM
        + 6 * Rf * H                       # |.|, dB, normalize passes
        + 2 * B_TR * n_samples             # pre-emphasis
    )
    bytes_ = (
        B_TR * n_samples * 4      # samples read
        + Rf * N_FFT * 4 * 2      # framed windows write+read, f32
        + Rf * H * 8 * 2          # complex spectrum write+read
        + Rf * H * 4 * 3          # |S|, linear dB passes
        + Rf * 80 * 4 * 2         # mel out + dB pass
    )
    return int(flops), int(bytes_)


# ------------------------------------------------------------ measurement

def main() -> None:
    from sstts.config import Config
    from sstts.dsp import griffin_lim as gl
    from sstts.dsp.ops import wav_to_features
    from sstts.model.losses import frame_mask_from_lengths, tacotron_loss
    from sstts.model.tacotron import Tacotron
    from sstts.ops.pallas_decoder import fused_decode
    from sstts.train import _make_step_body, build_model, create_state

    cfg = Config()
    rng = np.random.default_rng(0)
    results: dict[str, dict] = {}

    # Window-health marker first: every absolute number below is
    # in-program (marker-independent), but record the window anyway.
    from scripts._common import dispatch_marker_ms

    marker = dispatch_marker_ms()
    print(f"dispatch marker: {marker:.1f} ms/call "
          f"({'healthy' if marker < 10 else 'DEGRADED'} window)", flush=True)

    def record(tag, ms, flops, bytes_, note=""):
        tf = flops / (ms * 1e-3) / 1e12
        gb = bytes_ / (ms * 1e-3) / 1e9
        intensity = flops / bytes_
        bound = "MXU" if intensity > RIDGE else "HBM"
        results[tag] = {
            "ms": round(ms, 3),
            "gflop": round(flops / 1e9, 2),
            "mbytes": round(bytes_ / 1e6, 1),
            "tflops": round(tf, 1),
            "pct_mxu": round(100 * tf / PEAK_BF16_TFLOPS, 1),
            "gbps": round(gb, 1),
            "pct_hbm": round(100 * gb / PEAK_HBM_GBPS, 1),
            "intensity": round(intensity, 1),
            "bound": bound,
            "note": note,
        }
        print(
            f"  {tag:12s} {ms:8.2f} ms | {flops/1e9:8.1f} GFLOP "
            f"{tf:6.1f} TFLOP/s ({100*tf/PEAK_BF16_TFLOPS:5.1f}% MXU) | "
            f"{bytes_/1e6:7.1f} MB {gb:6.1f} GB/s "
            f"({100*gb/PEAK_HBM_GBPS:5.1f}% HBM) | {bound}-side {note}",
            flush=True,
        )

    def measure(tag, chain_jit, base_jit, args, k, reps=3):
        """Bracketed differential: base before AND after the chain (the
        per-call overhead drifts several ms between minutes — module
        docstring); per-application ms = (chain - mean(base)) / k."""
        b1 = timed(f"{tag} base", base_jit, *args)
        t = timed(f"{tag} x{k}", chain_jit, *args, reps=reps)
        b2 = timed(f"{tag} base'", base_jit, *args)
        if abs(b1 - b2) > 0.2 * max(t - (b1 + b2) / 2, 1e-9):
            print(f"  [{tag}] WARNING: base drift {b1:.1f}->{b2:.1f} ms is "
                  f">20% of the differential — treat with suspicion",
                  flush=True)
        return (t - (b1 + b2) / 2) / k

    # -- phase 1: one windowed rDFT analysis GEMM pass ------------------
    w_fwd = jax.random.normal(jax.random.PRNGKey(0), (WP, 2 * H), jnp.bfloat16)
    xw = jax.random.normal(jax.random.PRNGKey(1), (R_SYN, WP), jnp.bfloat16)
    Kg = PHASE_K["gl_gemm"]

    def chain_gemm(x):
        acc = jnp.float32(0.0)
        for _ in range(Kg):
            s = jnp.dot(x, w_fwd, preferred_element_type=jnp.float32)
            r = jnp.sum(jnp.abs(s))
            acc = acc + r
            x = x * (1.0 + (r * 1e-20).astype(x.dtype))
        return acc

    per = measure("gl_gemm", jax.jit(chain_gemm),
                  jax.jit(lambda v: jnp.sum(v) * 2.0), (xw,), Kg)
    f_, b_ = model_gl_gemm()
    record("gl_gemm", per, f_, b_,
           "one analysis DFT pass; synthesis pass is the same shape")

    # -- phases 2-3: whole GL calls, fixed + per-iter -------------------
    mag = jnp.asarray(rng.random((B_SYN, T_SYN, H), np.float32) ** 2)
    length = (T_SYN - 1) * HOP
    Kc = PHASE_K["gl_call"]

    def gl_chain(iters, mom):
        def f(m):
            acc = jnp.float32(0.0)
            for _ in range(Kc):
                y = gl.griffin_lim(
                    m, N_FFT, HOP, WIN, iters, length, momentum=mom,
                    fft_impl="dft_default", iter_impl="semi",
                ).astype(jnp.float32)
                s = jnp.sum(y)
                acc = acc + s
                m = m + (s * 1e-20).astype(m.dtype)
            return acc
        return jax.jit(f)

    base_mag = jax.jit(lambda m: jnp.sum(m) * 2.0)
    gl_ms = {}
    for tag, iters, mom in (
        ("gl0_m0", 0, 0.0), ("gl60_m0", 60, 0.0),
        ("gl0_m99", 0, 0.99), ("gl25_m99", 25, 0.99),
    ):
        gl_ms[tag] = measure(tag, gl_chain(iters, mom), base_mag, (mag,), Kc)

    per_iter_0 = (gl_ms["gl60_m0"] - gl_ms["gl0_m0"]) / 60
    per_iter_99 = (gl_ms["gl25_m99"] - gl_ms["gl0_m99"]) / 25
    f_, b_ = model_gl_iter(False)
    record("gl_iter_m0", per_iter_0, f_, b_,
           f"slope of semi GL-60 classic (fixed {gl_ms['gl0_m0']:.1f} ms)")
    f99, b99 = model_gl_iter(True)
    record("gl_iter_m99", per_iter_99, f99, b99,
           f"slope of semi GL-25@m0.99 (fixed {gl_ms['gl0_m99']:.1f} ms)")
    record("gl60_call", gl_ms["gl60_m0"], 60 * f_ + 2 * model_gl_gemm()[0],
           60 * b_, "whole classic GL-60 call incl. prologue/epilogue")
    record("gl25_call", gl_ms["gl25_m99"], 25 * f99 + 2 * model_gl_gemm()[0],
           25 * b99, "whole fast-GL serving call incl. prologue/epilogue")

    # -- phase 4: fused AR decoder --------------------------------------
    state = create_state(cfg)
    model = build_model(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ids = np.where(
        rng.random((B_SYN, L_TR)) < 0.9, rng.integers(1, 30, (B_SYN, L_TR)), 0
    ).astype(np.int32)
    ids[:, 0] = 1
    memory, mmask = jax.jit(
        lambda v, i, r: model.apply(
            v, i, False, method=Tacotron.encode, rngs={"dropout": r}
        )
    )(variables, jnp.asarray(ids), jax.random.PRNGKey(0))
    S_DEC = 8 if SMOKE else 160
    Kd = PHASE_K["ar_decode"]

    def chain_dec(m):
        acc = jnp.float32(0.0)
        for i in range(Kd):
            out = fused_decode(
                state.params["decoder_cell"], m, mmask, S_DEC,
                n_mels=cfg.dataset.n_mels,
                reduction=cfg.arch.reduction_factor,
                stop_threshold=2.0, seed=i, interpret=SMOKE,
                # pltpu.prng_seed has no CPU-interpret lowering; serving
                # behavior (dropout on) is measured on TPU only.
                apply_dropout=not SMOKE,
            )
            s = jnp.sum(out["mel"]).astype(jnp.float32)
            acc = acc + s
            m = m + (s * 1e-12).astype(m.dtype)
        return acc

    per = measure("ar_decode", jax.jit(chain_dec),
                  jax.jit(lambda m: jnp.sum(m) * 2.0), (memory,), Kd)
    f_, b_ = model_ar_decode(state.params, S_DEC)
    record("ar_decode", per, f_, b_,
           f"{S_DEC} sequential steps: latency-bound, see table note")

    # -- phases 5-7: train-side -----------------------------------------
    n_samples = (T_TR - 1) * HOP
    samples_f = jnp.asarray(
        (rng.standard_normal((B_TR, n_samples)) * 0.1).astype(np.float32)
    )
    batch = {
        "char_ids": jnp.asarray(ids),
        "text_len": jnp.asarray(np.maximum((ids != 0).sum(1), 1), jnp.int32),
        "samples": jnp.asarray(
            (rng.standard_normal((B_TR, n_samples)) * 3000).astype(np.int16)
        ),
        "n_frames": jnp.full((B_TR,), T_TR, jnp.int32),
        "loss_frames": jnp.full((B_TR,), T_TR, jnp.int32),
    }
    linear_gt, mel_gt = jax.jit(lambda s: wav_to_features(s, cfg.dataset))(samples_f)
    frame_mask = frame_mask_from_lengths(batch["n_frames"], mel_gt.shape[1])
    key = jax.random.PRNGKey(0)

    Kf = PHASE_K["features"]

    def chain_feat(s):
        acc = jnp.float32(0.0)
        for _ in range(Kf):
            lin, mel = wav_to_features(s, cfg.dataset)
            r = jnp.sum(mel)
            acc = acc + r
            s = s + r * 1e-12
        return acc

    base_samples = jax.jit(lambda s, *a: jnp.sum(s) * 2.0)
    per = measure("features", jax.jit(chain_feat), base_samples,
                  (samples_f,), Kf)
    f_, b_ = model_features()
    record("features", per, f_, b_,
           "XLA-FFT STFT + mel GEMM; FLOP-equivalent model")

    S_TR = T_TR // cfg.arch.reduction_factor
    fwd_flops = model_tacotron(state.params, B_TR, L_TR, S_TR, T_TR)
    # Forward touches params once; principal activations ~ (mel+linear) x
    # a few passes.  Stated as the param+IO floor, activations extra.
    fwd_bytes = (
        7.03e6 * 4
        + B_TR * T_TR * (H + 80) * 4 * 4
        + B_TR * n_samples * 4
    )

    Kw = PHASE_K["model_fwd"]

    def chain_fwd(s, r):
        acc = jnp.float32(0.0)
        for i in range(Kw):
            out, _ = model.apply(
                variables, batch["char_ids"],
                wav_to_features(s, cfg.dataset)[1], frame_mask, True,
                rngs={"dropout": jax.random.fold_in(r, i)},
                mutable=["batch_stats"],
            )
            loss, _ = tacotron_loss(
                out, mel_gt, linear_gt, batch["loss_frames"], cfg.arch,
                cfg.dataset, text_lengths=batch["text_len"],
            )
            acc = acc + loss
            s = s + (loss * 1e-12).astype(s.dtype)
        return acc

    per = measure("model_fwd", jax.jit(chain_fwd), base_samples,
                  (samples_f, key), Kw)
    feat_f, feat_b = model_features()
    record("model_fwd", per, fwd_flops + feat_f,
           int(fwd_bytes) + feat_b,
           "teacher-forced forward incl. features + loss")
    fwd_ms = results["model_fwd"]["ms"]

    step_body = _make_step_body(cfg)
    Ks = PHASE_K["train_step"]

    def chain_step(st, b):
        acc = jnp.float32(0.0)
        for _ in range(Ks):
            st, metrics = step_body(st, b)
            acc = acc + metrics["loss"]
        return acc

    per = measure(
        "train_step", jax.jit(chain_step),
        jax.jit(lambda st, b: jnp.sum(b["samples"]).astype(jnp.float32)),
        (state, batch), Ks,
    )
    # fwd + bwd ~= 3x matmul FLOPs (grad wrt inputs + weights) + Adam
    # elementwise (~10 FLOPs/param); bytes: params/grads/moments system
    # (4 reads + 3 writes of 7.03 M f32) + fwd IO + saved activations.
    step_flops = 3 * fwd_flops + feat_f + 10 * 7.03e6
    step_bytes = int(fwd_bytes) + feat_b + 7 * 7.03e6 * 4
    record("train_step", per, int(step_flops), step_bytes,
           f"fwd {fwd_ms:.1f} ms + bwd/adam {per - fwd_ms:.1f} ms; "
           "activations extra")

    # ------------------------------------------------------------ output
    print("\nRidge point: %.0f FLOP/byte; marker %.1f ms" % (RIDGE, marker))
    out = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "marker_ms": round(marker, 1),
        "chained_k": PHASE_K,
        "peaks": {"bf16_tflops": PEAK_BF16_TFLOPS, "hbm_gbps": PEAK_HBM_GBPS},
        "phases": results,
    }
    if JSON_PATH:
        Path(JSON_PATH).write_text(json.dumps(out, indent=1))
        print(f"wrote {JSON_PATH}")
    else:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
