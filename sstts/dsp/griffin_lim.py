"""On-device Griffin-Lim phase reconstruction.

The reference runs Griffin-Lim on host as a sequential librosa loop
(`audio/synthesis.py:spectrogram_to_wav` — SURVEY.md §3.5).  Here the entire
loop lives inside the compiled program as a `lax.fori_loop` whose body is a
batched iSTFT -> STFT phase projection (`jnp.fft` + static reshape OLA from
`sstts.dsp.stft`), so a whole batch of utterances reconstructs in one XLA
program with zero host round-trips.  The RTF target (BASELINE.md) includes
this loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sstts.config import Config
from sstts.dsp import ops
import sstts.dsp.stft as stft_mod

#: FFT implementation for the Griffin-Lim inner loop.  "dft_default" =
#: direct rDFT GEMMs at single-pass bf16 precision.  Measured on v5e
#: (B=32 x 800 frames x 60 iters, compute only): 0.48s vs 0.82s ("dft_high",
#: bf16x3) vs 1.8s ("xla", jnp.fft).  Quality: spectral convergence on a
#: harmonic test signal is 0.106 (dft_default) vs 0.118 (dft_high) vs 0.122
#: (xla) — the bf16 rounding perturbs the zero-phase init the way a random
#: phase init would, and GL converges at least as well.  Feature extraction
#: always uses the f32-exact default path; the mel-L1 gate is unaffected.
GL_FFT_IMPL = "dft_default"

#: Data path between the two DFT GEMMs of a Griffin-Lim iteration:
#: "banded" = single fused banded shift-add in the frames domain
#: (`sstts.dsp.reproject`, one XLA fusion, no time-domain temporaries);
#: "composed" = explicit overlap-add -> normalize -> reflect-pad -> re-frame
#: (the reference formulation, kept as the correctness oracle).  Both are
#: bit-comparable up to f32 summation order (tests/test_dsp.py).
GL_DATA_PATH = "banded"

#: Iteration fusion for the banded loop: "split" = iSTFT GEMM, Pallas
#: reprojection, STFT GEMM, and renorm as separate XLA ops (spectrum and
#: frames round-trip HBM between stages); "semi" = GEMM1 stays in XLA and
#: reprojection + analysis GEMM + renorm (+ momentum extrapolation) fuse
#: into one Pallas kernel (`gl_fused.fused_reproject_analyze`) — two fewer
#: full-array HBM round-trips per iteration; "fused" = the whole iteration
#: as one Pallas kernel (`sstts.dsp.gl_fused`).  "split_xla" = split
#: iteration with the XLA banded reprojection (no Pallas custom calls —
#: required under a GSPMD-partitioned mesh program, which cannot shard
#: opaque custom calls; `Synthesizer` selects it automatically when given
#: a mesh).  Default "auto" = "semi" on TPU, "split" elsewhere (the Pallas
#: kernels run interpret-mode off-TPU — tests only).  Round-3 chained
#: in-program A/B on v5e at the HEADLINE shapes (b=32 x 800,
#: scripts/profile_gl_semi.py, same window): GL-60 split 140.9 ms vs semi
#: 125.8 ms (and GL-30 @ m=0.99: split 80.1 vs semi 76.6 ms) — the
#: semi-fusion's traffic saving wins where the fully fused kernel's
#: in-kernel GEMM1 lost (round-2: split 13.3 vs fused 14.3 ms at b=4).
#: The fused kernel's remaining value is compile cost: local Mosaic
#: compiles in seconds where the split/semi XLA graph pays the remote
#: compile service (minutes when degraded), so serving stacks (bench.py)
#: still probe it as a candidate.
GL_ITER_IMPL = "auto"


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iters: int,
    length: int,
    momentum: float = 0.0,
    fft_impl: str = "default",
    iter_impl: str | None = None,
) -> jnp.ndarray:
    """(..., n_frames, bins) magnitude -> (..., length) waveform.

    Deterministic zero-phase init, matching `reference.griffin_lim` at
    momentum=0.  momentum>0 enables the accelerated ("fast") Griffin-Lim
    update (Perraudin et al. 2013): the projected spectrum is extrapolated by
    `momentum * (c_t - c_{t-1})` before taking the phase.  Quality-gated at
    flagship shapes on v5e (scripts/gl_momentum_gate.py, 2026-08-19,
    b=4 x 800 frames, float64-oracle spectral convergence): GL-30 @ m=0.99
    reaches 0.824x classic GL-60's error (GL-40 @ 0.99: 0.710x; GL-25 @
    0.99: 0.919x — all BETTER than 60 classic iterations) at half the
    in-program cost (7.1 vs 13.8 ms, split path).  Serving stacks probe
    momentum candidates (bench.py); the config default stays the
    reference-parity classic GL-60.

    "dft*" impls run the loop in pure real arithmetic — (re, im) arrays, two
    direct GEMMs per transform, no complex dtype and no concat/slice
    materializations — with bf16 storage under "dft_default" (halves the
    loop's HBM traffic; bf16 phase noise measurably *helps* convergence, see
    GL_FFT_IMPL).  The final synthesis pass always runs f32.
    """
    magnitude = magnitude.astype(jnp.float32)
    n_frames = magnitude.shape[-2]
    if 1 + length // hop_length < n_frames:
        raise ValueError(
            f"length={length} too short for {n_frames} frames at hop={hop_length}"
        )
    # Validate the iteration knob HERE so the complex ("xla"/"default")
    # path rejects typos and the fused+momentum incompatibility too — it
    # ignores iter_impl otherwise, and a silent ignore hides config errors.
    resolved_iter = iter_impl or GL_ITER_IMPL
    if resolved_iter not in ("auto", "split", "split_xla", "fused", "semi"):
        raise ValueError(
            f"unknown griffin_lim iter_impl {resolved_iter!r}; expected one "
            "of 'auto', 'split', 'split_xla', 'fused', 'semi'"
        )
    if momentum > 0.0 and resolved_iter == "fused":
        raise ValueError(
            "iter_impl='fused' does not support griffin_lim_momentum > 0 "
            "(the fused kernel folds renorm into the iteration); use "
            "'split', 'semi', or momentum=0"
        )
    _DFT_PRECISION = {
        "dft_default": jax.lax.Precision.DEFAULT,
        "dft_high": jax.lax.Precision.HIGH,
        "dft_highest": jax.lax.Precision.HIGHEST,
    }
    if fft_impl.startswith("dft"):
        if fft_impl not in _DFT_PRECISION:
            raise ValueError(
                f"unknown griffin_lim fft_impl {fft_impl!r}; valid: "
                "'default', 'xla', "
                + ", ".join(repr(k) for k in _DFT_PRECISION)
            )
        return _griffin_lim_real(
            magnitude, n_fft, hop_length, win_length, n_iters, length,
            momentum,
            loop_dtype=jnp.bfloat16 if fft_impl == "dft_default" else jnp.float32,
            precision=_DFT_PRECISION[fft_impl],
            iter_impl=resolved_iter,
        )

    def project(angles):
        return stft_mod.istft(
            magnitude * angles, n_fft, hop_length, win_length, length,
            fft_impl=fft_impl,
        )

    def body(_, carry):
        angles, prev_s = carry
        y = project(angles)
        s = stft_mod.stft(y, n_fft, hop_length, win_length, fft_impl=fft_impl)
        s = s[..., :n_frames, :]
        if momentum > 0.0:
            extrap = s + momentum * (s - prev_s)
        else:
            extrap = s
        denom = jnp.maximum(jnp.abs(extrap), 1e-16)
        # exp(i * angle(.)) without trig.
        return extrap / denom, s

    angles0 = jnp.ones_like(magnitude, dtype=jnp.complex64)
    s0 = jnp.zeros_like(magnitude, dtype=jnp.complex64)
    angles, _ = jax.lax.fori_loop(0, n_iters, body, (angles0, s0))
    return project(angles)


def _griffin_lim_real(
    magnitude: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iters: int,
    length: int,
    momentum: float,
    loop_dtype,
    precision,
    iter_impl: str | None = None,
) -> jnp.ndarray:
    """Real-arithmetic GL loop over direct-DFT GEMMs (see `griffin_lim`)."""
    from sstts.dsp import fft as mmfft
    from sstts.dsp.stft import _window, _window_sum_sq, frame_signal, overlap_add  # noqa: F401

    n_frames = magnitude.shape[-2]
    window_np = _window(n_fft, win_length)
    inv_wss_full = _window_sum_sq(n_fft, hop_length, win_length, n_frames)
    # Window-support-reduced transform (see fft._rdft_matrices_windowed):
    # frames carry only the `w_len` nonzero window taps, the window folds
    # into the matrices, and OLA runs over fewer overlap phases.
    lo, w_len, cos_w, nsin_w, inv_re_w, inv_im_w = (
        mmfft._rdft_matrices_windowed(n_fft, window_np)
    )
    # Trimmed normalization envelope: OLA output starts at padded position
    # `lo`; the final signal is padded positions [n_fft//2, n_fft//2+length).
    start = n_fft // 2 - lo
    inv_wss = jnp.asarray(
        inv_wss_full[n_fft // 2 : n_fft // 2 + length]
    )
    mag_d = magnitude.astype(loop_dtype)

    def synth(sr, si, prec, dtype):
        """(re, im) spectra -> time signal (one reduced iSTFT)."""
        mm = lambda a, b: jnp.matmul(  # noqa: E731
            a, b.astype(a.dtype), precision=prec,
            preferred_element_type=jnp.float32,
        )
        frames = (mm(sr, inv_re_w) + mm(si, inv_im_w)).astype(dtype)
        y = overlap_add(frames, hop_length)
        short = start + length - y.shape[-1]
        if short > 0:  # tail beyond the last frame's window support
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, short)])
        return y[..., start : start + length] * inv_wss.astype(dtype)

    def analyze(y, prec, dtype):
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        yp = jnp.pad(y, pad, mode="reflect")
        frames = frame_signal(yp[..., lo:], w_len, hop_length)
        mm = lambda a, b: jnp.matmul(  # noqa: E731
            a, b.astype(a.dtype), precision=prec,
            preferred_element_type=jnp.float32,
        )
        sr = mm(frames, cos_w)[..., :n_frames, :].astype(dtype)
        si = mm(frames, nsin_w)[..., :n_frames, :].astype(dtype)
        return sr, si

    if GL_DATA_PATH == "banded":
        return _loop_banded(
            magnitude, mag_d, n_fft, hop_length, win_length, n_iters, length,
            momentum, loop_dtype, precision,
            (w_len, cos_w, nsin_w, inv_re_w, inv_im_w), synth,
            iter_impl=iter_impl or GL_ITER_IMPL,
        )

    def normalize(er, ei):
        # Normalize in f32 (rsqrt under bf16 squaring underflows quiet bins).
        er32, ei32 = er.astype(jnp.float32), ei.astype(jnp.float32)
        inv = jax.lax.rsqrt(er32 * er32 + ei32 * ei32 + 1e-24)
        return (er32 * inv).astype(loop_dtype), (ei32 * inv).astype(loop_dtype)

    def body(_, carry):
        if momentum > 0.0:
            ar, ai, pr, pi = carry
        else:
            ar, ai = carry
        y = synth(mag_d * ar, mag_d * ai, precision, loop_dtype)
        sr, si = analyze(y, precision, loop_dtype)
        if momentum > 0.0:
            m = loop_dtype(momentum)
            ar, ai = normalize(sr + m * (sr - pr), si + m * (si - pi))
            return ar, ai, sr, si
        return normalize(sr, si)

    ar0 = jnp.ones_like(mag_d)
    ai0 = jnp.zeros_like(mag_d)
    init = (ar0, ai0, ai0, ai0) if momentum > 0.0 else (ar0, ai0)
    out = jax.lax.fori_loop(0, n_iters, body, init)
    ar, ai = out[0], out[1]
    # Final synthesis in f32 at HIGH precision for output quality.
    return synth(
        magnitude * ar.astype(jnp.float32),
        magnitude * ai.astype(jnp.float32),
        jax.lax.Precision.HIGH, jnp.float32,
    )


def _loop_banded(
    magnitude, mag_d, n_fft, hop_length, win_length, n_iters, length,
    momentum, loop_dtype, precision, mats, synth, iter_impl=None,
):
    """GL loop over the fused banded data path, minimum-HBM-traffic layout.

    The iteration state is the *magnitude-scaled* spectrum — not the bare
    phase — stored flat as (..., n_frames, 2*Hp) with the real half in lanes
    [0, Hp) and the imaginary half in [Hp, 2*Hp), Hp = bins rounded up to
    the 128-lane width.  Consequences, all HBM-bandwidth wins (the loop's
    GEMMs are MXU-bound but everything else here is traffic-bound):

    * each direction of the DFT is ONE dot (contraction/output dim 2*Hp)
      instead of two dots + add/concat — no f32 partial-product arrays;
      the lane padding costs nothing because XLA pads 1025-wide GEMM
      operands to 1152 lanes internally anyway;
    * the per-iteration `magnitude * angle` multiply folds into the phase
      normalization: one fused pass computes
      ``q' = s * (mag * rsqrt(re^2 + im^2))`` where the old layout needed
      separate normalize and rescale passes over the full spectrum;
    * the two GEMMs emit/consume frames at the Pallas reprojection
      kernel's lane width, so no pad/slice copies remain around it.
    """
    from sstts.dsp.reproject import reproject

    w_len, cos_w, nsin_w, inv_re_w, inv_im_w = mats
    half = magnitude.shape[-1]
    # Nyquist packing (bf16 production path only): for even n_fft the DC and
    # Nyquist bins are purely real, so Nyquist's real coefficient rides in
    # DC's always-zero imaginary slot — the classic rFFT packing.  The loop
    # then runs on exactly half-1 complex slots (1024 for n_fft=2048), so
    # the flat GEMM contraction/output dim is 2048 instead of a 1025-wide
    # spectrum padded to 1152 lanes: 11% of the loop's MXU work was padding.
    # The one approximation: the fused phase projection normalizes the
    # (DC, Nyquist) pair by their JOINT magnitude for the loop's iterations
    # (2 of 1025 bins, both carrying negligible energy for pre-emphasized
    # speech); the final synthesis below unpacks and projects both exactly.
    # (iter_impl strings and the fused+momentum incompatibility are
    # validated by griffin_lim() for every fft_impl path.)
    iter_impl = iter_impl or GL_ITER_IMPL
    if iter_impl == "auto":
        # Measured disposition (round 3, scripts/profile_gl_semi.py, same
        # window): at headline shapes (b=32 x 800) semi beats split GL-60
        # 125.8 vs 140.9 ms and GL-30@m=0.99 76.6 vs 80.1 ms.  Off-TPU the
        # Pallas kernels only run interpret-mode, so split is the default.
        iter_impl = "semi" if jax.default_backend() == "tpu" else "split"
    # "split_xla": mesh-safe split iteration, Pallas-free data path.
    reproject_impl = "xla" if iter_impl == "split_xla" else "auto"
    # Nyquist packing requires an even n_fft: only then is the top bin a
    # purely real Nyquist coefficient whose imaginary slot is free (for odd
    # n_fft the top bin is genuinely complex — packing would corrupt it).
    packed = (
        loop_dtype == jnp.bfloat16
        and n_fft % 2 == 0
        and half % 2 == 1
        and half > 2
    )
    hb = half - 1 if packed else half
    # The fused/semi iteration kernels require the 128-lane-padded layout
    # even in interpret mode, and "split_xla" pads on CPU too so tests
    # exercise the exact TPU-mesh geometry (the padded-lane XLA
    # reprojection).
    if jax.default_backend() == "tpu" or iter_impl in (
        "fused", "split_xla", "semi"
    ):
        hp = -(-hb // 128) * 128
        wp = -(-w_len // 128) * 128
    else:
        hp, wp = hb, w_len

    def rowpad(m):  # (rows <= hp, w_len) -> (hp, wp)
        return jnp.pad(m, [(0, hp - m.shape[0]), (0, wp - w_len)])

    def colpad(m):  # (w_len, cols <= hp) -> (wp, hp)
        return jnp.pad(m, [(0, wp - w_len), (0, hp - m.shape[1])])

    if packed:
        # Real-half slots: bins [0, hb); imag-half slots: lane 0 = Nyquist
        # (real), lanes [1, hb) = imaginary parts of bins [1, hb).
        w_inv = jnp.concatenate(
            [
                rowpad(inv_re_w[:hb]),
                rowpad(
                    jnp.concatenate([inv_re_w[hb:], inv_im_w[1:hb]], axis=0)
                ),
            ],
            axis=0,
        )
        w_fwd = jnp.concatenate(
            [
                colpad(cos_w[:, :hb]),
                colpad(
                    jnp.concatenate([cos_w[:, hb:], nsin_w[:, 1:hb]], axis=1)
                ),
            ],
            axis=1,
        )
        lane_pad = [(0, 0)] * (mag_d.ndim - 1) + [(0, hp - hb)]
        mag_r = jnp.pad(mag_d[..., :hb], lane_pad)
        mag_i = jnp.pad(
            jnp.concatenate([mag_d[..., hb:], mag_d[..., 1:hb]], axis=-1),
            lane_pad,
        )
    else:
        # (2*Hp, Wp): [padded inv_re ; padded inv_im], (Wp, 2*Hp) analysis.
        w_inv = jnp.concatenate([rowpad(inv_re_w), rowpad(inv_im_w)], axis=0)
        w_fwd = jnp.concatenate([colpad(cos_w), colpad(nsin_w)], axis=1)
        lane_pad = [(0, 0)] * (mag_d.ndim - 1) + [(0, hp - hb)]
        mag_r = jnp.pad(mag_d, lane_pad)
        mag_i = mag_r

    mm = lambda a, b: jnp.matmul(  # noqa: E731
        a, b.astype(a.dtype), precision=precision,
        preferred_element_type=jnp.float32,
    )

    def iterate(q):
        frames = mm(q, w_inv).astype(loop_dtype)
        frames = reproject(
            frames, n_fft, hop_length, win_length, length,
            impl=reproject_impl,
        )
        # Cast in the GEMM epilogue: the renorm pass then reads the spectrum
        # at loop precision (half the HBM traffic of an f32 dot output).
        return mm(frames, w_fwd).astype(loop_dtype)

    def renorm(s):
        """One fused pass: phase-normalize AND rescale by the magnitude."""
        sr = s[..., :hp].astype(jnp.float32)
        si = s[..., hp:].astype(jnp.float32)
        inv = jax.lax.rsqrt(sr * sr + si * si + 1e-24)
        return jnp.concatenate(
            [
                (sr * inv * mag_r.astype(jnp.float32)).astype(loop_dtype),
                (si * inv * mag_i.astype(jnp.float32)).astype(loop_dtype),
            ],
            axis=-1,
        )

    # Zero-phase init: q = mag * (1 + 0j) per bin; in the packed layout the
    # Nyquist slot (imag-half lane 0) starts at its magnitude, sign +1.
    qi0 = (
        jnp.pad(
            mag_i[..., :1], [(0, 0)] * (mag_i.ndim - 1) + [(0, hp - 1)]
        )
        if packed
        else jnp.zeros_like(mag_r)
    )
    q0 = jnp.concatenate(
        [mag_r.astype(loop_dtype), qi0.astype(loop_dtype)], axis=-1
    )
    if iter_impl == "semi":
        # Semi-fused iteration: GEMM1 in XLA, then one Pallas kernel for
        # reprojection + analysis GEMM + renorm (+ momentum extrapolation).
        from sstts.dsp.gl_fused import fused_reproject_analyze

        mag2 = jnp.concatenate(
            [mag_r.astype(loop_dtype), mag_i.astype(loop_dtype)], axis=-1
        )
        interp = jax.default_backend() != "tpu"

        if momentum > 0.0:

            def body(_, carry):
                q, prev = carry
                frames = mm(q, w_inv).astype(loop_dtype)
                return fused_reproject_analyze(
                    frames, mag2, w_fwd, n_fft, hop_length, win_length,
                    length, prev=prev, momentum=momentum,
                    precision=precision, interpret=interp,
                )

            q, _ = jax.lax.fori_loop(
                0, n_iters, body, (q0, jnp.zeros_like(q0))
            )
        else:

            def body(_, q):
                frames = mm(q, w_inv).astype(loop_dtype)
                return fused_reproject_analyze(
                    frames, mag2, w_fwd, n_fft, hop_length, win_length,
                    length, precision=precision, interpret=interp,
                )

            q = jax.lax.fori_loop(0, n_iters, body, q0)
    elif momentum > 0.0:
        m = np.float32(momentum)

        def body(_, carry):
            q, prev = carry
            s = iterate(q)
            prev32 = prev.astype(jnp.float32)
            extrap = s + m * (s - prev32)
            return renorm(extrap), s.astype(loop_dtype)

        q, _ = jax.lax.fori_loop(
            0, n_iters, body, (q0, jnp.zeros_like(q0))
        )
    elif iter_impl == "fused":
        from sstts.dsp.gl_fused import fused_gl_iteration

        mag2 = jnp.concatenate(
            [mag_r.astype(loop_dtype), mag_i.astype(loop_dtype)], axis=-1
        )
        interp = jax.default_backend() != "tpu"
        q = jax.lax.fori_loop(
            0, n_iters,
            lambda _, q: fused_gl_iteration(
                q, mag2, w_inv, w_fwd, n_fft, hop_length, win_length,
                length, precision, interpret=interp,
            ),
            q0,
        )
    else:
        q = jax.lax.fori_loop(0, n_iters, lambda _, q: renorm(iterate(q)), q0)

    # Final synthesis in f32 at HIGH precision for output quality: recover
    # the unit phase from the scaled spectrum, apply the exact f32 magnitude.
    # In the packed layout this unpacks DC/Nyquist and projects each exactly
    # (their imaginary parts are identically zero).
    if packed:
        qr = q[..., :hp].astype(jnp.float32)
        qi = q[..., hp:].astype(jnp.float32)
        zero1 = jnp.zeros_like(qr[..., :1])
        sr = jnp.concatenate([qr[..., :hb], qi[..., :1]], axis=-1)
        si = jnp.concatenate([zero1, qi[..., 1:hb], zero1], axis=-1)
    else:
        sr = q[..., :half].astype(jnp.float32)
        si = q[..., hp : hp + half].astype(jnp.float32)
    inv = jax.lax.rsqrt(sr * sr + si * si + 1e-24)
    return synth(
        magnitude * (sr * inv), magnitude * (si * inv),
        jax.lax.Precision.HIGH, jnp.float32,
    )


def spectrogram_to_wav(
    linear_norm: jnp.ndarray, cfg: Config, length: int
) -> jnp.ndarray:
    """Normalized linear spectrogram -> waveform (reference `synthesis.py` API).

    De-normalize dB -> magnitude, raise to the Griffin-Lim power, reconstruct
    phase, de-emphasize.  Fully on device.
    """
    ds, inf = cfg.dataset, cfg.inference
    db = ops.inv_normalize_decibel(linear_norm, ds.ref_level_db, ds.min_level_db)
    mag = ops.decibel_to_magnitude(db) ** inf.griffin_lim_power
    y = griffin_lim(
        mag, ds.n_fft, ds.hop_len, ds.win_len, inf.griffin_lim_iters, length,
        momentum=inf.griffin_lim_momentum,
        fft_impl=inf.griffin_lim_fft_impl or GL_FFT_IMPL,
        iter_impl=inf.griffin_lim_iter_impl,
    )
    return ops.deemphasis(y, ds.preemphasis)
