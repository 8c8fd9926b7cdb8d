"""Quality-gate + time fast Griffin-Lim (momentum) against classic GL-60.

VERDICT round-2 #1: `griffin_lim_momentum` is implemented and unit-tested
(tests/test_dsp.py::test_griffin_lim_momentum_converges_faster) but was never
gated at flagship shapes or offered as a serving mode.  GL is ~85% of the
headline batch's compute, so "GL-60 quality in roughly half the iterations"
(Perraudin et al. 2013) is the largest untapped single-chip RTF lever.

This script measures BOTH halves of the decision at flagship DSP shapes
(n_fft=2048, hop=275, win=1102, T=800 — 10 s/utterance):

1. QUALITY: spectral convergence (mean |`|STFT(y)|` - mag| / mean mag,
   float64 oracle) of each (iters, momentum) candidate vs the GL-60
   classic baseline on a multi-tone + noise test batch.  Gate: candidate
   error <= 1.05x baseline error.
2. COST: chained in-program wall time (K data-dependent runs inside ONE
   jit call minus an empty-program baseline — the relay-honest methodology
   of scripts/profile_gl_chain.py).

A third arm (`--copy-synthesis N`) gates the candidates on COPY-SYNTHESIS
mel-L1: ground-truth linear features of N synthetic-corpus utterances are
vocoded through the full serving inverse chain (`spectrogram_to_wav`) and
the reconstruction's re-analyzed mel is compared to the ground truth —
the vocoder measured exactly as serving uses it, on speech-shaped inputs.

Usage: timeout 3600 python scripts/gl_momentum_gate.py [K] [B] [T]
           [--copy-synthesis N] [--skip-cost]
(run on the TPU via the default axon backend; add SSTTS_CPU=1 to force CPU)
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("K", nargs="?", type=int, default=4)
_ap.add_argument("B", nargs="?", type=int, default=4)
_ap.add_argument("T", nargs="?", type=int, default=800)
_ap.add_argument(
    "--copy-synthesis", type=int, default=0, metavar="N",
    help="also gate on copy-synthesis mel-L1 over N synthetic utterances",
)
_ap.add_argument(
    "--skip-cost", action="store_true",
    help="skip the chained in-program cost pass (quality arms only)",
)
_args = _ap.parse_args()
K, B, T = _args.K, _args.B, _args.T

# (iters, momentum) candidates; (60, 0.0) is the classic reference baseline.
CANDIDATES = [
    (60, 0.0),
    (40, 0.9),
    (40, 0.99),
    (35, 0.99),
    (30, 0.99),
    (30, 0.9),
    (25, 0.99),
    # Round-4 lower-iteration candidates: with the adpcm4 wire at
    # 0.52 B/sample the steady state is compute-bound again (GL-30 semi
    # ~80 ms vs wire 69-86 ms — docs/performance.md "steady-state floor"),
    # so a quality-PASSing GL-20 would put the wire back in charge.
    # Measured 2026-08-20 (B=4 x T=800 + 8-utterance copy-synthesis):
    #   GL-25 @ m=0.99: spectral 0.915x, copy-syn 0.997x  -> PASS both
    #   GL-20 @ m=0.99: spectral 1.046x, copy-syn 1.001x  -> PASS both
    #   GL-20 @ m=0.995: spectral 1.053x (> 1.05 bar)     -> FAIL
    #   GL-15 @ m=0.995: spectral 1.262x                  -> FAIL
    # The third (trained-checkpoint AR audio) arm runs via gl_trained_ab.py
    # (GL-25/GL-20 added to its CANDIDATES) once the round-4 flagship
    # checkpoint exists; they enter bench.py's probe queue only if that
    # arm also passes.
    (20, 0.99),
    (20, 0.995),
    (15, 0.995),
]


def main() -> None:
    if os.environ.get("SSTTS_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sstts.dsp import griffin_lim as gl
    from sstts.dsp import reference as ref

    n_fft, hop, win = 2048, 275, 1102
    length = (T - 1) * hop
    sr = 22050
    rng = np.random.default_rng(0)
    t = np.arange(length) / sr
    sigs = []
    for b in range(B):
        f0 = 180.0 + 60.0 * b
        y = sum(
            a * np.sin(2 * np.pi * f0 * h * t)
            for h, a in ((1, 0.5), (2, 0.25), (3, 0.12), (7, 0.06))
        )
        y += 0.03 * rng.standard_normal(length)
        sigs.append(y)
    mags = np.stack(
        [
            np.abs(ref.stft(y, n_fft, hop, win))[:T].astype(np.float32)
            for y in sigs
        ]
    )  # (B, T, 1025)

    def spectral_err(wavs):
        errs = []
        for b in range(B):
            got = np.abs(
                ref.stft(wavs[b].astype(np.float64), n_fft, hop, win)
            )[:T]
            errs.append(np.abs(got - mags[b]).mean() / mags[b].mean())
        return float(np.mean(errs))

    # --- quality pass (one compiled program per candidate) ---------------
    print(f"quality gate at B={B} x T={T} (length {length}):", flush=True)
    results = {}
    for iters, m in CANDIDATES:
        f = jax.jit(
            lambda mag, iters=iters, m=m: gl.griffin_lim(
                mag, n_fft, hop, win, iters, length, momentum=m,
                fft_impl="dft_default", iter_impl="split",
            )
        )
        wavs = np.asarray(f(mags))
        results[(iters, m)] = spectral_err(wavs)
        print(f"  GL-{iters} m={m}: err {results[(iters, m)]:.4f}", flush=True)
    base = results[(60, 0.0)]
    print("\ngate (err <= 1.05x GL-60 classic):", flush=True)
    for (iters, m), err in results.items():
        if (iters, m) == (60, 0.0):
            continue
        verdict = "PASS" if err <= base * 1.05 else "fail"
        print(
            f"  GL-{iters} m={m}: {err:.4f} vs {base:.4f} "
            f"({err / base:.3f}x) {verdict}",
            flush=True,
        )

    if _args.copy_synthesis:
        copy_synthesis(_args.copy_synthesis)
    if _args.skip_cost:
        return

    # --- cost pass (chained in-program) -----------------------------------
    mag_j = jnp.asarray(mags)

    def chain(iters, m):
        def f(mag):
            acc = jnp.float32(0.0)
            for _ in range(K):
                y = gl.griffin_lim(
                    mag, n_fft, hop, win, iters, length, momentum=m,
                    fft_impl="dft_default", iter_impl="split",
                ).astype(jnp.float32)
                s = jnp.sum(y)
                acc = acc + s
                mag = mag + (s * 1e-20).astype(mag.dtype)
            return acc
        return jax.jit(f)

    base_fn = jax.jit(lambda mag: jnp.sum(mag) * 2.0)
    t_base = timed("empty baseline", base_fn, mag_j)
    print(f"\nin-program cost (b={B}, T={T}, chained x{K}):", flush=True)
    for iters, m in CANDIDATES:
        tt = timed(f"GL-{iters} m={m} x{K}", chain(iters, m), mag_j)
        print(
            f"  GL-{iters} m={m}: {(tt - t_base) / K:.1f} ms in-program",
            flush=True,
        )


def copy_synthesis(n_utts: int) -> None:
    """Copy-synthesis quality arm: vocode GROUND-TRUTH linear features
    through the exact serving inverse chain (`spectrogram_to_wav`: dB
    de-norm -> GL power -> Griffin-Lim -> de-emphasis), re-analyze the
    reconstruction with `wav_to_features`, and compare its mel to the
    ground-truth mel.  Unlike the harmonic-batch arm above this runs on
    speech-shaped synthetic-corpus audio and through the full production
    feature/inverse code path (round-2 VERDICT next-step #1's second
    harness).  Gate: candidate mel-L1 <= 1.05x classic GL-60's."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sstts.config import Config
    from sstts.data import pipeline as pm
    from sstts.data.synthetic import make_utterances
    from sstts.dsp.griffin_lim import spectrogram_to_wav
    from sstts.dsp.ops import wav_to_features

    base_cfg = Config()
    base_cfg = base_cfg.replace(
        dataset=dataclasses.replace(base_cfg.dataset, dataset="synthetic")
    )
    ds = base_cfg.dataset
    utts = make_utterances(n_utts, ds)
    wavs = [pm.load_audio(u, base_cfg) for u in utts]
    # One fixed shape (static-shape contract): trim/zero-pad every
    # utterance to at most the harness T (the same shape knob as the
    # harmonic arm) so each candidate is ONE compiled program.
    frames = min(max(1 + len(y) // ds.hop_len for y in wavs), T)
    length = (frames - 1) * ds.hop_len
    batch = np.zeros((n_utts, length), np.float32)
    for i, y in enumerate(wavs):
        n = min(len(y), length)
        batch[i, :n] = np.asarray(y[:n], np.float32)

    gt_linear, gt_mel = (
        np.asarray(a)
        for a in jax.jit(lambda y: wav_to_features(y, ds))(batch)
    )
    print(
        f"\ncopy-synthesis gate ({n_utts} synthetic utterances, "
        f"{gt_linear.shape[1]} frames each):",
        flush=True,
    )
    results = {}
    for iters, m in CANDIDATES:
        cfg = base_cfg.replace(
            inference=dataclasses.replace(
                base_cfg.inference,
                griffin_lim_iters=iters,
                griffin_lim_momentum=m,
            )
        )
        recon = jax.jit(
            lambda lin, cfg=cfg: wav_to_features(
                spectrogram_to_wav(lin, cfg, length), ds
            )[1]
        )
        mel = np.asarray(recon(gt_linear))
        results[(iters, m)] = float(np.abs(mel - gt_mel).mean())
        print(
            f"  GL-{iters} m={m}: mel-L1 {results[(iters, m)]:.5f}",
            flush=True,
        )
    base = results[(60, 0.0)]
    print("gate (mel-L1 <= 1.05x GL-60 classic):", flush=True)
    for (iters, m), err in results.items():
        if (iters, m) == (60, 0.0):
            continue
        verdict = "PASS" if err <= base * 1.05 else "fail"
        print(
            f"  GL-{iters} m={m}: {err:.5f} vs {base:.5f} "
            f"({err / base:.3f}x) {verdict}",
            flush=True,
        )


if __name__ == "__main__":
    main()
