"""Sweep the 2-bit codec's noise-shaping coefficient through the gate arms.

Round-5 follow-up to the adpcm2 rejection: adpcm2 (2-bit mid-rise DPCM,
0.266 B/sample) passed the SNR / peak-spectral / trained arms but FAILED
copy-synthesis at 1.29x (bar 1.02x) — its broadband quantization noise
rises above the Griffin-Lim metric floor in the low-frequency mel bins.
First-order error-feedback noise shaping (`_dpcm_quantize_blocks
ns_beta`) moves that noise high-pass at encode time with a BIT-IDENTICAL
wire format and decoder, so the only question is whether some beta buys
back the copy-synthesis arm without giving up the SNR-margin arm.

This harness runs the wire-gate quality arms (all timing-free, CPU) for
beta in {0, 0.4, 0.6, 0.8, 1.0}:
  * waveform SNR on synthetic-corpus waveforms (report only)
  * spectral SNR margin over the measured GL-60 floor (gate: >= +10 dB)
  * copy-synthesis mel-L1 ratio vs the PCM16 wire (gate: <= 1.02x)
  * peak-spectral L1 ratio (gate: <= 1.02x)

Measured (2026-08-21, N=8 x 800 frames, CPU — the arms are timing-free):

    beta  wavSNR  specSNR  margin  melL1 x  peak x  verdicts
    0.00    23.7     28.5   +26.8   1.2892  1.0019  snr:PASS l1:fail
    0.40    23.3     27.9   +26.2   1.2436  1.0011  snr:PASS l1:fail
    0.60    22.7     27.3   +25.7   1.2742  1.0020  snr:PASS l1:fail
    0.80    21.7     26.6   +24.9   1.3528  1.0011  snr:PASS l1:fail
    1.00    20.8     25.7   +24.1   1.4679  1.0029  snr:PASS l1:fail

DISPOSITION: rejected.  Shaping moves the copy-synthesis ratio at most
1.29x -> 1.24x against a 1.02x bar — the arm fails on the total noise
power a 2-bit lattice emits, not on where that noise sits in frequency
(large beta is WORSE: the GL cargo's high-frequency mel bins are
low-energy, so relocated noise surfaces there).  The serving wire floor
stands at adpcm3 (0.391 B/sample); `adpcm2_encode_wire(ns_beta=...)`
remains available and round-trip-tested (tests/test_wire.py) with the
decoder unchanged.

Usage: SSTTS_CPU=1 timeout 1200 python scripts/ns_beta_sweep.py [N] [T]
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_ap = argparse.ArgumentParser()
_ap.add_argument("N", nargs="?", type=int, default=8)
_ap.add_argument("T", nargs="?", type=int, default=800)
_args = _ap.parse_args()

BETAS = (0.0, 0.4, 0.6, 0.8, 1.0)
GL_FLOOR_MARGIN_DB = 10.0


def main() -> None:
    if os.environ.get("SSTTS_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sstts.config import Config
    from sstts.data import pipeline as pm
    from sstts.data.synthetic import make_utterances
    from sstts.dsp import ops
    from sstts.dsp import reference as oracle
    from sstts.dsp.griffin_lim import spectrogram_to_wav
    from sstts.dsp.metrics import peak_masked_l1_db, spectral_snr_db
    from sstts.dsp.ops import wav_to_features

    n_utts, T = _args.N, _args.T
    cfg = Config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, dataset="synthetic")
    )
    ds = cfg.dataset
    utts = make_utterances(n_utts, ds)
    wavs = [pm.load_audio(u, cfg) for u in utts]
    frames = min(max(1 + len(y) // ds.hop_len for y in wavs), T)
    length = (frames - 1) * ds.hop_len
    batch = np.zeros((n_utts, length), np.float32)
    for i, y in enumerate(wavs):
        n = min(len(y), length)
        batch[i, :n] = np.asarray(y[:n], np.float32)

    def roundtrip(wav_np, beta):
        rows = np.asarray(
            jax.jit(partial(ops.adpcm2_encode_wire, ns_beta=beta))(
                jnp.asarray(wav_np)
            )
        )
        return ops._adpcm2_decode_rows_np(rows)[:, :length]

    def stft_mag(rows: np.ndarray) -> np.ndarray:
        return np.stack(
            [
                np.abs(oracle.stft(r, ds.n_fft, ds.hop_len, ds.win_len))
                for r in rows
            ]
        )

    gt_linear, gt_mel = (
        np.asarray(a)
        for a in jax.jit(lambda y: wav_to_features(y, ds))(batch)
    )
    gl_wav = np.asarray(
        jax.jit(lambda lin: spectrogram_to_wav(lin, cfg, length))(gt_linear)
    )
    mag_gt = stft_mag(batch)
    mag_gl = stft_mag(gl_wav)
    gl_floor_snr = spectral_snr_db(mag_gt, mag_gl)
    print(f"GL-60 copy-synthesis floor: spectral SNR {gl_floor_snr:.1f} dB")

    featurize = jax.jit(lambda y: wav_to_features(y, ds)[1])
    # PCM16 baselines for the ratio gates.
    pcm = np.round(np.clip(gl_wav, -1, 1) * 32767.0) / 32767.0
    mel_pcm = np.asarray(featurize(jnp.asarray(pcm.astype(np.float32))))
    l1_base = float(np.abs(mel_pcm - gt_mel).mean())

    def _db(mag):
        return 20.0 * np.log10(np.maximum(1e-5, mag))

    db_gt = _db(mag_gt)
    peak_base = peak_masked_l1_db(db_gt, _db(stft_mag(pcm)))
    print(
        f"pcm16 baselines: copy-synth mel-L1 {l1_base:.5f}, "
        f"peak-L1 {peak_base:.3f} dB"
    )
    print(
        f"{'beta':>5} {'wavSNR':>7} {'specSNR':>8} {'margin':>7} "
        f"{'melL1 x':>8} {'peak x':>7}  verdicts"
    )
    for beta in BETAS:
        dec_c = roundtrip(batch, beta)  # corpus waveforms: waveform SNR
        err = dec_c - batch
        wav_snr = 10 * np.log10(
            np.mean(batch**2) / max(np.mean(err**2), 1e-20)
        )
        dec = roundtrip(gl_wav, beta)  # GL waveform: the wire's real cargo
        mag_dec = stft_mag(dec)
        spec_snr = spectral_snr_db(mag_gl, mag_dec)
        margin = spec_snr - gl_floor_snr
        mel = np.asarray(featurize(jnp.asarray(dec)))
        l1_ratio = float(np.abs(mel - gt_mel).mean()) / l1_base
        peak_ratio = peak_masked_l1_db(db_gt, _db(mag_dec)) / peak_base
        v_snr = "PASS" if margin >= GL_FLOOR_MARGIN_DB else "fail"
        v_l1 = "PASS" if l1_ratio <= 1.02 else "fail"
        v_pk = "PASS" if peak_ratio <= 1.02 else "fail"
        print(
            f"{beta:5.2f} {wav_snr:7.1f} {spec_snr:8.1f} {margin:+7.1f} "
            f"{l1_ratio:8.4f} {peak_ratio:7.4f}  "
            f"snr:{v_snr} l1:{v_l1} peak:{v_pk}",
            flush=True,
        )


if __name__ == "__main__":
    main()
