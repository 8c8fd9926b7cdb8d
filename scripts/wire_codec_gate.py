"""Quality-gate the serving wire codecs (pcm16 / mulaw8 / adpcm4 / adpcm3).

Round-3 VERDICT #1: the headline steady state is bound by the host wire
(~6.7 MiB mu-law per b=32 batch over a 40-50 MiB/s link), so a sub-8-bit
codec is the remaining serving lever.  Every wire codec must be gated the
way mu-law was before it can enter `bench.py`'s probe queue:

1. SNR arm (NUMERIC since round 5 — round-4 verdict Weak #1): real
   synthetic-corpus waveforms through the device encode -> host decode
   round trip; report waveform SNR per codec.  The hard gate runs in the
   phase-insensitive magnitude-STFT domain, where Griffin-Lim's own
   reconstruction error is measurable: the script measures classic
   GL-60's spectral SNR vs the ground-truth waveforms (THE "Griffin-Lim
   quality floor" earlier rounds invoked verbally) and requires each
   codec's wire round-trip spectral SNR (on the GL waveform it actually
   transports) to sit >= GL_FLOOR_MARGIN_DB above it — i.e. the codec's
   spectral error energy must be at least 10x smaller than the error
   Griffin-Lim itself introduces.
2. Copy-synthesis mel-L1 arm: ground-truth linear features -> classic
   GL-60 `spectrogram_to_wav` -> wire round trip -> re-analyze ->
   mel-L1 vs the ground-truth mel, per codec.  Gate: a lossy codec's
   mel-L1 <= 1.02x the PCM16 (lossless-wire) baseline.  Known limits:
   valley fill makes lossy codecs score BELOW 1x here (see the inline
   note), so this arm can only catch gross breakage.
3. MCD arm (round 5): mel-cepstral distortion of the decoded audio vs
   the ground-truth mel — cepstral truncation keeps the spectral
   envelope and discards the inter-harmonic fine structure that valley
   fill games, so this is the lossy-codec-robust version of arm 2.
   Gate: MCD <= 1.02x the PCM16 baseline.

The trained-checkpoint arm (AR synthesis from a real checkpoint, audio-
domain mel-L1 + MCD per wire format) lives in
`scripts/gl_trained_ab.py --wire`.

Usage: timeout 1200 python scripts/wire_codec_gate.py [N] [T]
(SSTTS_CPU=1 to force CPU — quality arms are timing-free.)
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_ap = argparse.ArgumentParser()
_ap.add_argument("N", nargs="?", type=int, default=8)
_ap.add_argument("T", nargs="?", type=int, default=800)
_args = _ap.parse_args()

CODECS = ("pcm16", "mulaw8", "adpcm4", "adpcm3", "adpcm2")

#: The codec's spectral error (on the waveform it transports) must be at
#: least this many dB smaller than Griffin-Lim's own reconstruction error
#: vs ground truth — "under the GL quality floor", as a number: 10 dB =
#: 10x less error energy than the vocoder itself introduces.
GL_FLOOR_MARGIN_DB = 10.0


def _wire_roundtrip_host(codec: str, wav_dev, n: int):
    """Device wire encode -> fetched bytes -> host decode, as serving does."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sstts.dsp import ops

    if codec == "pcm16":
        enc = jax.jit(
            lambda y: jnp.round(jnp.clip(y, -1.0, 1.0) * 32767.0).astype(
                jnp.int16
            )
        )
        rows = np.asarray(enc(wav_dev))
        return np.stack(
            [rows[i, :n].astype(np.float32) / 32767.0 for i in range(rows.shape[0])]
        ), rows[:, :n].nbytes
    if codec == "mulaw8":
        rows = np.asarray(jax.jit(ops.mulaw_encode_u8)(wav_dev))
        return np.stack(
            [ops.mulaw_decode_host(rows[i, :n]) for i in range(rows.shape[0])]
        ), rows[:, :n].nbytes
    if codec == "adpcm4":
        rows = np.asarray(jax.jit(ops.adpcm4_encode_wire)(wav_dev))
        return np.stack(
            [ops.adpcm4_decode_host(rows[i], n) for i in range(rows.shape[0])]
        ), rows.nbytes
    if codec == "adpcm3":
        rows = np.asarray(jax.jit(ops.adpcm3_encode_wire)(wav_dev))
        return np.stack(
            [ops.adpcm3_decode_host(rows[i], n) for i in range(rows.shape[0])]
        ), rows.nbytes
    if codec == "adpcm2":
        rows = np.asarray(jax.jit(ops.adpcm2_encode_wire)(wav_dev))
        return np.stack(
            [ops.adpcm2_decode_host(rows[i], n) for i in range(rows.shape[0])]
        ), rows.nbytes
    raise ValueError(codec)


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
    from sstts.dsp.griffin_lim import spectrogram_to_wav
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
    batch_dev = jnp.asarray(batch)

    # --- arm 1: SNR on corpus waveforms ----------------------------------
    print(f"SNR arm ({n_utts} synthetic utterances, {length} samples):")
    for codec in CODECS:
        dec, nbytes = _wire_roundtrip_host(codec, batch_dev, length)
        err = dec - batch
        snr = 10 * np.log10(
            np.mean(batch**2) / max(np.mean(err**2), 1e-20)
        )
        print(
            f"  {codec:7s}: SNR {snr:6.1f} dB, "
            f"{nbytes / (n_utts * length):.3f} B/sample",
            flush=True,
        )

    # --- GL quality floor (the numeric anchor for the SNR gate) ----------
    from sstts.dsp import reference as oracle
    from sstts.dsp.metrics import mcd_from_normalized_mel, spectral_snr_db

    gt_linear, gt_mel = (
        np.asarray(a)
        for a in jax.jit(lambda y: wav_to_features(y, ds))(batch)
    )
    gl_wav = np.asarray(
        jax.jit(lambda lin: spectrogram_to_wav(lin, cfg, length))(gt_linear)
    )

    def stft_mag(rows: np.ndarray) -> np.ndarray:
        return np.stack(
            [
                np.abs(
                    oracle.stft(r, ds.n_fft, ds.hop_len, ds.win_len)
                )
                for r in rows
            ]
        )

    mag_gt = stft_mag(batch)
    mag_gl = stft_mag(gl_wav)
    gl_floor_snr = spectral_snr_db(mag_gt, mag_gl)
    print(
        f"\nGriffin-Lim quality floor: classic GL-60 copy-synthesis "
        f"spectral SNR vs ground truth = {gl_floor_snr:.1f} dB"
    )
    print(
        f"SNR gate: codec spectral SNR (on the GL waveform it carries) "
        f">= floor + {GL_FLOOR_MARGIN_DB:.0f} dB = "
        f"{gl_floor_snr + GL_FLOOR_MARGIN_DB:.1f} dB:"
    )
    gl_dev = jnp.asarray(gl_wav)
    spec_snrs = {}
    dec_mags = {}
    decs = {}  # decoded waveforms, reused by arms 2-3 (one round trip/codec)
    for codec in CODECS:
        dec, _ = _wire_roundtrip_host(codec, gl_dev, length)
        decs[codec] = dec
        dec_mags[codec] = stft_mag(dec)
        spec_snrs[codec] = spectral_snr_db(mag_gl, dec_mags[codec])
        margin = spec_snrs[codec] - gl_floor_snr
        verdict = (
            "PASS" if margin >= GL_FLOOR_MARGIN_DB or codec == "pcm16"
            else "fail"
        )
        print(
            f"  {codec:7s}: spectral SNR {spec_snrs[codec]:6.1f} dB "
            f"(margin {margin:+6.1f} dB) {verdict}",
            flush=True,
        )

    # --- arm 2: copy-synthesis mel-L1 through classic GL-60 --------------
    featurize = jax.jit(lambda y: wav_to_features(y, ds)[1])
    print("\ncopy-synthesis arm (GL-60 output through each wire codec):")
    results = {}
    mcds = {}
    for codec in CODECS:
        mel = np.asarray(featurize(jnp.asarray(decs[codec])))
        results[codec] = float(np.abs(mel - gt_mel).mean())
        mcds[codec] = mcd_from_normalized_mel(
            mel, gt_mel, min_level_db=ds.min_level_db
        )
        print(
            f"  {codec:7s}: mel-L1 {results[codec]:.5f}, "
            f"MCD {mcds[codec]:.3f} dB",
            flush=True,
        )
    base = results["pcm16"]
    # One-sided gate: ratios BELOW 1.0 are a metric artifact, not an
    # improvement — codec quantization noise fills the GL output's
    # inter-harmonic spectral valleys toward the ground truth's natural
    # noise floor, shrinking dB-domain mel-L1 while waveform SNR drops
    # by ~50 dB (mechanism verified 2026-08-20 with a synthetic
    # harmonic-vs-noisy-GT A/B; see scripts/gl_trained_ab.py --wire).
    # Codec fidelity is what the SNR arm above gates.
    print("gate (mel-L1 <= 1.02x PCM16 wire; <1x = valley-fill artifact):")
    for codec in CODECS:
        if codec == "pcm16":
            continue
        ratio = results[codec] / base
        verdict = "PASS" if ratio <= 1.02 else "fail"
        print(f"  {codec:7s}: {ratio:.4f}x {verdict}", flush=True)

    # --- arm 3: valley-fill-robust spectral distance (round 5) -----------
    # Harmonic-peak-only L1: dB error restricted to bins within 25 dB of
    # each frame's reference peak — broadband fill cannot LOWER it, so a
    # lossless wire is optimal by construction and lossy ratios read
    # one-sided >= 1.  MCD is reported alongside for the record, but the
    # smoke measurements showed the fill is partly envelope-scale
    # (codecs scored BELOW pcm16 on MCD too), so the gate rides on the
    # peak metric.
    from sstts.dsp.metrics import peak_masked_l1_db

    def _db(mag: np.ndarray) -> np.ndarray:
        return 20.0 * np.log10(np.maximum(1e-5, mag))

    db_gt = _db(mag_gt)
    peak = {
        codec: peak_masked_l1_db(db_gt, _db(dec_mags[codec]))
        for codec in CODECS
    }
    peak_base = peak["pcm16"]
    mcd_base = mcds["pcm16"]
    print(
        f"\npeak-spectral arm (L1 on bins within 25 dB of each frame's "
        f"GT peak; gate <= 1.02x PCM16 baseline {peak_base:.3f} dB; "
        f"MCD reported for the record, base {mcd_base:.3f} dB):"
    )
    for codec in CODECS:
        if codec == "pcm16":
            continue
        ratio = peak[codec] / peak_base
        verdict = "PASS" if ratio <= 1.02 else "fail"
        print(
            f"  {codec:7s}: peak-L1 {peak[codec]:.3f} dB ({ratio:.4f}x) "
            f"{verdict}; MCD {mcds[codec]:.3f} dB "
            f"({mcds[codec] / mcd_base:.4f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
