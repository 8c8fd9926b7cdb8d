"""A/B the serving Griffin-Lim configs on a TRAINED checkpoint.

The fast-GL momentum gate (`scripts/gl_momentum_gate.py`) measures the
vocoder on ground-truth spectrograms (harmonic batch + copy-synthesis
arms).  This script closes the last gap the round-2 verdict asked for:
the same A/B on the spectrograms a trained model actually PREDICTS —
autoregressive synthesis of eval texts through each candidate vocoder,
with the generated AUDIO re-analyzed (`wav_to_features`) and its mel
compared to the ground-truth features (the SURVEY.md §6 acceptance
metric, audio-domain form).

Because both candidates decode from the same checkpoint with the same
RNG, the model error is common-mode: the per-candidate audio-domain
mel-L1 difference isolates the vocoder.

    timeout 2400 python scripts/gl_trained_ab.py --workdir /tmp/runs/demo_r3 \
        [--utts 32] [--wire]

`--wire` A/Bs the WIRE CODECS (pcm16 / mulaw8 / adpcm4) instead of the GL
configs: same checkpoint, same seed (identical decode + Griffin-Lim), so
the per-candidate audio-domain mel-L1 difference isolates the wire
round-trip — the trained-checkpoint arm of the wire-codec gate
(scripts/wire_codec_gate.py has the ground-truth arms).

Expects a workdir trained by scripts/train_demo.py (same config recipe).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (iters, momentum, iter_impl) serving candidates; (60, 0.0) classic first.
CANDIDATES = [
    (60, 0.0, "auto"),
    (30, 0.99, "auto"),
    (40, 0.99, "auto"),
    # Round-4 lower-iteration candidates — PASSed the two static arms
    # (gl_momentum_gate.py 2026-08-20: GL-25 spectral 0.915x / copy-syn
    # 0.997x, GL-20 spectral 1.046x / copy-syn 1.001x); this trained-
    # checkpoint arm is the remaining gate before bench.py admission.
    (25, 0.99, "auto"),
    (20, 0.99, "auto"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/runs/demo_r3")
    ap.add_argument("--utts", type=int, default=32)
    ap.add_argument("--utterances", type=int, default=3072,
                    help="corpus size the checkpoint was trained with")
    ap.add_argument("--wire", action="store_true",
                    help="A/B wire codecs instead of GL configs")
    ap.add_argument("--reduction-factor", type=int, default=5,
                    help="must match the checkpoint's training config "
                    "(the fingerprint rejects a mismatch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sstts.checkpoint import CheckpointManager
    from sstts.config import Config
    from sstts.data import pipeline as pm
    from sstts.data import text as text_mod
    from sstts.dsp.metrics import mcd_from_normalized_mel
    from sstts.dsp.ops import wav_to_features
    from sstts.synthesize import Synthesizer
    from sstts.train import create_state, load_corpus

    cfg = Config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, dataset="synthetic", synthetic_size=args.utterances
        ),
        arch=dataclasses.replace(
            cfg.arch, guided_attention_weight=1.0,
            reduction_factor=args.reduction_factor,
        ),
    )

    # Ground truth: eval-split utterances, featurized on device (same path
    # as sstts.evaluate.resynthesis_metrics).
    _, eval_utts = load_corpus(cfg)
    utts = eval_utts[: args.utts]
    ds = cfg.dataset
    items = [
        (
            text_mod.encode(u.text, extra_chars=ds.extra_chars),
            pm.load_audio(u, cfg),
        )
        for u in utts
    ]
    text_len = max(len(ids) for ids, _ in items)
    r = cfg.arch.reduction_factor
    max_frames = max(1 + len(a) // ds.hop_len for _, a in items)
    fr = -(-max_frames // r) * r
    batch = pm.make_batch(items, text_len, fr, cfg)
    gt_feats = jax.jit(
        lambda s: wav_to_features(
            s.astype(jnp.float32) * (1.0 / 32767.0), ds
        )
    )
    _, gt_mel = (np.asarray(a) for a in gt_feats(batch["samples"]))

    # Re-analysis of generated audio: ONE static shape (the decoder's max
    # emission length) so the whole A/B costs a single featurizer compile
    # — per-wav trimmed lengths would compile one program per unique
    # length (the repo's static-bucketed-shape convention, CLAUDE.md).
    max_len = cfg.inference.max_decoder_steps * r * ds.hop_len
    analyze = jax.jit(lambda y: wav_to_features(y, ds)[1])

    def audio_mels(wavs) -> np.ndarray:
        padded = np.zeros((len(wavs), max_len), np.float32)
        for i, w in enumerate(wavs):
            n = min(len(w), max_len)
            padded[i, :n] = np.asarray(w[:n], np.float32)
        return np.asarray(analyze(padded))

    # Restore the checkpoint ONCE: the candidates differ only in
    # inference-section GL fields (fingerprint-neutral), so they share
    # params/batch_stats and only the vocoder program differs.
    ckpt = CheckpointManager(cfg, args.workdir)
    try:
        step, state = ckpt.restore_latest(jax.device_get(create_state(cfg)))
    finally:
        ckpt.close()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {args.workdir}")
    print(f"restored step {step} from {args.workdir}", flush=True)

    texts = [u.text for u in utts]

    if args.wire:
        # Same checkpoint + same per-candidate seed -> identical decode and
        # Griffin-Lim; only the wire round-trip differs.  n_frames for the
        # loss masking comes from one full-output call (same seed, so the
        # same decode the wire candidates produce).
        #
        # READ THE RATIOS ONE-SIDED.  Lossy codecs routinely score BELOW
        # 1.0x here (2026-08-20 flagship run: mulaw8 0.666x, adpcm3
        # 0.709x, adpcm4 0.838x of pcm16) — that is a METRIC ARTIFACT,
        # not a quality improvement: quantization noise fills the
        # generated audio's inter-harmonic/high-band spectral valleys
        # toward the ground truth's natural noise floor, shrinking the
        # dB-domain mel-L1 while the waveform SNR drops from ~89 dB
        # (pcm16) to ~34-41 dB (verified mechanism: a synthetic
        # harmonic-vs-noisy-GT A/B reproduces the exact ordering —
        # noisier codec => "better" mel-L1).  This arm therefore gates
        # only "does not HURT the acceptance metric" (ratio <= 1.05);
        # actual codec fidelity is gated by the SNR-vs-GL-floor arm in
        # scripts/wire_codec_gate.py.
        ref = Synthesizer(cfg, state.params, state.batch_stats, seed=11)
        _, full = ref.synthesize_batch(
            texts, full_output=True, fetch=("wav", "n_frames", "n_samples")
        )
        results = []
        for wf in ("pcm16", "mulaw8", "adpcm4", "adpcm3", "adpcm2"):
            c = cfg.replace(
                inference=dataclasses.replace(cfg.inference, wire_format=wf)
            )
            synth = Synthesizer(c, state.params, state.batch_stats, seed=11)
            wavs = synth.synthesize_batch(texts)
            mels = audio_mels(wavs)
            l1s = []
            mcds = []
            for i in range(len(utts)):
                n = min(
                    int(batch["loss_frames"][i]),
                    int(full["n_frames"][i]),
                    mels.shape[1],
                )
                if n >= 8:
                    l1s.append(
                        float(np.abs(mels[i, :n] - gt_mel[i, :n]).mean())
                    )
                    # Valley-fill-robust companion metric (round 5):
                    # cepstral truncation keeps the envelope, so codec
                    # noise in the spectral valleys cannot lower it.
                    mcds.append(
                        mcd_from_normalized_mel(
                            mels[i, :n], gt_mel[i, :n],
                            min_level_db=ds.min_level_db,
                        )
                    )
            res = {
                "wire_format": wf,
                "audio_mel_l1_vs_gt": round(float(np.mean(l1s)), 5),
                "audio_mcd_db_vs_gt": round(float(np.mean(mcds)), 4),
                "utterances": len(l1s),
            }
            results.append(res)
            print(json.dumps(res), flush=True)
        base = results[0]["audio_mel_l1_vs_gt"]
        mcd_base = results[0]["audio_mcd_db_vs_gt"]
        for res in results[1:]:
            ratio = res["audio_mel_l1_vs_gt"] / base
            verdict = "PASS" if ratio <= 1.05 else "fail"
            note = (
                " [<1x = codec noise filling spectral valleys toward the"
                " GT noise floor — metric artifact, not an improvement;"
                " fidelity is gated by wire_codec_gate.py's SNR arm]"
                if ratio < 0.95
                else ""
            )
            mcd_ratio = res["audio_mcd_db_vs_gt"] / mcd_base
            mcd_verdict = "PASS" if mcd_ratio <= 1.05 else "fail"
            print(
                f"wire={res['wire_format']}: {res['audio_mel_l1_vs_gt']:.5f} "
                f"vs pcm16 {base:.5f} ({ratio:.3f}x) {verdict}{note}; "
                f"MCD {res['audio_mcd_db_vs_gt']:.3f} vs {mcd_base:.3f} dB "
                f"({mcd_ratio:.3f}x) {mcd_verdict}",
                flush=True,
            )
        return 0

    results = []
    for iters, m, impl in CANDIDATES:
        c = cfg.replace(
            inference=dataclasses.replace(
                cfg.inference,
                griffin_lim_iters=iters,
                griffin_lim_momentum=m,
                griffin_lim_iter_impl=impl,
            )
        )
        synth = Synthesizer(c, state.params, state.batch_stats)
        wavs, full = synth.synthesize_batch(
            texts, full_output=True, fetch=("wav", "n_frames", "n_samples")
        )
        mels = audio_mels(wavs)
        l1s = []
        mcds = []
        for i in range(len(utts)):
            gt_frames = int(batch["loss_frames"][i])
            gen_frames = min(
                int(full["n_frames"][i]), mels.shape[1]
            )
            n = min(gt_frames, gen_frames)
            if n >= 8:
                l1s.append(
                    float(np.abs(mels[i, :n] - gt_mel[i, :n]).mean())
                )
                mcds.append(
                    mcd_from_normalized_mel(
                        mels[i, :n], gt_mel[i, :n],
                        min_level_db=ds.min_level_db,
                    )
                )
        res = {
            "gl_iters": iters,
            "gl_momentum": m,
            "audio_mel_l1_vs_gt": round(float(np.mean(l1s)), 5),
            "audio_mcd_db_vs_gt": round(float(np.mean(mcds)), 4),
            "utterances": len(l1s),
        }
        results.append(res)
        print(json.dumps(res), flush=True)

    base = results[0]["audio_mel_l1_vs_gt"]
    mcd_base = results[0]["audio_mcd_db_vs_gt"]
    for res in results[1:]:
        ratio = res["audio_mel_l1_vs_gt"] / base
        verdict = "PASS" if ratio <= 1.05 else "fail"
        mcd_ratio = res["audio_mcd_db_vs_gt"] / mcd_base
        mcd_verdict = "PASS" if mcd_ratio <= 1.05 else "fail"
        print(
            f"GL-{res['gl_iters']} m={res['gl_momentum']}: "
            f"{res['audio_mel_l1_vs_gt']:.5f} vs GL-60 classic {base:.5f} "
            f"({ratio:.3f}x) {verdict}; "
            f"MCD {res['audio_mcd_db_vs_gt']:.3f} vs {mcd_base:.3f} dB "
            f"({mcd_ratio:.3f}x) {mcd_verdict}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
