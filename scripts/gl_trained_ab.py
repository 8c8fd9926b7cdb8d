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

    python scripts/gl_trained_ab.py --workdir /tmp/runs/demo_r3 [--utts 32]

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
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/runs/demo_r3")
    ap.add_argument("--utts", type=int, default=32)
    ap.add_argument("--utterances", type=int, default=3072,
                    help="corpus size the checkpoint was trained with")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sstts.config import Config
    from sstts.data import pipeline as pm
    from sstts.data import text as text_mod
    from sstts.dsp.ops import wav_to_features
    from sstts.synthesize import Synthesizer
    from sstts.train import load_corpus

    cfg = Config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, dataset="synthetic", synthetic_size=args.utterances
        ),
        arch=dataclasses.replace(cfg.arch, guided_attention_weight=1.0),
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

    # Re-analysis of generated audio happens per-utterance on host-fetched
    # wavs; one jitted featurizer per padded length bucket.
    analyze_cache = {}

    def audio_mel(wav: np.ndarray) -> np.ndarray:
        n = len(wav)
        fn = analyze_cache.get(n)
        if fn is None:
            fn = jax.jit(lambda y: wav_to_features(y, ds)[1])
            analyze_cache[n] = fn
        return np.asarray(fn(wav.astype(np.float32)[None]))[0]

    texts = [u.text for u in utts]
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
        synth = Synthesizer.from_checkpoint(c, args.workdir)
        wavs, full = synth.synthesize_batch(
            texts, full_output=True, fetch=("wav", "n_frames", "n_samples")
        )
        l1s = []
        for i in range(len(utts)):
            gt_frames = int(batch["loss_frames"][i])
            mel = audio_mel(wavs[i])
            n = min(gt_frames, mel.shape[0])
            if n >= 8:
                l1s.append(float(np.abs(mel[:n] - gt_mel[i, :n]).mean()))
        res = {
            "gl_iters": iters,
            "gl_momentum": m,
            "audio_mel_l1_vs_gt": round(float(np.mean(l1s)), 5),
            "utterances": len(l1s),
        }
        results.append(res)
        print(json.dumps(res), flush=True)

    base = results[0]["audio_mel_l1_vs_gt"]
    for res in results[1:]:
        ratio = res["audio_mel_l1_vs_gt"] / base
        verdict = "PASS" if ratio <= 1.05 else "fail"
        print(
            f"GL-{res['gl_iters']} m={res['gl_momentum']}: "
            f"{res['audio_mel_l1_vs_gt']:.5f} vs GL-60 classic {base:.5f} "
            f"({ratio:.3f}x) {verdict}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
