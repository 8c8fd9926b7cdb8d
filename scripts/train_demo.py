"""Reproduce the BASELINE.md end-to-end training demonstration.

Full-size flagship model on the 3072-utterance deterministic synthetic
corpus (the LJSpeech stand-in — the image has no real corpus, SURVEY.md
session note), guided attention at weight 1.0, HBM-resident corpus path.
Each invocation trains up to --max-steps (resuming from the workdir's
latest checkpoint — running it twice with increasing step budgets
exercises the cross-process restart-resume path), then reports the
teacher-forced eval losses and the SURVEY.md §6 acceptance metric
(autoregressive resynthesis mel-L1 + stop-token length error) as one
JSON line.

    python scripts/train_demo.py --max-steps 24000 [--workdir runs/demo]
        [--steps-per-call 8] [--corpus-format pcm16|features|features_bf16]

Relay guidance (CLAUDE.md): in a dispatch-degraded window the single-step
driver pins at the ~45 ms/call floor; --steps-per-call 8 (with the default
pcm16 corpus) restores ~45 steps/s there.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steps", type=int, default=24000)
    ap.add_argument("--workdir", default="runs/demo")
    ap.add_argument("--steps-per-call", type=int, default=1)
    ap.add_argument("--corpus-format", default="pcm16",
                    choices=("pcm16", "features", "features_bf16"))
    ap.add_argument("--utterances", type=int, default=3072)
    ap.add_argument("--resynth-utts", type=int, default=32)
    ap.add_argument("--reduction-factor", type=int, default=5,
                    help="frames per decoder step; SURVEY §2.4 pins "
                    "r in {2, 5} — 2 is the reference's other canonical "
                    "value (round-4 r=2 alignment probe)")
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="training.ema_decay (Polyak averaging; 0 = off). "
                    "Resuming a pre-EMA workdir seeds EMA from the "
                    "restored params (sstts.checkpoint)")
    args = ap.parse_args()

    from sstts.config import Config
    from sstts.evaluate import evaluate_state, resynthesis_metrics
    from sstts.train import train

    cfg = Config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, dataset="synthetic", synthetic_size=args.utterances
        ),
        arch=dataclasses.replace(
            cfg.arch,
            guided_attention_weight=1.0,
            reduction_factor=args.reduction_factor,
        ),
        training=dataclasses.replace(
            cfg.training,
            steps_per_call=args.steps_per_call,
            device_corpus_format=args.corpus_format,
            ema_decay=args.ema_decay,
        ),
    )

    t0 = time.time()
    state = train(cfg, workdir=args.workdir, max_steps=args.max_steps)
    train_wall = time.time() - t0

    eval_metrics = evaluate_state(cfg, state)
    resynth = resynthesis_metrics(cfg, state, num_utterances=args.resynth_utts)
    out = {
        "step": int(state.step),
        "train_wall_s": round(train_wall, 1),
        **{f"eval_{k}": round(float(v), 5) for k, v in eval_metrics.items()},
        **{k: round(float(v), 5) for k, v in resynth.items()},
    }
    if state.ema_params is not None:
        # The same acceptance metric on the Polyak-averaged weights, so an
        # EMA run reports both arms from one process.
        ema_state = state.replace(params=state.ema_params)
        resynth_ema = resynthesis_metrics(
            cfg, ema_state, num_utterances=args.resynth_utts
        )
        out.update(
            {f"ema_{k}": round(float(v), 5) for k, v in resynth_ema.items()}
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
