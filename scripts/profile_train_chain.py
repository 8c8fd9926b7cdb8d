"""Chained in-program breakdown of the teacher-forced train step.

Where do the ~22 ms/step (b=32 x 400 frames, BASELINE.md config 3) go?
Each phase runs K data-dependent times inside ONE jit call; per-phase cost
is (t_K - t_base)/K, immune to the relay's per-call dispatch floor
(CLAUDE.md measurement discipline; same pattern as profile_decoder_chain).

Phases: features (STFT/mel), encode, teacher-forced decode scan,
post-process, full forward (loss), full train step (forward+backward+adam).
backward+adam ~= step - forward.

Usage: timeout 3600 python scripts/profile_train_chain.py [K] [phase ...]
Phases: features features_dft_high features_dft_default encode
decode_teacher postprocess grad_encode grad_decode grad_post forward step
step_dft step_features (default all; features_dft_*/step_dft run the
training.feature_fft_impl DFT-GEMM featurization; step_features is the
feature-resident-corpus step, no per-step featurization; grad_* are
value_and_grad of each sub-module in isolation — backward attribution).
The GRU-backend train-step A/B needs no flag: run the `step` phase twice,
once with SSTTS_GRU_BACKEND=xla in the environment (separate processes).
Under a degraded remote compile service, run one phase per process
call to bound each compile (CLAUDE.md compile gotchas).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

_args = sys.argv[1:]
K = int(_args[0]) if _args and _args[0].isdigit() else 8
PHASES = set(a for a in _args if not a.isdigit())


def want(tag: str) -> bool:
    return not PHASES or tag in PHASES


def main() -> None:
    from sstts.config import Config
    from sstts.dsp.ops import wav_to_features
    from sstts.model.losses import frame_mask_from_lengths, tacotron_loss
    from sstts.train import _make_step_body, build_model, create_state

    cfg = Config()
    B, T = 32, 400
    L = cfg.training.text_buckets[0]
    hop = cfg.dataset.hop_len
    n_samples = (T - 1) * hop
    rng = np.random.default_rng(0)

    state = create_state(cfg)
    model = build_model(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ids = np.where(
        rng.random((B, L)) < 0.8, rng.integers(1, 30, (B, L)), 0
    ).astype(np.int32)
    ids[:, 0] = 1
    batch = {
        "char_ids": jnp.asarray(ids),
        "text_len": jnp.asarray(np.maximum((ids != 0).sum(1), 1), jnp.int32),
        "samples": jnp.asarray(
            (rng.standard_normal((B, n_samples)) * 3000).astype(np.int16)
        ),
        "n_frames": jnp.full((B,), T, jnp.int32),
        "loss_frames": jnp.full((B,), T, jnp.int32),
    }
    samples_f = batch["samples"].astype(jnp.float32) * (1.0 / 32767.0)
    linear_gt, mel_gt = jax.jit(lambda s: wav_to_features(s, cfg.dataset))(
        samples_f
    )
    linear_gt = jax.block_until_ready(linear_gt)
    frame_mask = frame_mask_from_lengths(batch["n_frames"], mel_gt.shape[1])
    key = jax.random.PRNGKey(0)

    def chain(once):
        """once(x, rng) -> array; chain K data-dependent applications."""

        def f(x, r):
            acc = jnp.float32(0.0)
            for i in range(K):
                out = once(x, jax.random.fold_in(r, i))
                s = jnp.sum(out).astype(jnp.float32)
                acc = acc + s
                x = x + (s * 1e-12).astype(x.dtype)
            return acc
        return jax.jit(f)

    t_base = timed("baseline", jax.jit(lambda x, r: jnp.sum(x) * 2.0),
                   samples_f, key)

    results = {}

    def phase(tag, f, x):
        if not want(tag):
            return
        t = timed(f"{tag} x{K}", chain(f), x, key)
        results[tag] = (t - t_base) / K

    phase("features", lambda s, r: wav_to_features(s, cfg.dataset)[0],
          samples_f)
    # training.feature_fft_impl candidates: |STFT| as support-reduced
    # window-folded DFT GEMMs (sstts.dsp.ops._stft_magnitude_dft).
    for impl in ("dft_high", "dft_default"):
        phase(f"features_{impl}",
              lambda s, r, i=impl: wav_to_features(s, cfg.dataset, i)[0],
              samples_f)

    from sstts.model.tacotron import Tacotron

    def enc(x, r):
        m, _ = model.apply(variables, x.astype(jnp.int32), True,
                           method=Tacotron.encode, rngs={"dropout": r},
                           mutable=["batch_stats"])[0]
        return m

    phase("encode", enc, jnp.asarray(ids))

    memory, mmask = jax.jit(
        lambda v, i, r: model.apply(v, i, True, method=Tacotron.encode,
                                    rngs={"dropout": r},
                                    mutable=["batch_stats"])[0]
    )(variables, jnp.asarray(ids), key)
    memory = jax.block_until_ready(memory)

    def dec(m, r):
        (mel, stops, align), _ = model.apply(
            variables, m, mmask, mel_gt, True,
            method=Tacotron.decode_teacher, rngs={"dropout": r},
            mutable=["batch_stats"],
        )
        return mel

    phase("decode_teacher", dec, memory)

    def post(mel, r):
        lin, _ = model.apply(
            variables, mel, frame_mask, True, method=Tacotron.postprocess,
            rngs={"dropout": r}, mutable=["batch_stats"],
        )
        return lin

    phase("postprocess", post, mel_gt)

    # Backward decomposition: fwd+bwd of each sub-module in isolation
    # (value_and_grad wrt the variables of a scalarized output), chained
    # like the forward phases.  Attribution for the step-minus-forward
    # residual: which module's gradient carries the cost.
    def gchain(gonce):
        """gonce(v, x, rng) -> scalar; chain K value_and_grad applications."""
        vg = jax.value_and_grad(gonce)

        def f(v, x, r):
            acc = jnp.float32(0.0)
            for i in range(K):
                val, g = vg(v, x, jax.random.fold_in(r, i))
                leaf = jax.tree_util.tree_leaves(g)[0]
                s = val + jnp.sum(leaf).astype(jnp.float32)
                acc = acc + s
                x = x + (s * 1e-12).astype(x.dtype)
            return acc
        return jax.jit(f)

    def gphase(tag, gonce, x):
        if not want(tag):
            return
        t = timed(f"{tag} x{K}", gchain(gonce), variables, x, key)
        results[tag] = (t - t_base) / K

    def genc(v, x, r):
        (m, _), _ = model.apply(v, jnp.round(x).astype(jnp.int32), True,
                                method=Tacotron.encode, rngs={"dropout": r},
                                mutable=["batch_stats"])
        return jnp.sum(m).astype(jnp.float32)

    gphase("grad_encode", genc, jnp.asarray(ids, jnp.float32))

    def gdec(v, m, r):
        (mel, stops, align), _ = model.apply(
            v, m, mmask, mel_gt, True,
            method=Tacotron.decode_teacher, rngs={"dropout": r},
            mutable=["batch_stats"],
        )
        return jnp.sum(mel).astype(jnp.float32)

    gphase("grad_decode", gdec, memory)

    def gpost(v, mel, r):
        lin, _ = model.apply(
            v, mel, frame_mask, True, method=Tacotron.postprocess,
            rngs={"dropout": r}, mutable=["batch_stats"],
        )
        return jnp.sum(lin).astype(jnp.float32)

    gphase("grad_post", gpost, mel_gt)

    def fwd(s, r):
        out, _ = model.apply(
            variables, batch["char_ids"],
            wav_to_features(s, cfg.dataset)[1], frame_mask, True,
            rngs={"dropout": r}, mutable=["batch_stats"],
        )
        loss, _ = tacotron_loss(
            out, mel_gt, linear_gt, batch["loss_frames"], cfg.arch,
            cfg.dataset, text_lengths=batch["text_len"],
        )
        return loss

    phase("forward", fwd, samples_f)

    if want("step"):
        step_body = _make_step_body(cfg)

        def steps_chained(st, b):
            acc = jnp.float32(0.0)
            for _ in range(K):
                st, metrics = step_body(st, b)
                acc = acc + metrics["loss"]
            return acc

        t_step = timed(
            f"train step x{K}", jax.jit(steps_chained), state, batch
        )
        results["step"] = (t_step - t_base) / K

    if want("step_dft"):
        # Full train step with training.feature_fft_impl="dft_high".
        import dataclasses

        dft_cfg = cfg.replace(
            training=dataclasses.replace(
                cfg.training, feature_fft_impl="dft_high"
            )
        )
        dft_body = _make_step_body(dft_cfg)

        def dft_chained(st, b):
            acc = jnp.float32(0.0)
            for _ in range(K):
                st, metrics = dft_body(st, b)
                acc = acc + metrics["loss"]
            return acc

        t_dft = timed(
            f"train step (dft_high feats) x{K}", jax.jit(dft_chained),
            state, batch,
        )
        results["step_dft"] = (t_dft - t_base) / K

    if want("step_features"):
        # The feature-resident corpus path (device_corpus_format="features"):
        # linear/mel precomputed at corpus build, no per-step featurization.
        feat_body = _make_step_body(cfg, from_features=True)
        feat_batch = {
            k: v for k, v in batch.items() if k != "samples"
        }
        feat_batch["linear"] = linear_gt
        feat_batch["mel"] = mel_gt

        def feat_chained(st, b):
            acc = jnp.float32(0.0)
            for _ in range(K):
                st, metrics = feat_body(st, b)
                acc = acc + metrics["loss"]
            return acc

        t_feat = timed(
            f"train step (features) x{K}", jax.jit(feat_chained),
            state, feat_batch,
        )
        results["step_features"] = (t_feat - t_base) / K

    print("\nper-application in-program cost (b=32, T=400):")
    for tag, ms in results.items():
        print(f"  {tag:16s} {ms:7.2f} ms")
    if "step" in results and "forward" in results:
        print(f"  {'bwd+adam (est)':16s} "
              f"{results['step'] - results['forward']:7.2f} ms")


if __name__ == "__main__":
    main()
