"""Training step-variant tests (SURVEY.md §4): HBM-resident corpus
formats, grouped multi-step dispatch, remat/unroll knobs, feature FFT
impls, bf16 compute, and EMA (Polyak) averaging.

Split out of test_train.py so conftest's per-module compiled-state
clearing bounds XLA-CPU executable accumulation (see
tests/train_helpers.py for the incident record)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sstts import train as train_mod
from sstts.data.synthetic import make_utterances
from train_helpers import _cfg, _one_batch  # pytest puts tests/ on sys.path


@pytest.mark.fast
def test_device_corpus_cached_step_matches_host_step():
    """On-device batch gather (HBM-resident corpus) must reproduce the
    host-fed train step exactly, and valid=0 rows must zero the loss."""
    cfg = _cfg(batch_size=2)
    utts = make_utterances(6, cfg.dataset, min_words=1, max_words=2)
    built, reason = train_mod.build_device_corpus(cfg, utts)
    assert built is not None, reason
    corpus, counts = built
    bucket = next(iter(sorted(counts)))
    assert counts[bucket] >= 2

    idx = np.array([0, 1], np.int32)
    valid = np.ones(2, np.float32)
    state = train_mod.create_state(cfg)
    cached = train_mod.make_cached_train_step(cfg)
    s1, m1 = cached(state, corpus[bucket], idx, valid)

    host_batch = {
        k: np.asarray(jax.device_get(corpus[bucket][k]))[idx]
        for k in train_mod._CORPUS_KEYS
    }
    state2 = train_mod.create_state(cfg)
    s2, m2 = train_mod.make_train_step(cfg)(
        state2, jax.tree.map(jnp.asarray, host_batch)
    )
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )

    # A fill row (valid=0, duplicated index) must contribute zero loss:
    # same loss as masking it out via loss_frames on the host path.
    idx_fill = np.array([0, 0], np.int32)
    state3 = train_mod.create_state(cfg)
    _, m3 = train_mod.make_cached_train_step(cfg)(
        state3, corpus[bucket], idx_fill, np.array([1.0, 0.0], np.float32)
    )
    host_fill = {
        k: np.asarray(jax.device_get(corpus[bucket][k]))[idx_fill]
        for k in train_mod._CORPUS_KEYS
    }
    host_fill["loss_frames"] = host_fill["loss_frames"].copy()
    host_fill["loss_frames"][1] = 0
    state4 = train_mod.create_state(cfg)
    _, m4 = train_mod.make_train_step(cfg)(
        state4, jax.tree.map(jnp.asarray, host_fill)
    )
    np.testing.assert_allclose(
        float(m3["loss"]), float(m4["loss"]), rtol=1e-6
    )


def test_device_corpus_features_format_matches_pcm16():
    """The feature-resident corpus (featurize once at build) must reproduce
    the PCM16 corpus (featurize every step) to numerical tolerance."""
    cfg = _cfg(batch_size=2)
    cfg_f = cfg.replace(
        training=dataclasses.replace(
            cfg.training, device_corpus_format="features"
        )
    )
    utts = make_utterances(6, cfg.dataset, min_words=1, max_words=2)
    built, reason = train_mod.build_device_corpus(cfg, utts)
    assert built is not None, reason
    built_f, reason_f = train_mod.build_device_corpus(cfg_f, utts)
    assert built_f is not None, reason_f
    corpus, counts = built
    corpus_f, counts_f = built_f
    assert counts == counts_f
    bucket = next(iter(sorted(counts)))
    row = corpus_f[bucket]
    assert "samples" not in row and "linear" in row and "mel" in row

    idx = np.array([0, 1], np.int32)
    valid = np.ones(2, np.float32)
    state = train_mod.create_state(cfg)
    _, m_pcm = train_mod.make_cached_train_step(cfg)(
        state, corpus[bucket], idx, valid
    )
    state_f = train_mod.create_state(cfg_f)
    _, m_feat = train_mod.make_cached_train_step(cfg_f)(
        state_f, corpus_f[bucket], idx, valid
    )
    np.testing.assert_allclose(
        float(m_pcm["loss"]), float(m_feat["loss"]), rtol=1e-5
    )


def test_device_corpus_features_chunked_build_matches_oneshot(monkeypatch):
    """Large buckets build via bounded upload+featurize chunks written into
    donated buffers (the HBM transient fix); the chunked path — including
    the overlapping final chunk — must produce bit-identical corpora."""
    cfg = _cfg(batch_size=2).replace(
        training=dataclasses.replace(
            _cfg(batch_size=2).training, device_corpus_format="features"
        )
    )
    utts = make_utterances(7, cfg.dataset, min_words=1, max_words=1)
    built_one, reason = train_mod.build_device_corpus(cfg, utts)
    assert built_one is not None, reason
    monkeypatch.setattr(train_mod, "_FEATURIZE_CHUNK_ROWS", 2)
    built_chunked, reason_c = train_mod.build_device_corpus(cfg, utts)
    assert built_chunked is not None, reason_c
    corpus_one, counts = built_one
    corpus_chunked, counts_c = built_chunked
    assert counts == counts_c
    assert any(n > 2 for n in counts.values())  # chunked path exercised
    for bucket in counts:
        for k in corpus_one[bucket]:
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(corpus_one[bucket][k])),
                np.asarray(jax.device_get(corpus_chunked[bucket][k])),
            )


def test_device_corpus_features_bf16_matches_f32():
    """"features_bf16" stores half-width targets; the step loss must match
    the f32 features corpus to bf16 quantization tolerance (the targets
    carry <=0.4% relative rounding; predictions are identical), and the
    resident arrays must actually be bf16 (half the HBM — the property
    that lets steps_per_call>1 pair with a feature-resident corpus)."""
    cfg = _cfg(batch_size=2)
    cfg_f = cfg.replace(
        training=dataclasses.replace(
            cfg.training, device_corpus_format="features"
        )
    )
    cfg_h = cfg.replace(
        training=dataclasses.replace(
            cfg.training, device_corpus_format="features_bf16"
        )
    )
    utts = make_utterances(6, cfg.dataset, min_words=1, max_words=2)
    built_f, reason_f = train_mod.build_device_corpus(cfg_f, utts)
    assert built_f is not None, reason_f
    built_h, reason_h = train_mod.build_device_corpus(cfg_h, utts)
    assert built_h is not None, reason_h
    corpus_f, counts = built_f
    corpus_h, counts_h = built_h
    assert counts == counts_h
    bucket = next(iter(sorted(counts)))
    assert corpus_h[bucket]["linear"].dtype == jnp.bfloat16
    assert corpus_h[bucket]["mel"].dtype == jnp.bfloat16
    assert corpus_f[bucket]["linear"].dtype == jnp.float32

    idx = np.array([0, 1], np.int32)
    valid = np.ones(2, np.float32)
    _, m_f = train_mod.make_cached_train_step(cfg_f)(
        train_mod.create_state(cfg_f), corpus_f[bucket], idx, valid
    )
    _, m_h = train_mod.make_cached_train_step(cfg_h)(
        train_mod.create_state(cfg_h), corpus_h[bucket], idx, valid
    )
    # L1 losses against bf16-rounded targets move by at most the mean
    # absolute rounding (~0.2% of the target scale).
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_h["loss"]), rtol=1e-2
    )

    # The motivating pairing: grouped multi-step dispatch over the bf16
    # feature corpus compiles and runs.
    cfg_hs = cfg_h.replace(
        training=dataclasses.replace(
            cfg_h.training, device_corpus_format="features_bf16",
            steps_per_call=2,
        )
    )
    idxs = np.array([[0, 1], [2, 3]], np.int32) % counts[bucket]
    valids = np.ones((2, 2), np.float32)
    _, m_g = train_mod.make_grouped_train_step(cfg_hs)(
        train_mod.create_state(cfg_hs), corpus_h[bucket], idxs, valids
    )
    assert np.isfinite(np.asarray(m_g["loss"])).all()


def test_grouped_step_matches_sequential_cached_steps():
    """S steps in one dispatch (lax.scan) must match S sequential
    single-step dispatches: same loss trajectory, same final params."""
    cfg = _cfg(batch_size=2)
    utts = make_utterances(6, cfg.dataset, min_words=1, max_words=2)
    built, reason = train_mod.build_device_corpus(cfg, utts)
    assert built is not None, reason
    corpus, counts = built
    bucket = next(iter(sorted(counts)))
    n = counts[bucket]
    rng = np.random.default_rng(0)
    S = 3
    idxs = rng.integers(0, n, (S, 2)).astype(np.int32)
    valids = np.ones((S, 2), np.float32)
    valids[-1, -1] = 0.0

    state_a = train_mod.create_state(cfg)
    cached = train_mod.make_cached_train_step(cfg)
    losses_seq = []
    for i in range(S):
        state_a, m = cached(state_a, corpus[bucket], idxs[i], valids[i])
        losses_seq.append(float(m["loss"]))

    state_b = train_mod.create_state(cfg)
    grouped = train_mod.make_grouped_train_step(cfg)
    state_b, metrics = grouped(state_b, corpus[bucket], idxs, valids)
    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), losses_seq, rtol=1e-5
    )
    # XLA compiles the scan body with different fusion than the standalone
    # step, so f32 reassociation jitter amplified through Adam's normalized
    # updates (~lr-scale each) leaves ~1e-4-scale absolute differences after
    # S steps (measured max 7e-5 at S=3, lr=2e-3) — numerical, not semantic.
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=3e-4
        ),
        state_a.params, state_b.params,
    )


def test_grouped_step_with_remat_decoder():
    """The motivated combination (docs/performance.md HBM note): grouped
    multi-step dispatch over a features-format corpus with the decoder scan
    rematerialized.  Same losses as the non-remat grouped program."""
    cfg = _cfg(batch_size=2)
    cfg = cfg.replace(
        training=dataclasses.replace(
            cfg.training, device_corpus_format="features", steps_per_call=2
        )
    )
    rcfg = cfg.replace(
        arch=dataclasses.replace(cfg.arch, remat_decoder=True)
    )
    utts = make_utterances(4, cfg.dataset, min_words=1, max_words=2)
    built, reason = train_mod.build_device_corpus(cfg, utts)
    assert built is not None, reason
    corpus, counts = built
    bucket = next(iter(sorted(counts)))
    idxs = np.array([[0, 1], [2, 3]], np.int32) % counts[bucket]
    valids = np.ones((2, 2), np.float32)
    _, m0 = train_mod.make_grouped_train_step(cfg)(
        train_mod.create_state(cfg), corpus[bucket], idxs, valids
    )
    _, m1 = train_mod.make_grouped_train_step(rcfg)(
        train_mod.create_state(rcfg), corpus[bucket], idxs, valids
    )
    np.testing.assert_allclose(
        np.asarray(m0["loss"]), np.asarray(m1["loss"]), rtol=1e-5
    )


def test_grouped_epoch_indices_coverage():
    """Grouped epoch ops cover every corpus row exactly once (valid rows),
    with full groups shaped (S, B) and remainders as singles."""
    counts = {0: 7, 1: 4}
    S, B = 2, 2
    seen = {0: [], 1: []}
    for op in train_mod.grouped_epoch_indices(counts, B, S, seed=0):
        kind, bucket = op[0], op[1]
        if kind == "grouped":
            idxs, valids = op[2], op[3]
            assert idxs.shape == (S, B) and valids.shape == (S, B)
            seen[bucket].extend(idxs[valids > 0].tolist())
        else:
            idx, valid = op[2], op[3]
            assert idx.shape == (B,) and valid.shape == (B,)
            seen[bucket].extend(idx[valid > 0].tolist())
    for bucket, n in counts.items():
        assert sorted(seen[bucket]) == list(range(n))


def test_train_driver_steps_per_call(tmp_path):
    """Driver with multi-step dispatch: exact max_steps landing (clamp path)
    and resume across processes."""
    cfg = _cfg()
    cfg = cfg.replace(
        training=dataclasses.replace(
            cfg.training, batch_size=2, checkpoint_every=5, summary_every=2,
            device_corpus_cache="on", steps_per_call=3,
        )
    )
    state = train_mod.train(cfg, workdir=tmp_path, max_steps=7, log_every=2)
    assert int(jax.device_get(state.step)) == 7
    state2 = train_mod.train(cfg, workdir=tmp_path, max_steps=10, log_every=2)
    assert int(jax.device_get(state2.step)) == 10


def test_train_driver_device_corpus_cache(tmp_path):
    """Full driver on the HBM-resident corpus path, including resume."""
    cfg = _cfg()
    cfg = cfg.replace(
        training=dataclasses.replace(
            cfg.training, batch_size=2, checkpoint_every=5, summary_every=2,
            device_corpus_cache="on",
        )
    )
    state = train_mod.train(cfg, workdir=tmp_path, max_steps=6, log_every=2)
    assert int(jax.device_get(state.step)) == 6
    state2 = train_mod.train(cfg, workdir=tmp_path, max_steps=8, log_every=2)
    assert int(jax.device_get(state2.step)) == 8


def test_remat_decoder_matches():
    """arch.remat_decoder changes activation memory, not math: one train
    step produces the same loss and gradients as the default path."""
    cfg = _cfg()
    rcfg = cfg.replace(
        arch=dataclasses.replace(cfg.arch, remat_decoder=True)
    )
    assert rcfg.fingerprint() == cfg.fingerprint()
    batch = jax.tree.map(jnp.asarray, _one_batch(cfg))
    s0 = train_mod.create_state(cfg)
    s1 = train_mod.create_state(rcfg)
    _, m0 = train_mod.make_train_step(cfg)(s0, batch)
    _, m1 = train_mod.make_train_step(rcfg)(s1, batch)
    np.testing.assert_allclose(
        float(m0["loss"]), float(m1["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m0["grad_norm"]), float(m1["grad_norm"]), rtol=1e-5
    )


def test_decoder_scan_unroll_matches():
    """arch.decoder_scan_unroll changes loop structure, not math: one train
    step produces the same loss and gradients as the rolled scan, including
    at an unroll that does not divide the step count (lax.scan runs the
    remainder tail)."""
    cfg = _cfg()
    batch = jax.tree.map(jnp.asarray, _one_batch(cfg))
    s0 = train_mod.create_state(cfg)
    _, m0 = train_mod.make_train_step(cfg)(s0, batch)
    # The teacher scan runs 96/r = 48 steps here: u=2 divides it, u=5 does
    # not (48 % 5 == 3), so the lax.scan remainder tail is exercised.
    for u in (2, 5):
        ucfg = cfg.replace(
            arch=dataclasses.replace(cfg.arch, decoder_scan_unroll=u)
        )
        assert ucfg.fingerprint() == cfg.fingerprint()
        s1 = train_mod.create_state(ucfg)
        _, m1 = train_mod.make_train_step(ucfg)(s1, batch)
        np.testing.assert_allclose(
            float(m0["loss"]), float(m1["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m0["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4
        )


def test_feature_fft_impl_train_step():
    """training.feature_fft_impl swaps the featurization transform, not the
    training math: the fingerprint is stable and one step's loss matches the
    default path to f32 accuracy (dft_highest rung)."""
    cfg = _cfg()
    fcfg = cfg.replace(
        training=dataclasses.replace(
            cfg.training, feature_fft_impl="dft_highest"
        )
    )
    assert fcfg.fingerprint() == cfg.fingerprint()
    batch = jax.tree.map(jnp.asarray, _one_batch(cfg))
    s0 = train_mod.create_state(cfg)
    s1 = train_mod.create_state(fcfg)
    _, m0 = train_mod.make_train_step(cfg)(s0, batch)
    _, m1 = train_mod.make_train_step(fcfg)(s1, batch)
    np.testing.assert_allclose(
        float(m0["loss"]), float(m1["loss"]), rtol=1e-5
    )


def test_bfloat16_compute_path():
    """compute_dtype=bfloat16: train step runs, finite, roughly tracks f32."""
    cfg = _cfg()
    bf16 = cfg.replace(
        arch=dataclasses.replace(cfg.arch, compute_dtype="bfloat16")
    )
    batch = jax.tree.map(jnp.asarray, _one_batch(cfg))
    s32 = train_mod.create_state(cfg)
    s16 = train_mod.create_state(bf16)
    _, m32 = train_mod.make_train_step(cfg)(s32, batch)
    _, m16 = train_mod.make_train_step(bf16)(s16, batch)
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / l32 < 0.1, (l16, l32)
    # Params stay f32 (mixed precision: bf16 activations only).
    assert all(
        x.dtype == jnp.float32 for x in jax.tree.leaves(s16.params)
    )


def _ema_cfg(decay):
    cfg = _cfg()
    return cfg.replace(
        training=dataclasses.replace(cfg.training, ema_decay=decay)
    )


def test_ema_update_math():
    """One step at decay d: ema == d*init_params + (1-d)*new_params
    (Polyak seeded at the init point)."""
    d = 0.25
    cfg = _ema_cfg(d)
    state = train_mod.create_state(cfg)
    assert state.ema_params is not None
    init_params = jax.device_get(state.params)
    batch = jax.tree.map(jnp.asarray, _one_batch(cfg))
    new_state, _ = train_mod.make_train_step(cfg)(state, batch)
    want = jax.tree.map(
        lambda e, p: e * d + p * (1.0 - d),
        init_params,
        jax.device_get(new_state.params),
    )
    for a, b in zip(
        jax.tree.leaves(want), jax.tree.leaves(jax.device_get(new_state.ema_params))
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # Disabled -> no EMA tree, state tree unchanged from pre-EMA shape.
    assert train_mod.create_state(_cfg()).ema_params is None


def test_ema_checkpoint_adapts_both_ways(tmp_path):
    """Restore adapts the optional ema_params tree in both directions
    (sstts.checkpoint.restore_latest): a pre-EMA checkpoint read by an
    EMA run seeds ema from the restored params; an EMA checkpoint read
    by an EMA-less target keeps the stored EMA available."""
    from sstts.checkpoint import CheckpointManager

    cfg = _cfg()
    ema_cfg = _ema_cfg(0.5)
    batch = jax.tree.map(jnp.asarray, _one_batch(cfg))

    # pre-EMA checkpoint -> EMA target: seeded from restored params.
    state = train_mod.create_state(cfg)
    state, _ = train_mod.make_train_step(cfg)(state, batch)
    mgr = CheckpointManager(cfg, tmp_path / "pre_ema")
    mgr.save(1, jax.device_get(state))
    mgr.wait()
    assert not mgr.stored_has_ema()
    target = jax.device_get(train_mod.create_state(ema_cfg, seed=999))
    got_step, restored = mgr.restore_latest(target)
    mgr.close()
    assert got_step == 1 and restored.ema_params is not None
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state.params)),
        jax.tree.leaves(restored.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # EMA checkpoint -> EMA-less target: stored EMA survives the restore.
    estate = train_mod.create_state(ema_cfg)
    estate, _ = train_mod.make_train_step(ema_cfg)(estate, batch)
    mgr2 = CheckpointManager(ema_cfg, tmp_path / "with_ema")
    mgr2.save(1, jax.device_get(estate))
    mgr2.wait()
    assert mgr2.stored_has_ema()
    target2 = jax.device_get(train_mod.create_state(cfg, seed=999))
    got2, restored2 = mgr2.restore_latest(target2)
    mgr2.close()
    assert got2 == 1 and restored2.ema_params is not None
    for a, b in zip(
        jax.tree.leaves(jax.device_get(estate.ema_params)),
        jax.tree.leaves(restored2.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_use_ema_serving_and_eval(tmp_path):
    """`inference.use_ema` serves/evaluates the Polyak tree; a pre-EMA
    checkpoint raises a clear error instead of silently serving raw
    params."""
    from sstts.checkpoint import CheckpointManager
    from sstts.synthesize import Synthesizer

    ema_cfg = _ema_cfg(0.9)
    batch = jax.tree.map(jnp.asarray, _one_batch(ema_cfg))
    state = train_mod.create_state(ema_cfg)
    step_fn = train_mod.make_train_step(ema_cfg)
    for _ in range(3):
        state, _ = step_fn(state, batch)
    mgr = CheckpointManager(ema_cfg, tmp_path / "run")
    mgr.save(3, jax.device_get(state))
    mgr.wait()
    mgr.close()

    use = ema_cfg.replace(
        inference=dataclasses.replace(ema_cfg.inference, use_ema=True)
    )
    synth = Synthesizer.from_checkpoint(use, tmp_path / "run")
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state.ema_params)),
        jax.tree.leaves(jax.device_get(synth.variables["params"])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Pre-EMA checkpoint + use_ema -> clear error.
    raw_cfg = _cfg()
    state2 = train_mod.create_state(raw_cfg)
    mgr2 = CheckpointManager(raw_cfg, tmp_path / "raw")
    mgr2.save(1, jax.device_get(state2))
    mgr2.wait()
    mgr2.close()
    use2 = raw_cfg.replace(
        inference=dataclasses.replace(raw_cfg.inference, use_ema=True)
    )
    with pytest.raises(ValueError, match="use_ema"):
        Synthesizer.from_checkpoint(use2, tmp_path / "raw")


def test_ema_restore_pre_field_checkpoint(tmp_path):
    """Checkpoints written before TrainState had `ema_params` (no such key
    in the stored tree at all — simulated with a field-less dict save,
    which produces identical key paths) restore into the current state,
    with EMA seeded when the target wants it."""
    from sstts.checkpoint import CheckpointManager

    cfg = _cfg()
    state = train_mod.create_state(cfg)
    old_format = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    mgr = CheckpointManager(cfg, tmp_path)
    mgr.save(1, jax.device_get(old_format))
    mgr.wait()
    assert mgr._stored_ema_kind(1) == "absent"

    got_step, restored = mgr.restore_latest(
        jax.device_get(train_mod.create_state(cfg, seed=999))
    )
    assert got_step == 1 and restored.ema_params is None

    got_step2, restored2 = mgr.restore_latest(
        jax.device_get(train_mod.create_state(_ema_cfg(0.5), seed=999))
    )
    mgr.close()
    assert got_step2 == 1 and restored2.ema_params is not None
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state.params)),
        jax.tree.leaves(restored2.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_skip_splits_straddling_grouped_op():
    """A resume offset landing inside a grouped op must re-emit the
    un-run tail as singles — exact-step resume, no rows dropped.  The
    old skip-whole-op fallback consumed the entire epoch when the
    straddling op was the epoch's LAST op (observed resuming the r=2
    flagship at step 100000 = epoch x 92 + 88 with steps_per_call=8) and
    false-tripped the zero-batch corpus check."""
    idxs = np.arange(8, dtype=np.int32).reshape(8, 1)
    valids = np.ones((8, 1), np.float32)
    ops = [
        ("single", 16, np.array([9], np.int32), np.array([1.0], np.float32)),
        ("grouped", 16, idxs, valids),
    ]
    # Offset 5 lands inside the grouped op (1 single + 4 of the group).
    out = list(train_mod._skip_epoch_steps(iter(ops), 5))
    assert [o[0] for o in out] == ["single"] * 4
    np.testing.assert_array_equal(
        np.concatenate([o[2] for o in out]), idxs[4:].reshape(-1)
    )
    # Offset on a boundary: everything after yields untouched.
    out = list(train_mod._skip_epoch_steps(iter(ops), 1))
    assert [o[0] for o in out] == ["grouped"]
    # Offset consuming the whole epoch tail via a straddle still yields
    # the final steps (the regression: this used to yield nothing).
    out = list(train_mod._skip_epoch_steps(iter(ops), 8))
    assert [o[0] for o in out] == ["single"]
    assert int(out[0][2][0]) == 7
