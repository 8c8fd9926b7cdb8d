"""Training tests (SURVEY.md §4): overfit smoke, DP-mesh sharding on the
virtual 8-device CPU mesh, checkpoint resume.

Step-variant tests (HBM-resident corpus, grouped dispatch, remat/unroll,
bf16, EMA) live in test_train_steps.py — the split keeps each module
inside the XLA-CPU compiled-state envelope (tests/train_helpers.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sstts import train as train_mod
from sstts.parallel.mesh import batch_sharding, make_mesh
from train_helpers import _cfg, _one_batch  # pytest puts tests/ on sys.path


def test_media_wav_cache_keyed_by_config():
    """Two configs sharing a frame count must NOT share a jitted eval-media
    vocoder: the vocoder closes over GL/dataset hparams, so a frame-count-
    only cache key silently produced audio from the wrong config (round-2
    verdict Weak #1)."""

    class _Logger:
        def __init__(self):
            self.audio = {}

        def log_image(self, *a, **k):
            pass

        def log_audio(self, step, tag, wav, sr):
            self.audio[step] = np.asarray(wav)

    cfg1 = _cfg()
    cfg2 = cfg1.replace(
        inference=dataclasses.replace(cfg1.inference, griffin_lim_iters=1)
    )
    r = cfg1.arch.reduction_factor
    n_frames = 4 * r
    rng = np.random.default_rng(0)
    out = {
        "alignments": rng.random((1, 4, 8), np.float32),
        "mel": rng.random((1, n_frames, cfg1.dataset.n_mels), np.float32),
        "linear": rng.random((1, n_frames, cfg1.dataset.n_linear), np.float32),
    }
    train_mod._MEDIA_WAV_FNS.clear()
    logger = _Logger()
    train_mod._log_eval_media(logger, 1, cfg1, out)
    train_mod._log_eval_media(logger, 2, cfg2, out)
    # Media logging swallows exceptions by design; assert it really ran.
    assert set(logger.audio) == {1, 2}
    assert len(train_mod._MEDIA_WAV_FNS) == 2  # one vocoder per config
    assert not np.array_equal(logger.audio[1], logger.audio[2])


@pytest.mark.fast
def test_overfit_single_batch():
    """Loss must drop sharply when training repeatedly on one batch."""
    cfg = _cfg()
    batch = jax.tree.map(jnp.asarray, _one_batch(cfg))
    state = train_mod.create_state(cfg)
    step = train_mod.make_train_step(cfg)
    first = None
    for i in range(60):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)
    # mel term alone must also improve (not just the stop token).
    assert float(metrics["loss_mel"]) < 0.25, float(metrics["loss_mel"])


def test_train_step_dp_mesh_8_devices():
    """Same step under a data-sharded 8-device mesh: runs and agrees."""
    assert len(jax.devices()) == 8
    cfg = _cfg(batch_size=8)
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    batch = _one_batch(cfg)
    sharded = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch
    )
    state = train_mod.create_state(cfg, mesh)
    step = train_mod.make_train_step(cfg, mesh)
    state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))

    # Single-device run from the same init must produce the same loss.
    state1 = train_mod.create_state(cfg)
    step1 = train_mod.make_train_step(cfg)
    _, metrics1 = step1(state1, jax.tree.map(jnp.asarray, batch))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics1["loss"]), rtol=1e-4
    )


def test_make_mesh_rejects_oversized_axes():
    """make_mesh raises a clear error instead of silently building an
    empty or short mesh when the axes don't fit the visible devices."""
    with pytest.raises(ValueError, match="devices"):
        make_mesh(model_parallel=16)  # 8//16 == 0 data rows
    with pytest.raises(ValueError, match="devices"):
        make_mesh(data_parallel=8, model_parallel=2)  # needs 16, have 8


def test_train_step_tp_dp_mesh():
    """Tensor-parallel "model" axis (4 data x 2 model): the embedding and
    post-net projection shard per TP_RULES, the Adam moments mirror them,
    and the TP loss agrees with the single-device loss."""
    assert len(jax.devices()) == 8
    cfg = _cfg(batch_size=4)
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    batch = _one_batch(cfg)
    sharded = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch
    )
    state = train_mod.create_state(cfg, mesh)

    def spec(leaf):
        return tuple(leaf.sharding.spec)

    assert spec(state.params["embedding"]["embedding"]) == (None, "model")
    assert spec(state.params["linear_proj"]["kernel"]) == ("model", None)
    # Adam moments mirror the parameter layout (adam is the chain's second
    # transform, itself a chain whose first element is scale_by_adam).
    mu = state.opt_state[1][0].mu
    assert spec(mu["embedding"]["embedding"]) == (None, "model")
    assert spec(mu["linear_proj"]["bias"]) == ()

    step = train_mod.make_train_step(cfg, mesh)
    state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))
    assert spec(state.params["embedding"]["embedding"]) == (None, "model")

    state1 = train_mod.create_state(cfg)
    step1 = train_mod.make_train_step(cfg)
    _, metrics1 = step1(state1, jax.tree.map(jnp.asarray, batch))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics1["loss"]), rtol=1e-4
    )


def test_checkpoint_save_restore(tmp_path):
    cfg = _cfg()
    from sstts.checkpoint import CheckpointManager

    state = train_mod.create_state(cfg)
    step = train_mod.make_train_step(cfg)
    batch = jax.tree.map(jnp.asarray, _one_batch(cfg))
    state, _ = step(state, batch)
    mgr = CheckpointManager(cfg, tmp_path)
    mgr.save(1, jax.device_get(state))
    mgr.wait()

    target = jax.device_get(train_mod.create_state(cfg, seed=999))
    got_step, restored = mgr.restore_latest(target)
    assert got_step == 1
    orig = jax.device_get(state)
    for a, b in zip(jax.tree.leaves(orig.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()

    # Mismatched model/dataset config must be refused; training/inference
    # knobs are deliberately NOT part of the fingerprint (overridable at
    # evaluate/synthesize time).
    relaxed = cfg.replace(
        training=dataclasses.replace(cfg.training, learning_rate=123.0)
    )
    CheckpointManager(relaxed, tmp_path).close()  # accepted
    other = cfg.replace(
        arch=dataclasses.replace(cfg.arch, embedding_dim=64)
    )
    with pytest.raises(ValueError, match="different config"):
        CheckpointManager(other, tmp_path)


def test_checkpoint_save_restore_under_mesh(tmp_path):
    """SURVEY §5.4 'restore into same sharding': save a mesh-sharded state,
    restore into a fresh mesh-created target, check tree equality and that
    one further DP step runs on the restored state."""
    from sstts.checkpoint import CheckpointManager

    assert len(jax.devices()) == 8
    cfg = _cfg(batch_size=8)
    mesh = make_mesh()
    state = train_mod.create_state(cfg, mesh)
    step = train_mod.make_train_step(cfg, mesh)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), _one_batch(cfg)
    )
    state, _ = step(state, batch)
    mgr = CheckpointManager(cfg, tmp_path)
    mgr.save(1, jax.device_get(state))
    mgr.wait()

    target = train_mod.create_state(cfg, mesh, seed=999)
    got_step, restored = mgr.restore_latest(target)
    mgr.close()
    assert got_step == 1
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state).params),
        jax.tree.leaves(jax.device_get(restored).params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The restored state must be usable by the mesh step directly.
    step2 = train_mod.make_train_step(cfg, mesh)
    batch2 = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), _one_batch(cfg)
    )
    state2, metrics = step2(restored, batch2)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    assert int(jax.device_get(state2.step)) == 2


def test_fingerprint_stable_across_non_state_knobs():
    """Knobs that don't define the trained state must not flip the
    checkpoint fingerprint (ADVICE r1: fused_conv_bank's docstring promises
    flippability on an existing checkpoint, and the precompute CLI tells
    users to add dataset.cache_dir to an existing run)."""
    cfg = _cfg()
    fp = cfg.fingerprint()
    same = [
        cfg.replace(dataset=dataclasses.replace(cfg.dataset, cache_dir="/x")),
        cfg.replace(dataset=dataclasses.replace(cfg.dataset, dataset_dir="/y")),
        cfg.replace(dataset=dataclasses.replace(cfg.dataset, dataset="csv")),
        cfg.replace(arch=dataclasses.replace(cfg.arch, fused_conv_bank=True)),
        cfg.replace(
            arch=dataclasses.replace(cfg.arch, guided_attention_weight=1.0)
        ),
        cfg.replace(
            training=dataclasses.replace(cfg.training, learning_rate=0.1)
        ),
    ]
    for variant in same:
        assert variant.fingerprint() == fp
    # State-defining knobs must still flip it.
    diff = [
        cfg.replace(dataset=dataclasses.replace(cfg.dataset, n_mels=13)),
        cfg.replace(arch=dataclasses.replace(cfg.arch, embedding_dim=64)),
        cfg.replace(
            arch=dataclasses.replace(cfg.arch, attention_type="local_luong")
        ),
    ]
    for variant in diff:
        assert variant.fingerprint() != fp


def test_train_driver_end_to_end(tmp_path):
    """Few steps of the full driver: data -> step -> checkpoint -> resume."""
    cfg = _cfg()
    cfg = cfg.replace(
        training=dataclasses.replace(
            cfg.training, batch_size=2, checkpoint_every=5, summary_every=2
        )
    )
    state = train_mod.train(cfg, workdir=tmp_path, max_steps=6, log_every=2)
    assert int(jax.device_get(state.step)) == 6
    assert (tmp_path / "metrics.jsonl").exists()
    # Resume continues from the saved step.
    state2 = train_mod.train(cfg, workdir=tmp_path, max_steps=8, log_every=2)
    assert int(jax.device_get(state2.step)) == 8


def test_resume_reproduces_uninterrupted_run(tmp_path):
    """Crash-resume must CONTINUE the data order, not replay epoch 0: a
    3-step run + resume to 6 produces bitwise the same params as one
    uninterrupted 6-step run (dropout rng is step-derived; the data order
    is epoch+offset-derived from the restored step — review finding)."""
    cfg = _cfg()
    cfg = cfg.replace(
        training=dataclasses.replace(
            cfg.training, batch_size=2, checkpoint_every=3
        )
    )
    s_once = train_mod.train(
        cfg, workdir=tmp_path / "a", max_steps=6, log_every=100
    )
    train_mod.train(cfg, workdir=tmp_path / "b", max_steps=3, log_every=100)
    s_resumed = train_mod.train(
        cfg, workdir=tmp_path / "b", max_steps=6, log_every=100
    )
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(jax.device_get(x)), np.asarray(jax.device_get(y))
        ),
        s_once.params,
        s_resumed.params,
    )


def test_train_driver_tensor_parallel(tmp_path):
    """Full driver with training.model_parallel=2: the default mesh comes
    up as (data, model) = (2, 2) on 8 devices (data capped by batch), the
    TP-sharded state trains, checkpoints, and resumes."""
    cfg = _cfg()
    cfg = cfg.replace(
        training=dataclasses.replace(
            cfg.training, batch_size=2, checkpoint_every=4, summary_every=2,
            model_parallel=2,
        )
    )
    state = train_mod.train(cfg, workdir=tmp_path, max_steps=4, log_every=2)
    assert int(jax.device_get(state.step)) == 4
    spec = tuple(state.params["embedding"]["embedding"].sharding.spec)
    assert spec == (None, "model"), spec
    state2 = train_mod.train(cfg, workdir=tmp_path, max_steps=6, log_every=2)
    assert int(jax.device_get(state2.step)) == 6


