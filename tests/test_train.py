"""Training tests (SURVEY.md §4): overfit smoke, DP-mesh sharding on the
virtual 8-device CPU mesh, checkpoint resume."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sstts import train as train_mod
from sstts.config import (
    Config,
    DatasetConfig,
    InferenceConfig,
    TrainingConfig,
    tiny_config,
)
from sstts.data import pipeline as pipeline_mod
from sstts.data.synthetic import make_utterances
from sstts.parallel.mesh import batch_sharding, make_mesh


def _cfg(batch_size=2):
    cfg = tiny_config()
    return cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, dataset="synthetic", sample_rate=8000, mel_fmax=4000.0
        ),
        training=dataclasses.replace(
            cfg.training,
            batch_size=batch_size,
            text_buckets=(48,),
            frame_buckets=(96,),
            learning_rate=2e-3,
        ),
    )


def _one_batch(cfg, n=None):
    utts = make_utterances(8, cfg.dataset, min_words=1, max_words=2)
    b = pipeline_mod.Batcher(utts, cfg)
    for _, batch in b.epoch(0, n or cfg.training.batch_size):
        return batch
    raise AssertionError("no batch produced")


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
