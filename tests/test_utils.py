"""Observability tests (SURVEY.md §5.5 and §2.1 visualization): metrics
logging (JSONL + TensorBoard events), spectrogram/alignment plots, and the
evaluation driver's loss aggregation."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from sstts.config import tiny_config


def _cfg():
    cfg = tiny_config()
    return cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, dataset="synthetic", sample_rate=8000, mel_fmax=4000.0
        ),
        training=dataclasses.replace(
            cfg.training,
            batch_size=2,
            text_buckets=(96,),
            frame_buckets=(192,),
        ),
        evaluation=dataclasses.replace(cfg.evaluation, batch_size=2),
    )


def test_metrics_logger_jsonl(tmp_path):
    from sstts.utils.logging import MetricsLogger

    logger = MetricsLogger(tmp_path, use_tensorboard=False)
    logger.log(1, {"loss": jnp.float32(0.5), "lr": 1e-3})
    logger.log(2, {"loss": 0.25}, prefix="eval")
    logger.close()
    lines = [
        json.loads(s)
        for s in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert [r["step"] for r in lines] == [1, 2]
    assert lines[0]["prefix"] == "train" and lines[1]["prefix"] == "eval"
    assert abs(lines[0]["loss"] - 0.5) < 1e-9
    assert isinstance(lines[0]["loss"], float)  # jnp scalar coerced


def test_metrics_logger_tensorboard_events(tmp_path):
    """When TF is importable the logger must write real TB event files
    carrying scalar, image, and audio summaries without erroring."""
    try:
        import tensorflow  # noqa: F401
    except Exception:
        import pytest

        pytest.skip("tensorflow not importable")
    from sstts.utils.logging import MetricsLogger

    logger = MetricsLogger(tmp_path, use_tensorboard=True)
    assert logger._tb is not None
    logger.log(3, {"loss": 1.25})
    logger.log_image(3, "alignment", np.zeros((4, 5, 3), np.uint8))
    logger.log_audio(3, "wav", np.sin(np.arange(800) / 10.0), 8000)
    logger.close()
    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_plots_return_rgb_arrays(tmp_path):
    import pytest

    try:
        import matplotlib  # noqa: F401
    except Exception:
        pytest.skip("matplotlib not importable")
    from sstts.utils.visualization import (
        plot_attention_alignment,
        plot_spectrogram,
    )

    spec_png = tmp_path / "spec.png"
    img = plot_spectrogram(np.random.rand(40, 32), path=spec_png)
    assert img.ndim == 3 and img.shape[-1] == 3 and img.dtype == np.uint8
    assert spec_png.exists() and spec_png.stat().st_size > 0

    align = np.eye(20)[:, :12]
    img2 = plot_attention_alignment(align)
    assert img2.ndim == 3 and img2.shape[-1] == 3


def test_evaluate_state_aggregates_losses():
    from sstts.evaluate import evaluate_state
    from sstts.train import create_state

    import pytest

    cfg = _cfg()
    state = create_state(cfg)
    metrics = evaluate_state(cfg, state, num_batches=2)
    assert "loss" in metrics
    # Buckets too small for every utterance must raise, not return {}.
    broken = cfg.replace(
        training=dataclasses.replace(
            cfg.training, text_buckets=(4,), frame_buckets=(8,)
        )
    )
    with pytest.raises(ValueError, match="no batches"):
        evaluate_state(broken, state, num_batches=1)
    assert np.isfinite(metrics["loss"]) and metrics["loss"] > 0
    # Deterministic eval: a second pass over the same split must agree.
    again = evaluate_state(cfg, state, num_batches=2)
    assert abs(again["loss"] - metrics["loss"]) < 1e-5


def test_profiling_timed_reports_stats():
    from sstts.utils.profiling import timed

    f = jax.jit(lambda x: (x * 2).sum())
    stats = timed(f, jnp.ones((64,)), trials=3, warmup=1)
    assert stats["median_s"] > 0 and stats["p10_s"] <= stats["p90_s"]
    assert stats["trials"] == 3


def test_evaluate_driver_writes_wavs_and_plots(tmp_path):
    """`evaluate(workdir, synthesize_count=N)` restores the checkpoint and
    writes eval WAVs plus alignment/mel plots (SURVEY.md §3.3)."""
    from sstts import evaluate as eval_mod
    from sstts import train as train_mod

    cfg = _cfg()
    cfg = cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, synthetic_size=24),
        inference=dataclasses.replace(
            cfg.inference, max_decoder_steps=6, griffin_lim_iters=2,
            min_decoder_steps=2,
        ),
    )
    train_mod.train(cfg, workdir=tmp_path, max_steps=2, log_every=1)
    metrics = eval_mod.evaluate(
        cfg, tmp_path, num_batches=1, synthesize_count=2
    )
    assert np.isfinite(metrics["loss"])
    outdir = tmp_path / cfg.inference.output_dir
    # The tiny synthetic eval split may hold fewer than the requested 2.
    wavs = list(outdir.glob("eval_*.wav"))
    assert 1 <= len(wavs) <= 2
    try:
        import matplotlib  # noqa: F401
        assert len(list(outdir.glob("eval_*_alignment.png"))) == len(wavs)
        assert len(list(outdir.glob("eval_*_mel.png"))) == len(wavs)
    except ImportError:
        pass
