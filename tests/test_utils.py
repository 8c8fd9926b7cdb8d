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


# --- sstts.dsp.metrics (round-5 valley-fill-robust codec-gate metrics) ---


def test_mcd_zero_on_identical_and_energy_offset():
    """MCD drops c0, so identical mels AND a constant dB offset (pure
    energy change) both measure 0 — it is a spectral-ENVELOPE metric."""
    from sstts.dsp.metrics import mcd_db

    rng = np.random.default_rng(0)
    a = rng.random((50, 80)) * 60.0 - 80.0
    assert mcd_db(a, a) == 0.0
    assert abs(mcd_db(a, a + 7.5)) < 1e-9


def test_mcd_calibration_single_cepstral_basis():
    """A perturbation along one orthonormal DCT basis k<=13 of amplitude
    `amp` (dB) must measure exactly amp/sqrt(2) (the dB-domain Kubichek
    calibration derived in metrics.mcd_db)."""
    from sstts.dsp.metrics import _dct2_rows, mcd_db

    n_mels, amp, k = 80, 6.0, 3
    base = np.zeros((10, n_mels))
    basis = _dct2_rows(n_mels, 13)[k - 1]  # unit-norm row
    pert = base + amp * basis[None, :]
    np.testing.assert_allclose(
        mcd_db(base, pert), amp / np.sqrt(2.0), rtol=1e-12
    )


def test_mcd_ignores_fine_structure_that_fools_mel_l1():
    """The valley-fill failure mode: high-order ripple across the mel axis
    (inter-harmonic fine structure) moves mel-L1 a lot but projects onto
    cepstra beyond the truncation, leaving MCD ~0.  An envelope tilt of
    the same L1 magnitude moves MCD — the metric separates the two."""
    from sstts.dsp.metrics import _dct2_rows, mcd_db

    n_mels = 80
    base = np.zeros((20, n_mels))
    ripple = 5.0 * _dct2_rows(n_mels, 40)[39][None, :]  # k=40 >> 13
    tilt = 5.0 * _dct2_rows(n_mels, 2)[1][None, :]      # k=2 <= 13
    l1_ripple = np.abs(ripple).mean()
    l1_tilt = np.abs(tilt).mean()
    assert l1_ripple > 0.5 * l1_tilt  # comparable mel-L1 footprints
    assert mcd_db(base, base + ripple) < 1e-9
    assert mcd_db(base, base + tilt) > 1.0


def test_mcd_normalized_matches_db_domain():
    """mcd_from_normalized_mel must equal mcd_db on the denormalized dB
    arrays (normalize_decibel is affine; offsets cancel, scale -min_db)."""
    from sstts.dsp.metrics import mcd_db, mcd_from_normalized_mel

    rng = np.random.default_rng(1)
    a = rng.random((30, 80))
    b = rng.random((30, 80))
    np.testing.assert_allclose(
        mcd_from_normalized_mel(a, b, min_level_db=-100.0),
        mcd_db(a * 100.0, b * 100.0),
        rtol=1e-12,
    )


def test_spectral_snr_known_ratio():
    from sstts.dsp.metrics import spectral_snr_db

    rng = np.random.default_rng(2)
    ref = rng.random((8, 100, 513)) + 0.5
    err = rng.standard_normal(ref.shape) * 0.01
    expect = 10 * np.log10((ref**2).mean() / (err**2).mean())
    np.testing.assert_allclose(
        spectral_snr_db(ref, ref + err), expect, rtol=1e-10
    )
    assert spectral_snr_db(ref, ref) > 200.0  # lossless guard


def test_peak_masked_l1_excludes_valley_fill():
    """Lifting the reference's spectral valleys (the codec valley-fill
    mechanism) must not move the peak-masked metric at all, while a real
    perturbation AT the peaks moves it one-for-one."""
    from sstts.dsp.metrics import peak_masked_l1_db

    frames, bins = 12, 200
    ref = np.full((frames, bins), -60.0)
    ref[:, ::10] = 0.0  # harmonic comb: peaks at 0 dB, valleys at -60
    filled = ref.copy()
    filled[ref < -30] = -40.0  # noise floor fills the valleys
    assert peak_masked_l1_db(ref, filled) == 0.0
    perturbed = ref.copy()
    perturbed[:, ::10] += 1.0
    np.testing.assert_allclose(peak_masked_l1_db(ref, perturbed), 1.0)


def test_peak_masked_l1_excludes_silence_frames():
    """Padding/silence frames (no genuine peak) must not contribute: a
    fixed-step codec's idle noise floor there would otherwise dominate
    the metric (observed in the round-5 gate smoke run: mu-law read 73x
    worse purely from padded frames)."""
    from sstts.dsp.metrics import peak_masked_l1_db

    ref = np.full((10, 50), -100.0)
    ref[:5, ::10] = 0.0  # first 5 frames voiced, rest silence
    test = ref.copy()
    test[5:] = -55.0  # codec idle noise in the silent frames only
    assert peak_masked_l1_db(ref, test) == 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="silence"):
        peak_masked_l1_db(np.full((4, 8), -100.0), np.full((4, 8), -100.0),
                          silence_db=-10.0)
