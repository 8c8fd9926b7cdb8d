"""Synthesis pipeline tests: compiled text->WAV program, bucketing, CLI."""

import dataclasses

import jax
import numpy as np
import pytest

from sstts.cli import apply_overrides
from sstts.config import Config, tiny_config
from sstts.synthesize import Synthesizer
from sstts.train import create_state


@pytest.fixture(scope="module")
def synth():
    cfg = tiny_config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, dataset="synthetic", sample_rate=8000, mel_fmax=4000.0
        ),
        inference=dataclasses.replace(
            cfg.inference, max_decoder_steps=6, griffin_lim_iters=3,
            min_decoder_steps=2,
        ),
    )
    state = jax.device_get(create_state(cfg))
    return cfg, Synthesizer(cfg, state.params, state.batch_stats)


@pytest.mark.fast
def test_synthesize_single(synth):
    cfg, s = synth
    wav = s.synthesize("hello world")
    assert wav.dtype == np.float32
    assert wav.ndim == 1
    assert len(wav) > 0
    assert np.isfinite(wav).all()
    max_len = (cfg.inference.max_decoder_steps * cfg.arch.reduction_factor) * cfg.dataset.hop_len
    assert len(wav) <= max_len


def test_synthesize_batch_lengths_vary(synth):
    cfg, s = synth
    wavs, full = s.synthesize_batch(
        ["hi", "a much longer sentence to speak"], full_output=True
    )
    assert len(wavs) == 2
    # Each wav is trimmed to its own stop length.
    for w, n in zip(wavs, full["n_samples"]):
        assert len(w) == int(n)
    assert full["alignments"].shape[0] == 2


def test_synthesize_overlength_text_raises(synth):
    """Text longer than dataset.max_text_len must raise instead of
    silently compiling an unbounded-width program the model never trained
    on (review finding; synthesize_longform is the document path)."""
    cfg, s = synth
    too_long = "a" * (cfg.dataset.max_text_len * 3)
    with pytest.raises(ValueError, match="max_text_len"):
        s.synthesize_batch([too_long])
    # An explicit bucket smaller than the longest text is an error too.
    with pytest.raises(ValueError, match="text_bucket"):
        s.synthesize_batch(["hello world"], text_bucket=4)


def test_longform_rejects_full_output(synth):
    cfg, s = synth
    with pytest.raises(ValueError, match="full_output"):
        s.synthesize_longform("one. two.", full_output=True)


def test_synthesize_to_file(synth, tmp_path):
    cfg, s = synth
    p = s.to_file("test output", tmp_path / "out.wav")
    from sstts.data.wav import load_wav

    y, sr = load_wav(p)
    assert sr == cfg.dataset.sample_rate
    assert len(y) > 0


def test_cli_overrides():
    cfg = apply_overrides(
        Config(),
        [
            "training.batch_size=8",
            "dataset.dataset_dir=/tmp/x",
            "arch.reduction_factor=2",
            "inference.griffin_lim_iters=30",
        ],
    )
    assert cfg.training.batch_size == 8
    assert cfg.dataset.dataset_dir == "/tmp/x"
    assert cfg.arch.reduction_factor == 2
    assert cfg.inference.griffin_lim_iters == 30


def test_cli_override_rejects_unknown():
    with pytest.raises(SystemExit):
        apply_overrides(Config(), ["training.nope=1"])
    with pytest.raises(SystemExit):
        apply_overrides(Config(), ["bogus.field=1"])


def test_long_form_fixed_shape_scan(synth):
    """BASELINE config 4 (scaled down): decoder steps >> typical utterance,
    one fixed-shape program, stop masking still correct."""
    cfg, s = synth
    wavs, full = s.synthesize_batch(
        ["one two three"], max_steps=64, full_output=True
    )
    r = cfg.arch.reduction_factor
    assert full["mel"].shape[1] == 64 * r
    assert full["n_frames"][0] <= 64 * r
    assert len(wavs[0]) == int(full["n_samples"][0])
    assert np.isfinite(wavs[0]).all()


def test_resynthesis_metrics(synth, tmp_path):
    import dataclasses as dc
    import jax
    from sstts.evaluate import resynthesis_metrics
    from sstts.train import create_state

    cfg, _ = synth
    cfg = cfg.replace(
        dataset=dc.replace(cfg.dataset, synthetic_size=16),
        training=dc.replace(cfg.training, text_buckets=(64,), frame_buckets=(512,)),
    )
    state = jax.device_get(create_state(cfg))
    m = resynthesis_metrics(cfg, state, num_utterances=2)
    # The tiny synthetic eval split may hold fewer than the requested count.
    assert 1 <= m["resynthesis_utterances"] <= 2
    assert m["resynthesis_len_rel_err"] >= 0


def test_pipelined_chunked_synthesis_matches_fused(synth):
    """pipeline_chunks>1 is a throughput knob, never a math change."""
    cfg, s = synth
    texts = ["hello world", "a longer sentence", "hi", "four texts here"]
    fused = s.synthesize_batch(texts)

    chunked_cfg = cfg.replace(
        inference=dataclasses.replace(
            cfg.inference, pipeline_chunks=2, fetch_threads=2
        )
    )
    s2 = Synthesizer(chunked_cfg, jax.device_get(s.variables)["params"],
                     jax.device_get(s.variables)["batch_stats"])
    chunked = s2.synthesize_batch(texts)
    assert len(fused) == len(chunked)
    for a, b in zip(fused, chunked):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_pipelined_chunks_non_divisible_batch(synth):
    cfg, s = synth
    chunked_cfg = cfg.replace(
        inference=dataclasses.replace(
            cfg.inference, pipeline_chunks=4, fetch_threads=2
        )
    )
    s2 = Synthesizer(chunked_cfg, jax.device_get(s.variables)["params"],
                     jax.device_get(s.variables)["batch_stats"])
    # batch=3 with pipeline_chunks=4 -> falls back to 3 chunks of 1.
    wavs = s2.synthesize_batch(["one", "two texts", "three little words"])
    assert len(wavs) == 3
    for w in wavs:
        assert np.isfinite(w).all() and len(w) > 0


def test_synthesize_stream_matches_batch(synth):
    cfg, s = synth
    texts = ["hello world", "stream me"]
    want = s.synthesize_batch(texts)
    got_batches = list(s.synthesize_stream([texts] * 3, depth=2))
    assert len(got_batches) == 3
    for got in got_batches:
        assert len(got) == len(want)
        for a, b in zip(want, got):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=1e-4)


def test_mesh_data_parallel_synthesis(synth):
    """Batch sharded over an 8-device mesh == single-device synthesis."""
    from sstts.parallel.mesh import make_mesh

    cfg, s = synth
    mesh = make_mesh(jax.devices())
    assert mesh.shape["data"] == 8
    params = jax.device_get(s.variables)["params"]
    stats = jax.device_get(s.variables)["batch_stats"]
    sm = Synthesizer(cfg, params, stats, mesh=mesh)
    texts = ["hello world"] * 8
    want = s.synthesize_batch(texts)
    got = sm.synthesize_batch(texts)
    assert len(got) == 8
    for a, b in zip(want, got):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_gl_impl_config_overrides(synth):
    """InferenceConfig.griffin_lim_{fft,iter}_impl select the vocoder
    implementation per config (no module-global mutation needed)."""
    cfg, s = synth
    base = s.synthesize("config override test")
    fused_cfg = cfg.replace(
        inference=dataclasses.replace(
            cfg.inference,
            griffin_lim_fft_impl="dft_high",
            griffin_lim_iter_impl="fused",
        )
    )
    state = jax.device_get(create_state(cfg))
    s2 = Synthesizer(fused_cfg, state.params, state.batch_stats)
    wav = s2.synthesize("config override test")
    assert wav.shape == base.shape and np.isfinite(wav).all()


def test_mesh_shard_map_synthesis(synth):
    """partition="shard_map" maps the per-shard program (Pallas kernels
    included) over the mesh; the fused GL impl is forced to prove custom
    kernels survive inside shard_map."""
    from sstts.parallel.mesh import make_mesh

    cfg, s = synth
    fused_cfg = cfg.replace(
        inference=dataclasses.replace(
            cfg.inference, griffin_lim_iter_impl="fused"
        )
    )
    mesh = make_mesh(jax.devices())
    params = jax.device_get(s.variables)["params"]
    stats = jax.device_get(s.variables)["batch_stats"]
    sm = Synthesizer(
        fused_cfg, params, stats, mesh=mesh, partition="shard_map"
    )
    texts = ["hello world"] * 8
    got = sm.synthesize_batch(texts)
    assert len(got) == 8
    # Prenet dropout streams fold in the shard index, so waveforms are not
    # bitwise-comparable to the single-device run; the stop-token trim
    # contract must still hold: every waveform is non-empty and no longer
    # than max_decoder_steps' worth of audio.
    r = cfg.arch.reduction_factor
    max_len = (cfg.inference.max_decoder_steps * r - 1) * cfg.dataset.hop_len
    for a in got:
        assert np.isfinite(a).all()
        assert 0 < len(a) <= max_len
        assert len(a) % cfg.dataset.hop_len == 0

    # Streaming API under a mesh goes through the same partitioned program.
    outs = list(sm.synthesize_stream([texts] * 2, depth=1))
    assert [len(o) for o in outs] == [8, 8]


def test_split_sentences_budget_and_packing():
    from sstts.data.text import split_sentences

    text = ("Hello world. This is a test! A very very long sentence that "
            "goes on and should split at word boundaries. Short.")
    chunks = split_sentences(text, 40)
    assert all(len(c) <= 40 for c in chunks)
    # Re-joining loses nothing but the inter-chunk spaces.
    from sstts.data.text import normalize
    assert " ".join(chunks) == normalize(text)
    assert split_sentences("", 40) == []
    assert split_sentences("x" * 90, 30) == ["x" * 30] * 3
    # Ordering: a hard-cut word must not jump ahead of preceding words.
    assert split_sentences("hi " + "x" * 60 + " there", 30) == [
        "hi", "x" * 30, "x" * 30, "there",
    ]
    with pytest.raises(ValueError, match="positive"):
        split_sentences("hello", 0)


def test_synthesize_longform(synth):
    cfg, s = synth
    text = "hello world. this is a longer paragraph input! with sentences."
    wav = s.synthesize_longform(text, max_chars=20, gap_ms=50.0)
    assert wav.dtype == np.float32 and wav.ndim == 1
    from sstts.data.text import split_sentences
    n_chunks = len(split_sentences(text, 20))
    assert n_chunks > 1
    gap = int(cfg.dataset.sample_rate * 50.0 / 1000.0)
    # At least the inter-chunk gaps' worth of audio beyond one utterance.
    assert len(wav) >= (n_chunks - 1) * gap
    assert np.isfinite(wav).all()
    # Empty input -> empty waveform, no dispatch.
    assert len(s.synthesize_longform("")) == 0
    # Explicit invalid budget surfaces, not silently defaulted.
    with pytest.raises(ValueError, match="positive"):
        s.synthesize_longform("hello", max_chars=0)


def test_synthesize_longform_on_mesh(synth):
    """Chunk counts that do not divide the mesh data axis must still work
    (the batch pads to a bucketed, axis-divisible size)."""
    from sstts.parallel.mesh import make_mesh

    cfg, s = synth
    mesh = make_mesh(jax.devices())
    params = jax.device_get(s.variables)["params"]
    stats = jax.device_get(s.variables)["batch_stats"]
    sm = Synthesizer(cfg, params, stats, mesh=mesh)
    wav = sm.synthesize_longform(
        "one sentence. two sentences! three now.", max_chars=15
    )
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()


def test_decoder_impl_resolution(synth):
    """decoder_impl: auto resolves to the XLA scan off-TPU; 'fused' is
    rejected for the local-Luong attention variant; unknown values raise."""
    cfg, _ = synth
    state = jax.device_get(create_state(cfg))
    s = Synthesizer(cfg, state.params, state.batch_stats)
    assert s._decoder_impl == "xla"  # CPU backend

    bad = cfg.replace(
        inference=dataclasses.replace(cfg.inference, decoder_impl="nope")
    )
    with pytest.raises(ValueError, match="decoder_impl"):
        Synthesizer(bad, state.params, state.batch_stats)

    luong = cfg.replace(
        arch=dataclasses.replace(cfg.arch, attention_type="local_luong"),
        inference=dataclasses.replace(cfg.inference, decoder_impl="fused"),
    )
    with pytest.raises(ValueError, match="Bahdanau"):
        Synthesizer(luong, state.params, state.batch_stats)
