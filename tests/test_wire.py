"""Wire-codec tests: device encode -> host decode round trips and the
in-pipeline `inference.wire_format` synthesis paths.

Split out of test_synthesize.py (round 5): that module had grown to 27
tests, past the ~20-compile-heavy-test bound CLAUDE.md sets for the
XLA-CPU accumulated-executable segfault envelope (tests/train_helpers.py
has the incident record)."""

import dataclasses

import jax
import numpy as np
import pytest

from sstts.config import tiny_config
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
def test_mulaw_wire_roundtrip():
    """Device mu-law encode -> host decode: ~38 dB SNR on speech-scale audio."""
    import jax.numpy as jnp

    from sstts.dsp.ops import mulaw_decode_host, mulaw_encode_u8

    rng = np.random.default_rng(0)
    t = np.arange(8000) / 8000.0
    y = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 730 * t)
        + 0.02 * rng.standard_normal(8000)
    ).astype(np.float32)
    y = np.clip(y, -1, 1)
    u8 = np.asarray(mulaw_encode_u8(jnp.asarray(y)))
    assert u8.dtype == np.uint8
    back = mulaw_decode_host(u8)
    err = back - y
    snr = 10 * np.log10(np.mean(y**2) / np.mean(err**2))
    assert snr > 32.0, snr


@pytest.mark.fast
def test_adpcm4_wire_roundtrip():
    """Device adpcm4 encode -> host (cumsum) decode at ~0.52 B/sample
    (quarter of PCM16, half of mu-law).  SNR is content-dependent for
    DPCM — broadband noise raises every block's max-delta scale — so the
    bound here (>27 dB on a noise-heavy mix) is the codec's worst face;
    on speech-shaped corpus audio it measures ~37 dB
    (scripts/wire_codec_gate.py), and the copy-synthesis arm shows the
    wire error is invisible under the Griffin-Lim floor."""
    import jax.numpy as jnp

    from sstts.dsp.ops import (
        adpcm4_decode_host,
        adpcm4_encode_wire,
        adpcm4_wire_bytes,
    )

    rng = np.random.default_rng(0)
    n = 8000
    t = np.arange(n) / 8000.0
    y = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 730 * t)
        + 0.05 * np.sin(2 * np.pi * 2900 * t)
        + 0.02 * rng.standard_normal(n)
    ).astype(np.float32)
    y = np.clip(y, -1, 1)
    for amp in (1.0, 0.05, 0.002):  # block scales are f16: level-invariant
        x = (amp * y).astype(np.float32)
        wire = np.asarray(adpcm4_encode_wire(jnp.asarray(x[None, :])))
        assert wire.dtype == np.uint8
        assert wire.shape == (1, adpcm4_wire_bytes(n))
        back = adpcm4_decode_host(wire[0], n)
        snr = 10 * np.log10(np.mean(x**2) / np.mean((back - x) ** 2))
        assert snr > 27.0, (amp, snr)
    # Non-block-multiple length: padding must not corrupt the kept samples.
    x = y[: 1000]
    wire = np.asarray(adpcm4_encode_wire(jnp.asarray(x[None, :])))
    back = adpcm4_decode_host(wire[0], 1000)
    assert back.shape == (1000,)
    snr = 10 * np.log10(np.mean(x**2) / np.mean((back - x) ** 2))
    assert snr > 27.0, snr


@pytest.mark.fast
def test_adpcm3_wire_roundtrip():
    """Device adpcm3 encode -> host decode at ~0.39 B/sample (the adpcm4
    codec minus one quantizer bit, ~6 dB).  Same worst-face noise-heavy
    mix as the adpcm4 test with the bound dropped accordingly; corpus-
    speech SNR and the copy-synthesis arm live in
    scripts/wire_codec_gate.py."""
    import jax.numpy as jnp

    from sstts.dsp.ops import (
        adpcm3_decode_host,
        adpcm3_encode_wire,
        adpcm3_wire_bytes,
    )

    rng = np.random.default_rng(0)
    n = 8000
    t = np.arange(n) / 8000.0
    y = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 730 * t)
        + 0.05 * np.sin(2 * np.pi * 2900 * t)
        + 0.02 * rng.standard_normal(n)
    ).astype(np.float32)
    y = np.clip(y, -1, 1)
    for amp in (1.0, 0.05, 0.002):  # block scales are f16: level-invariant
        x = (amp * y).astype(np.float32)
        wire = np.asarray(adpcm3_encode_wire(jnp.asarray(x[None, :])))
        assert wire.dtype == np.uint8
        assert wire.shape == (1, adpcm3_wire_bytes(n))
        back = adpcm3_decode_host(wire[0], n)
        snr = 10 * np.log10(np.mean(x**2) / np.mean((back - x) ** 2))
        assert snr > 21.0, (amp, snr)
    # Non-block-multiple length: padding must not corrupt the kept samples.
    x = y[:1000]
    wire = np.asarray(adpcm3_encode_wire(jnp.asarray(x[None, :])))
    back = adpcm3_decode_host(wire[0], 1000)
    assert back.shape == (1000,)
    snr = 10 * np.log10(np.mean(x**2) / np.mean((back - x) ** 2))
    assert snr > 21.0, snr


def test_adpcm3_wire_format_synthesis(synth):
    """wire_format='adpcm3' produces audio close to the PCM16 path (same
    params/seed), at ~1/5 the wire bytes."""
    cfg, _ = synth
    cfg3 = cfg.replace(
        inference=dataclasses.replace(cfg.inference, wire_format="adpcm3")
    )
    state = jax.device_get(create_state(cfg))
    s16 = Synthesizer(cfg, state.params, state.batch_stats, seed=7)
    s3 = Synthesizer(cfg3, state.params, state.batch_stats, seed=7)
    w16 = s16.synthesize_batch(["hello world", "abc"])
    w3 = s3.synthesize_batch(["hello world", "abc"])
    assert all(len(a) == len(b) for a, b in zip(w16, w3))
    for a, b in zip(w16, w3):
        if len(a) == 0:
            continue
        scale = max(float(np.abs(a).max()), 1e-3)
        assert np.abs(a - b).max() / scale < 0.2


def test_adpcm4_wire_format_synthesis(synth):
    """wire_format='adpcm4' produces audio close to the PCM16 path (same
    params/seed), at ~quarter the wire bytes."""
    cfg, _ = synth
    cfg4 = cfg.replace(
        inference=dataclasses.replace(cfg.inference, wire_format="adpcm4")
    )
    state = jax.device_get(create_state(cfg))
    s16 = Synthesizer(cfg, state.params, state.batch_stats, seed=7)
    s4 = Synthesizer(cfg4, state.params, state.batch_stats, seed=7)
    w16 = s16.synthesize_batch(["hello world", "abc"])
    w4 = s4.synthesize_batch(["hello world", "abc"])
    assert all(len(a) == len(b) for a, b in zip(w16, w4))
    for a, b in zip(w16, w4):
        if len(a) == 0:
            continue
        scale = max(float(np.abs(a).max()), 1e-3)
        assert np.abs(a - b).max() / scale < 0.1


def test_mulaw_wire_format_synthesis(synth):
    """wire_format='mulaw8' produces audio close to the PCM16 path (same
    params/seed), at half the wire bytes."""
    cfg, s16 = synth
    cfg8 = cfg.replace(
        inference=dataclasses.replace(cfg.inference, wire_format="mulaw8")
    )
    state = jax.device_get(create_state(cfg))
    s16 = Synthesizer(cfg, state.params, state.batch_stats, seed=7)
    s8 = Synthesizer(cfg8, state.params, state.batch_stats, seed=7)
    w16 = s16.synthesize_batch(["hello world", "abc"])
    w8 = s8.synthesize_batch(["hello world", "abc"])
    assert all(len(a) == len(b) for a, b in zip(w16, w8))
    for a, b in zip(w16, w8):
        if len(a) == 0:
            continue
        scale = max(float(np.abs(a).max()), 1e-3)
        assert np.abs(a - b).max() / scale < 0.1

    with pytest.raises(ValueError, match="wire_format"):
        Synthesizer(
            cfg.replace(
                inference=dataclasses.replace(
                    cfg.inference, wire_format="opus"
                )
            ),
            state.params,
            state.batch_stats,
        )


@pytest.mark.fast
def test_adpcm2_wire_roundtrip():
    """Device adpcm2 encode -> host decode at ~0.27 B/sample (2 bits on a
    mid-rise lattice — see the `_dpcm_quantize_blocks` offset note).  One
    quantizer bit below adpcm3 costs ~6 dB: same worst-case mix, bound
    dropped accordingly.  Serving admission is decided by the numeric
    gates in scripts/wire_codec_gate.py."""
    import jax.numpy as jnp

    from sstts.dsp.ops import (
        adpcm2_decode_host,
        adpcm2_encode_wire,
        adpcm2_wire_bytes,
    )

    rng = np.random.default_rng(0)
    n = 8000
    t = np.arange(n) / 8000.0
    y = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 730 * t)
        + 0.05 * np.sin(2 * np.pi * 2900 * t)
        + 0.02 * rng.standard_normal(n)
    ).astype(np.float32)
    y = np.clip(y, -1, 1)
    for amp in (1.0, 0.05, 0.002):  # block scales are f16: level-invariant
        x = (amp * y).astype(np.float32)
        wire = np.asarray(adpcm2_encode_wire(jnp.asarray(x[None, :])))
        assert wire.dtype == np.uint8
        assert wire.shape == (1, adpcm2_wire_bytes(n))
        back = adpcm2_decode_host(wire[0], n)
        snr = 10 * np.log10(np.mean(x**2) / np.mean((back - x) ** 2))
        assert snr > 14.0, (amp, snr)
    # Non-block-multiple length: padding must not corrupt the kept samples.
    x = y[:1000]
    wire = np.asarray(adpcm2_encode_wire(jnp.asarray(x[None, :])))
    back = adpcm2_decode_host(wire[0], 1000)
    assert back.shape == (1000,)
    snr = 10 * np.log10(np.mean(x**2) / np.mean((back - x) ** 2))
    assert snr > 14.0, snr


def test_adpcm2_noise_shaping_roundtrip():
    """`adpcm2_encode_wire(ns_beta=...)`: the shaped encode must decode
    through the UNCHANGED decoder (shaping is encoder-only; the wire
    layout is bit-identical), land within a few dB of the unshaped SNR,
    and actually move quantization-error energy out of the low band
    (first-order high-pass: |1 - beta*z^-1|).  Admission outcome lives
    in scripts/ns_beta_sweep.py (rejected for serving; the knob stays)."""
    import jax.numpy as jnp

    from sstts.dsp.ops import (
        adpcm2_decode_host,
        adpcm2_encode_wire,
        adpcm2_wire_bytes,
    )

    rng = np.random.default_rng(1)
    n = 8000
    t = np.arange(n) / 8000.0
    x = np.clip(
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 730 * t)
        + 0.02 * rng.standard_normal(n),
        -1,
        1,
    ).astype(np.float32)

    def err_of(beta):
        wire = np.asarray(adpcm2_encode_wire(jnp.asarray(x[None]), ns_beta=beta))
        assert wire.shape == (1, adpcm2_wire_bytes(n))
        return adpcm2_decode_host(wire[0], n) - x

    e0, e6 = err_of(0.0), err_of(0.6)
    snr0 = 10 * np.log10(np.mean(x**2) / np.mean(e0**2))
    snr6 = 10 * np.log10(np.mean(x**2) / np.mean(e6**2))
    assert snr6 > snr0 - 4.0, (snr0, snr6)  # bounded total-power cost

    def low_band_power(e):  # error energy below fs/8
        spec = np.abs(np.fft.rfft(e)) ** 2
        return float(spec[: len(spec) // 4].sum() / spec.sum())

    assert low_band_power(e6) < low_band_power(e0), (
        low_band_power(e0),
        low_band_power(e6),
    )


def test_adpcm2_wire_format_synthesis(synth):
    """wire_format='adpcm2' produces audio close to the PCM16 path (same
    params/seed), at ~1/7.5 the wire bytes."""
    cfg, _ = synth
    cfg2 = cfg.replace(
        inference=dataclasses.replace(cfg.inference, wire_format="adpcm2")
    )
    state = jax.device_get(create_state(cfg))
    s16 = Synthesizer(cfg, state.params, state.batch_stats, seed=7)
    s2 = Synthesizer(cfg2, state.params, state.batch_stats, seed=7)
    w16 = s16.synthesize_batch(["hello world", "abc"])
    w2 = s2.synthesize_batch(["hello world", "abc"])
    assert all(len(a) == len(b) for a, b in zip(w16, w2))
    for a, b in zip(w16, w2):
        if len(a) == 0:
            continue
        scale = max(float(np.abs(a).max()), 1e-3)
        assert np.abs(a - b).max() / scale < 0.35
