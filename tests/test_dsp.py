"""Golden DSP tests: on-device JAX implementations vs the float64 numpy oracle.

SURVEY.md §4: assert <=1e-5 on STFT/mel/dB round-trips, <=1e-3 end-to-end."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.fast  # whole module is in the <5 min smoke tier

from sstts.config import Config, DatasetConfig
from sstts.dsp import griffin_lim as gl
from sstts.dsp import ops
from sstts.dsp import reference as ref
import sstts.dsp.stft as stft_mod

CFG = DatasetConfig(n_fft=512, win_len_ms=50.0, win_hop_ms=12.5, sample_rate=8000, n_mels=40, mel_fmax=4000.0)
# -> win=400, hop=100 at 8 kHz: fast tests, odd (non-divisor) sizes exercised
# by the full-size config below.
FULL = DatasetConfig()  # 22050 Hz, n_fft=2048, win=1102, hop=275


def _signal(n, sr, rng):
    t = np.arange(n) / sr
    y = 0.5 * np.sin(2 * np.pi * 220.0 * t) + 0.3 * np.sin(2 * np.pi * 1333.0 * t)
    y += 0.05 * rng.standard_normal(n)
    return y.astype(np.float64)


def test_hann_window_periodic():
    w = ref.hann_window(8)
    assert w[0] == 0.0
    # Periodic window: w[k] = 0.5 - 0.5 cos(2 pi k / N).
    np.testing.assert_allclose(w[4], 1.0, atol=1e-12)


@pytest.mark.parametrize("cfg", [CFG, FULL], ids=["small", "full"])
def test_stft_matches_oracle(cfg, rng):
    n = cfg.sample_rate  # 1 second
    y = _signal(n, cfg.sample_rate, rng)
    want = ref.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len)
    got = np.asarray(stft_mod.stft(jnp.asarray(y, jnp.float32), cfg.n_fft, cfg.hop_len, cfg.win_len))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)


@pytest.mark.parametrize("cfg", [CFG, FULL], ids=["small", "full"])
def test_istft_roundtrip_matches_oracle(cfg, rng):
    n = cfg.sample_rate
    y = _signal(n, cfg.sample_rate, rng)
    spec = ref.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len)
    want = ref.istft(spec, cfg.n_fft, cfg.hop_len, cfg.win_len, n)
    got = np.asarray(
        stft_mod.istft(jnp.asarray(spec, jnp.complex64), cfg.n_fft, cfg.hop_len, cfg.win_len, n)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
    # Perfect reconstruction away from edges.
    np.testing.assert_allclose(got[cfg.n_fft : -cfg.n_fft], y[cfg.n_fft : -cfg.n_fft], atol=1e-4)


def test_stft_batched_matches_single(rng):
    cfg = CFG
    n = 4000
    ys = np.stack([_signal(n, cfg.sample_rate, rng) for _ in range(3)]).astype(np.float32)
    batched = np.asarray(stft_mod.stft(jnp.asarray(ys), cfg.n_fft, cfg.hop_len, cfg.win_len))
    for i in range(3):
        single = np.asarray(stft_mod.stft(jnp.asarray(ys[i]), cfg.n_fft, cfg.hop_len, cfg.win_len))
        np.testing.assert_array_equal(batched[i], single)


def test_mel_filterbank_matches_slaney_properties():
    fb = ref.mel_filterbank(22050, 2048, 80, 0.0, 11025.0)
    assert fb.shape == (80, 1025)
    assert (fb >= 0).all()
    # Every filter is non-empty and unimodal triangular.
    assert (fb.max(axis=1) > 0).all()
    # Slaney normalization: filter areas scale like 2/bandwidth; spot-check
    # integral of each filter against its analytic value.
    mel_f = ref.mel_to_hz(np.linspace(ref.hz_to_mel(0.0), ref.hz_to_mel(11025.0), 82))
    df = 22050 / 2 / 1024
    areas = fb.sum(axis=1) * df
    # Triangle area = bandwidth/2, normalized by 2/bandwidth -> ~1.0.
    np.testing.assert_allclose(areas[5:-5], 1.0, rtol=0.05)


def test_hz_mel_roundtrip():
    f = np.linspace(10.0, 11000.0, 257)
    np.testing.assert_allclose(ref.mel_to_hz(ref.hz_to_mel(f)), f, rtol=1e-10)


def test_preemphasis_matches_and_inverts(rng):
    y = rng.standard_normal(5000).astype(np.float32)
    want = ref.preemphasis(y, 0.97)
    got = np.asarray(ops.preemphasis(jnp.asarray(y), 0.97))
    np.testing.assert_allclose(got, want, atol=1e-6)
    oracle_back = ref.deemphasis(want, 0.97)
    # Block-parallel (production) and associative-scan (oracle) inverses.
    for fn in (ops.deemphasis, ops.deemphasis_exact):
        back = np.asarray(fn(jnp.asarray(got), 0.97))
        np.testing.assert_allclose(back, y, atol=2e-4)
        np.testing.assert_allclose(back, oracle_back, atol=2e-4)


def test_deemphasis_block_matches_exact_batched(rng):
    y = rng.standard_normal((3, 7001)).astype(np.float32)  # non-multiple of block
    a = np.asarray(ops.deemphasis(jnp.asarray(y), 0.97))
    b = np.asarray(ops.deemphasis_exact(jnp.asarray(y), 0.97))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_db_conversions_match(rng):
    x = np.abs(rng.standard_normal((7, 13))).astype(np.float32) * 10
    np.testing.assert_allclose(
        np.asarray(ops.magnitude_to_decibel(jnp.asarray(x))),
        ref.magnitude_to_decibel(x),
        atol=1e-4,
    )
    db = ref.magnitude_to_decibel(x)
    norm = ref.normalize_decibel(db, 20.0, -100.0)
    np.testing.assert_allclose(
        np.asarray(ops.normalize_decibel(jnp.asarray(db, jnp.float32), 20.0, -100.0)),
        norm,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ops.inv_normalize_decibel(jnp.asarray(norm, jnp.float32), 20.0, -100.0)),
        ref.inv_normalize_decibel(norm, 20.0, -100.0),
        atol=1e-4,
    )


@pytest.mark.parametrize("cfg", [CFG, FULL], ids=["small", "full"])
def test_features_match_oracle_end_to_end(cfg, rng):
    n = cfg.sample_rate
    y = _signal(n, cfg.sample_rate, rng)
    pre = ref.preemphasis(y, cfg.preemphasis)
    want_lin = ref.normalize_decibel(
        ref.magnitude_to_decibel(
            ref.linear_scale_spectrogram(pre, cfg.n_fft, cfg.hop_len, cfg.win_len)
        ),
        cfg.ref_level_db,
        cfg.min_level_db,
    )
    want_mel = ref.normalize_decibel(
        ref.magnitude_to_decibel(
            ref.mel_scale_spectrogram(
                pre, cfg.sample_rate, cfg.n_fft, cfg.hop_len, cfg.win_len,
                cfg.n_mels, cfg.mel_fmin, cfg.mel_fmax,
            )
        ),
        cfg.ref_level_db,
        cfg.min_level_db,
    )
    lin, mel = ops.wav_to_features(jnp.asarray(y, jnp.float32), cfg)
    # SURVEY.md acceptance gate: <=1e-3 end-to-end on normalized features.
    assert np.abs(np.asarray(lin) - want_lin).mean() < 1e-3
    assert np.abs(np.asarray(mel) - want_mel).mean() < 1e-3
    assert np.abs(np.asarray(lin) - want_lin).max() < 1e-2


def test_features_rejects_unknown_fft_impl():
    """A typo'd training.feature_fft_impl fails with a clear ValueError at
    trace time, not a bare KeyError from inside the jitted step."""
    y = jnp.zeros((2, 4000), jnp.float32)
    with pytest.raises(ValueError, match="fft_impl"):
        ops.wav_to_features(y, CFG, fft_impl="dft")


@pytest.mark.parametrize("cfg", [CFG, FULL], ids=["small", "full"])
def test_features_dft_impl_matches_default(cfg, rng):
    """training.feature_fft_impl's support-reduced DFT-GEMM path computes
    the same features as the XLA-FFT default (f32 precision ladder rung)."""
    y = np.stack(
        [_signal(cfg.sample_rate, cfg.sample_rate, rng) for _ in range(3)]
    )
    lin0, mel0 = ops.wav_to_features(jnp.asarray(y, jnp.float32), cfg)
    lin1, mel1 = ops.wav_to_features(
        jnp.asarray(y, jnp.float32), cfg, fft_impl="dft_highest"
    )
    assert lin1.shape == lin0.shape and mel1.shape == mel0.shape
    # Near-silent bins sit on the dB floor where log10 amplifies f32
    # rounding, so the max tolerance is looser than the ~1e-5 typical error
    # (same structure as the golden gate: tight mean, loose max).
    dlin = np.abs(np.asarray(lin1) - np.asarray(lin0))
    dmel = np.abs(np.asarray(mel1) - np.asarray(mel0))
    assert dlin.mean() < 1e-5 and dlin.max() < 2e-3
    assert dmel.mean() < 1e-5 and dmel.max() < 2e-3


def test_overlap_add_inverts_framing(rng):
    y = rng.standard_normal((2, 3000)).astype(np.float32)
    frames = stft_mod.frame_signal(jnp.asarray(y), 512, 100)
    # Sum of squared-window-free OLA equals sliding sum; instead check framing
    # content directly.
    fr = np.asarray(frames)
    for i in range(0, fr.shape[1], 7):
        np.testing.assert_array_equal(fr[:, i], y[:, i * 100 : i * 100 + 512])


def test_griffin_lim_matches_oracle(rng):
    cfg = CFG
    n = 4000
    y = _signal(n, cfg.sample_rate, rng)
    mag = np.abs(ref.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len))
    want = ref.griffin_lim(mag, cfg.n_fft, cfg.hop_len, cfg.win_len, 8, n)
    got = np.asarray(
        gl.griffin_lim(jnp.asarray(mag, jnp.float32), cfg.n_fft, cfg.hop_len, cfg.win_len, 8, n)
    )
    err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert err < 1e-2, err
    # And it actually reconstructs something close to the source spectrum.
    got_mag = np.abs(ref.stft(got.astype(np.float64), cfg.n_fft, cfg.hop_len, cfg.win_len))
    rel = np.abs(got_mag - mag).mean() / mag.mean()
    assert rel < 0.35, rel


def test_spectrogram_to_wav_pipeline_runs(rng):
    cfg = Config(dataset=CFG)
    n = 2000
    y = _signal(n, CFG.sample_rate, rng)
    lin, _ = ops.wav_to_features(jnp.asarray(y, jnp.float32), CFG)
    wav = gl.spectrogram_to_wav(lin, cfg, n)
    wav = np.asarray(wav)
    assert wav.shape == (n,)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() > 1e-3


def test_matmul_fft_matches_numpy(rng):
    """MXU matmul FFT (sstts.dsp.fft) vs numpy, fwd + inverse + roundtrip."""
    from sstts.dsp import fft as mmfft

    for n in (64, 512, 2048):
        assert mmfft.supported(n)
        x = rng.standard_normal((2, 3, n)).astype(np.float32)
        want = np.fft.rfft(x, n=n, axis=-1)
        got = np.asarray(mmfft.rfft(jnp.asarray(x), n))
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
        back = np.asarray(mmfft.irfft(jnp.asarray(want.astype(np.complex64)), n))
        np.testing.assert_allclose(back, x, atol=1e-5)


def test_matmul_fft_fallback_for_odd_sizes():
    from sstts.dsp import fft as mmfft

    # Odd n is unsupported -> silently falls back to jnp.fft.
    assert not mmfft.supported(63)
    x = jnp.ones((2, 63))
    out = np.asarray(mmfft.rfft(x, 63))
    np.testing.assert_allclose(out, np.fft.rfft(np.ones((2, 63)), axis=-1), atol=1e-5)


def test_griffin_lim_momentum_converges_faster(rng):
    """Fast-GL (momentum) at half the iterations reaches classic-GL quality."""
    cfg = CFG
    n = 4000
    y = _signal(n, cfg.sample_rate, rng)
    mag = np.abs(ref.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len)).astype(np.float32)

    def spectral_err(wav):
        got = np.abs(ref.stft(wav.astype(np.float64), cfg.n_fft, cfg.hop_len, cfg.win_len))
        return np.abs(got - mag).mean() / mag.mean()

    classic = np.asarray(gl.griffin_lim(jnp.asarray(mag), cfg.n_fft, cfg.hop_len, cfg.win_len, 16, n))
    fast = np.asarray(gl.griffin_lim(jnp.asarray(mag), cfg.n_fft, cfg.hop_len, cfg.win_len, 8, n, momentum=0.99))
    assert spectral_err(fast) <= spectral_err(classic) * 1.1, (
        spectral_err(fast), spectral_err(classic))


def test_griffin_lim_momentum_banded_split_path(rng):
    """Fast-GL through the production serving path (banded data path,
    bf16 DFT GEMMs, split iteration) — the exact configuration bench.py's
    quality-gated momentum candidates run (gl_momentum_gate.py)."""
    cfg = CFG
    n = 4000
    y = _signal(n, cfg.sample_rate, rng)
    mag = np.abs(ref.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len)).astype(np.float32)

    def spectral_err(wav):
        got = np.abs(ref.stft(wav.astype(np.float64), cfg.n_fft, cfg.hop_len, cfg.win_len))
        return np.abs(got - mag).mean() / mag.mean()

    kw = dict(fft_impl="dft_default", iter_impl="split")
    classic = np.asarray(gl.griffin_lim(
        jnp.asarray(mag), cfg.n_fft, cfg.hop_len, cfg.win_len, 16, n, **kw))
    fast = np.asarray(gl.griffin_lim(
        jnp.asarray(mag), cfg.n_fft, cfg.hop_len, cfg.win_len, 8, n,
        momentum=0.99, **kw))
    assert spectral_err(fast) <= spectral_err(classic) * 1.1, (
        spectral_err(fast), spectral_err(classic))


def test_rdft_impl_in_gl_matches_xla_impl(rng):
    """Griffin-Lim with the direct-rDFT GEMM path == jnp.fft path (CPU f32)."""
    cfg = CFG
    n = 3000
    y = _signal(n, cfg.sample_rate, rng)
    mag = np.abs(ref.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len)).astype(np.float32)
    a = np.asarray(gl.griffin_lim(jnp.asarray(mag), cfg.n_fft, cfg.hop_len, cfg.win_len, 4, n, fft_impl="xla"))
    b = np.asarray(gl.griffin_lim(jnp.asarray(mag), cfg.n_fft, cfg.hop_len, cfg.win_len, 4, n, fft_impl="dft_high"))
    scale = np.abs(a).max()
    np.testing.assert_allclose(a / scale, b / scale, atol=5e-4)


def test_resample_preserves_tone_frequency():
    from sstts.dsp.resample import resample

    sr1, sr2, f0 = 16000, 22050, 440.0
    t = np.arange(sr1) / sr1
    y = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    out = resample(y, sr1, sr2)
    assert abs(len(out) - sr2) <= 2
    # Dominant frequency survives the rate change.
    spec = np.abs(np.fft.rfft(out[1000:-1000] * np.hanning(len(out) - 2000)))
    freq = np.fft.rfftfreq(len(out) - 2000, 1 / sr2)[np.argmax(spec)]
    assert abs(freq - f0) < 2.0, freq
    # Amplitude roughly preserved.
    assert 0.8 < np.abs(out[2000:-2000]).max() < 1.2
    # Identity when rates match.
    np.testing.assert_array_equal(resample(y, sr1, sr1), y)


def test_banded_reprojection_matches_composed(rng):
    """One GL phase projection: banded shift-add == istft->stft composition."""
    from sstts.dsp.reproject import reproject_frames
    from sstts.dsp.stft import _window, _window_sum_sq, frame_signal, overlap_add

    for n_fft, hop, win_length, T in [(512, 100, 400, 23), (256, 64, 256, 9)]:
        window = _window(n_fft, win_length)
        nz = np.nonzero(window)[0]
        lo = int(nz[0])
        w_len = int(nz[-1]) + 1 - lo
        start = n_fft // 2 - lo
        length = (T - 1) * hop
        F = jnp.asarray(rng.standard_normal((2, T, w_len)), jnp.float32)

        def composed(frames):
            inv_wss = jnp.asarray(
                _window_sum_sq(n_fft, hop, win_length, T)[
                    n_fft // 2 : n_fft // 2 + length
                ]
            )
            y = overlap_add(frames, hop)
            short = start + length - y.shape[-1]
            if short > 0:
                y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, short)])
            y = y[..., start : start + length] * inv_wss
            pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
            yp = jnp.pad(y, pad, mode="reflect")
            return frame_signal(yp[..., lo:], w_len, hop)[..., :T, :]

        a = np.asarray(composed(F))
        b = np.asarray(reproject_frames(F, n_fft, hop, win_length, length))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-4 * np.abs(a).max())


def test_pallas_reprojection_matches_banded(rng):
    """The Pallas kernel (interpret mode on CPU) == the XLA banded path."""
    from sstts.dsp.reproject import reproject_frames, reproject_frames_pallas
    from sstts.dsp.stft import _window

    for n_fft, hop, win_length, T in [(512, 100, 400, 46), (256, 64, 256, 33)]:
        window = _window(n_fft, win_length)
        nz = np.nonzero(window)[0]
        w_len = int(nz[-1]) + 1 - int(nz[0])
        length = (T - 1) * hop
        F = jnp.asarray(rng.standard_normal((2, T, w_len)), jnp.float32)
        a = np.asarray(reproject_frames(F, n_fft, hop, win_length, length))
        b = np.asarray(
            reproject_frames_pallas(
                F, n_fft, hop, win_length, length, interpret=True
            )
        )
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5 * np.abs(a).max())
        # Lane-padded input (the GL loop's calling convention).
        w_pad = -(-w_len // 128) * 128
        Fp = jnp.pad(F, [(0, 0), (0, 0), (0, w_pad - w_len)])
        c = np.asarray(
            reproject_frames_pallas(
                Fp, n_fft, hop, win_length, length, interpret=True
            )
        )
        np.testing.assert_allclose(a, c[..., :w_len], rtol=0,
                                   atol=1e-5 * np.abs(a).max())
        np.testing.assert_array_equal(c[..., w_len:], 0.0)


def test_gl_data_paths_agree(rng):
    """Full Griffin-Lim: banded vs composed data path (f32 loop)."""
    n_fft, hop, win_length, T = 512, 128, 400, 30
    length = (T - 1) * hop
    mag = jnp.asarray(rng.random((2, T, n_fft // 2 + 1)) ** 2, jnp.float32)
    outs = {}
    for path in ("composed", "banded"):
        old = gl.GL_DATA_PATH
        gl.GL_DATA_PATH = path
        try:
            outs[path] = np.asarray(
                gl.griffin_lim(mag, n_fft, hop, win_length, 8, length,
                               fft_impl="dft_high")
            )
        finally:
            gl.GL_DATA_PATH = old
    a, b = outs["composed"], outs["banded"]
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-4 * np.abs(a).max())


def test_gl_packed_bf16_path_reconstructs(rng):
    """The production GL path (bf16 loop, Nyquist packed into DC's imaginary
    slot) reconstructs a harmonic signal as well as the exact f32 path."""
    cfg = CFG
    n = 4000
    y = _signal(n, cfg.sample_rate, rng)
    mag = np.abs(ref.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len)).astype(np.float32)

    def spectral_err(wav):
        got = np.abs(ref.stft(wav.astype(np.float64), cfg.n_fft, cfg.hop_len, cfg.win_len))
        return np.abs(got - mag).mean() / mag.mean()

    exact = np.asarray(gl.griffin_lim(
        jnp.asarray(mag), cfg.n_fft, cfg.hop_len, cfg.win_len, 8, n,
        fft_impl="dft_high"))
    packed = np.asarray(gl.griffin_lim(
        jnp.asarray(mag), cfg.n_fft, cfg.hop_len, cfg.win_len, 8, n,
        fft_impl="dft_default"))
    assert np.isfinite(packed).all()
    e_exact, e_packed = spectral_err(exact), spectral_err(packed)
    # bf16 phase noise historically *helps* slightly; allow 15% slack.
    assert e_packed <= e_exact * 1.15, (e_packed, e_exact)


def test_gl_fused_iteration_matches_split(rng):
    """Full GL, f32 loop: the fused single-kernel iteration (interpret mode
    on CPU) matches the split (GEMM / Pallas reprojection / GEMM / renorm)
    path, including the reflect-pad edge-row repair."""
    n_fft, hop, win_length, T = 512, 100, 400, 30
    length = (T - 1) * hop
    mag = jnp.asarray(rng.random((2, T, n_fft // 2 + 1)) ** 2, jnp.float32)
    outs = {}
    for impl in ("split", "fused"):
        old = gl.GL_ITER_IMPL
        gl.GL_ITER_IMPL = impl
        try:
            outs[impl] = np.asarray(
                gl.griffin_lim(mag, n_fft, hop, win_length, 6, length,
                               fft_impl="dft_high")
            )
        finally:
            gl.GL_ITER_IMPL = old
    a, b = outs["split"], outs["fused"]
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-4 * np.abs(a).max())


def test_gl_fused_packed_bf16_reconstructs(rng):
    """Production shape of the fused path: bf16 loop with Nyquist packing.
    Reconstruction quality must track the split bf16 path."""
    cfg = CFG
    n = 3000
    y = _signal(n, cfg.sample_rate, rng)
    mag = np.abs(
        ref.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len)
    ).astype(np.float32)

    def spectral_err(wav):
        got = np.abs(
            ref.stft(wav.astype(np.float64), cfg.n_fft, cfg.hop_len, cfg.win_len)
        )
        return np.abs(got - mag).mean() / mag.mean()

    outs = {}
    for impl in ("split", "fused"):
        old = gl.GL_ITER_IMPL
        gl.GL_ITER_IMPL = impl
        try:
            outs[impl] = np.asarray(
                gl.griffin_lim(jnp.asarray(mag), cfg.n_fft, cfg.hop_len,
                               cfg.win_len, 8, n, fft_impl="dft_default")
            )
        finally:
            gl.GL_ITER_IMPL = old
    assert np.isfinite(outs["fused"]).all()
    e_split = spectral_err(outs["split"])
    e_fused = spectral_err(outs["fused"])
    assert e_fused <= e_split * 1.15, (e_fused, e_split)


def test_gl_fused_tiny_frame_count(rng):
    """Frame counts small enough that the edge-repair slabs overlap take the
    whole-array repair fallback and still match the split path."""
    n_fft, hop, win_length, T = 512, 100, 400, 5
    length = (T - 1) * hop
    mag = jnp.asarray(rng.random((1, T, n_fft // 2 + 1)) ** 2, jnp.float32)
    outs = {}
    for impl in ("split", "fused"):
        old = gl.GL_ITER_IMPL
        gl.GL_ITER_IMPL = impl
        try:
            outs[impl] = np.asarray(
                gl.griffin_lim(mag, n_fft, hop, win_length, 4, length,
                               fft_impl="dft_high")
            )
        finally:
            gl.GL_ITER_IMPL = old
    a, b = outs["split"], outs["fused"]
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-4 * np.abs(a).max())


@pytest.mark.parametrize("momentum", [0.0, 0.99])
def test_gl_semi_iteration_matches_split(rng, momentum):
    """Full GL, f32 loop: the semi-fused iteration tail (reprojection +
    analysis GEMM + renorm in one Pallas kernel, interpret mode on CPU)
    matches the split path, with and without the fast-GL momentum update,
    including the reflect-pad edge-row repair.  Momentum compounds f32
    summation-order noise through the extrapolation, hence its tolerance."""
    n_fft, hop, win_length, T = 512, 100, 400, 30
    length = (T - 1) * hop
    mag = jnp.asarray(rng.random((2, T, n_fft // 2 + 1)) ** 2, jnp.float32)
    outs = {
        impl: np.asarray(
            gl.griffin_lim(mag, n_fft, hop, win_length, 6, length,
                           momentum=momentum, fft_impl="dft_high",
                           iter_impl=impl)
        )
        for impl in ("split", "semi")
    }
    a, b = outs["split"], outs["semi"]
    tol = (1e-3 if momentum else 5e-4) * np.abs(a).max()
    np.testing.assert_allclose(a, b, rtol=0, atol=tol)


def test_gl_semi_packed_bf16_reconstructs(rng):
    """Production shape of the semi-fused path: bf16 loop with Nyquist
    packing, fast-GL momentum.  Reconstruction quality must track split."""
    cfg = CFG
    n = 3000
    y = _signal(n, cfg.sample_rate, rng)
    mag = np.abs(
        ref.stft(y, cfg.n_fft, cfg.hop_len, cfg.win_len)
    ).astype(np.float32)

    def spectral_err(wav):
        got = np.abs(
            ref.stft(wav.astype(np.float64), cfg.n_fft, cfg.hop_len, cfg.win_len)
        )
        return np.abs(got - mag).mean() / mag.mean()

    outs = {
        impl: np.asarray(
            gl.griffin_lim(jnp.asarray(mag), cfg.n_fft, cfg.hop_len,
                           cfg.win_len, 8, n, momentum=0.99,
                           fft_impl="dft_default", iter_impl=impl)
        )
        for impl in ("split", "semi")
    }
    assert np.isfinite(outs["semi"]).all()
    e_split = spectral_err(outs["split"])
    e_semi = spectral_err(outs["semi"])
    assert e_semi <= e_split * 1.15, (e_semi, e_split)


def test_gl_semi_tiny_frame_count(rng):
    """Tiny frame counts take the whole-array edge-repair fallback in the
    semi-fused path too, and still match split (momentum exercised)."""
    n_fft, hop, win_length, T = 512, 100, 400, 5
    length = (T - 1) * hop
    mag = jnp.asarray(rng.random((1, T, n_fft // 2 + 1)) ** 2, jnp.float32)
    for momentum in (0.0, 0.9):
        outs = {
            impl: np.asarray(
                gl.griffin_lim(mag, n_fft, hop, win_length, 4, length,
                               momentum=momentum, fft_impl="dft_high",
                               iter_impl=impl)
            )
            for impl in ("split", "semi")
        }
        a, b = outs["split"], outs["semi"]
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-3 * np.abs(a).max())


def test_gl_split_xla_matches_split(rng):
    """"split_xla" (mesh-safe, Pallas-free) == "split" on CPU (where the
    reprojection dispatch resolves to XLA for both)."""
    n_fft, hop, win_length, T = 512, 100, 400, 20
    length = (T - 1) * hop
    mag = jnp.asarray(rng.random((2, T, n_fft // 2 + 1)) ** 2, jnp.float32)
    a = np.asarray(gl.griffin_lim(mag, n_fft, hop, win_length, 5, length,
                                  fft_impl="dft_high", iter_impl="split"))
    b = np.asarray(gl.griffin_lim(mag, n_fft, hop, win_length, 5, length,
                                  fft_impl="dft_high", iter_impl="split_xla"))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5 * np.abs(a).max())
