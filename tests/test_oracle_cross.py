"""Cross-validation of the float64 numpy oracle against INDEPENDENT
implementations (SURVEY.md §4 "implement the reference DSP twice").

`sstts/dsp/reference.py` is the single hand-built oracle the whole
mel-L1 <= 1e-3 acceptance gate rests on (the reference mount is empty, so
there is no third party to appeal to).  These tests pin it against
implementations we did NOT write:

* `torch.stft` / `torch.istft` with ``center=True, pad_mode="reflect"`` and a
  periodic Hann window implement exactly the librosa STFT semantics the
  oracle claims (center reflect padding, window center-padded to n_fft,
  window-sum-normalized overlap-add inverse).
* `tf.signal.stft` gives a third STFT (framing + right-padded window, so the
  centering/padding is reconstructed explicitly here from the documented
  librosa rule — an independent statement of that rule).
* `scipy.signal.lfilter` is the ground truth for the pre-/de-emphasis IIRs.
* The Slaney mel scale is checked against its published constants
  (linear 200/3 mel/Hz below 1 kHz; log step ln(6.4)/27 above; 1 kHz = 15
  mel, 6.4 kHz = 42 mel) and the filterbank against the Slaney-normalization
  integral property (each triangle integrates to ~1 over continuous Hz) —
  mathematical invariants, not a re-derivation of the same code.

Agreement everywhere is <= 1e-8 (float64); any shared-mistake failure mode in
the oracle (wrong padding, wrong window symmetry, wrong normalization) would
show up as a gross mismatch here.
"""

import numpy as np
import pytest

from sstts.dsp import reference as oracle

# Pinned flagship hparams (Config defaults, SURVEY.md §2.4).
SR, N_FFT, WIN, HOP = 22050, 2048, 1102, 275


def _signal(n=SR, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    chirp = np.sin(2 * np.pi * (200 + 1500 * t) * t)
    return (0.7 * chirp + 0.1 * rng.standard_normal(n)).astype(np.float64)


# --------------------------------------------------------------------------- #
# torch: exact-semantics STFT / iSTFT / Griffin-Lim cross-check
# --------------------------------------------------------------------------- #


def test_stft_matches_torch():
    torch = pytest.importorskip("torch")
    y = _signal()
    ours = oracle.stft(y, N_FFT, HOP, WIN)
    ty = torch.from_numpy(y)
    win = torch.hann_window(WIN, periodic=True, dtype=torch.float64)
    theirs = torch.stft(
        ty, N_FFT, hop_length=HOP, win_length=WIN, window=win,
        center=True, pad_mode="reflect", normalized=False,
        onesided=True, return_complex=True,
    ).numpy().T  # (freq, frames) -> (frames, freq)
    assert ours.shape == theirs.shape
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=1e-8 * scale)


def test_istft_matches_torch():
    torch = pytest.importorskip("torch")
    y = _signal()
    spec = oracle.stft(y, N_FFT, HOP, WIN)
    ours = oracle.istft(spec, N_FFT, HOP, WIN, len(y))
    win = torch.hann_window(WIN, periodic=True, dtype=torch.float64)
    theirs = torch.istft(
        torch.from_numpy(spec.T.copy()), N_FFT, hop_length=HOP,
        win_length=WIN, window=win, center=True, length=len(y),
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-8)
    # And the analysis-synthesis round trip reconstructs the signal.
    np.testing.assert_allclose(ours, y, atol=1e-8)


def test_griffin_lim_matches_torch_built_gl():
    """Same zero-phase-init GL loop built from torch's stft/istft."""
    torch = pytest.importorskip("torch")
    y = _signal(n=8 * HOP * 4)
    mag = np.abs(oracle.stft(y, N_FFT, HOP, WIN))
    n_iters, length = 5, len(y)
    ours = oracle.griffin_lim(mag, N_FFT, HOP, WIN, n_iters, length)

    win = torch.hann_window(WIN, periodic=True, dtype=torch.float64)
    tmag = torch.from_numpy(mag.T.copy())

    def tistft(spec):
        return torch.istft(
            spec, N_FFT, hop_length=HOP, win_length=WIN, window=win,
            center=True, length=length,
        )

    def tstft(sig):
        return torch.stft(
            sig, N_FFT, hop_length=HOP, win_length=WIN, window=win,
            center=True, pad_mode="reflect", return_complex=True,
        )

    angles = torch.ones_like(tmag, dtype=torch.complex128)
    ty = tistft(tmag * angles)
    for _ in range(n_iters):
        s = tstft(ty)
        angles = torch.exp(1j * torch.angle(s))
        ty = tistft(tmag * angles)
    np.testing.assert_allclose(ours, ty.numpy(), atol=1e-7)


# --------------------------------------------------------------------------- #
# tensorflow: third STFT path
# --------------------------------------------------------------------------- #


def test_stft_matches_tf_signal():
    tf = pytest.importorskip("tensorflow")
    y = _signal()
    ours = oracle.stft(y, N_FFT, HOP, WIN)
    # tf.signal.stft has no centering: reconstruct the librosa rule
    # explicitly — reflect-pad by n_fft//2, frame at n_fft, and center-pad
    # the periodic Hann window to n_fft inside the window_fn.
    padded = np.pad(y, (N_FFT // 2, N_FFT // 2), mode="reflect")
    lpad = (N_FFT - WIN) // 2

    def window_fn(frame_length, dtype):
        base = tf.signal.hann_window(WIN, periodic=True, dtype=dtype)
        return tf.pad(base, [[lpad, N_FFT - WIN - lpad]])

    theirs = tf.signal.stft(
        tf.constant(padded, tf.float64), frame_length=N_FFT,
        frame_step=HOP, fft_length=N_FFT, window_fn=window_fn,
    ).numpy()
    assert ours.shape == theirs.shape
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=1e-8 * scale)


def test_hann_window_matches_scipy_and_tf():
    scipy_signal = pytest.importorskip("scipy.signal")
    tf = pytest.importorskip("tensorflow")
    ours = oracle.hann_window(WIN)
    np.testing.assert_allclose(
        ours, scipy_signal.get_window("hann", WIN, fftbins=True), atol=1e-12
    )
    np.testing.assert_allclose(
        ours,
        tf.signal.hann_window(WIN, periodic=True, dtype=tf.float64).numpy(),
        atol=1e-12,
    )


# --------------------------------------------------------------------------- #
# scipy: pre-/de-emphasis IIRs
# --------------------------------------------------------------------------- #


def test_preemphasis_matches_scipy_lfilter():
    scipy_signal = pytest.importorskip("scipy.signal")
    y = _signal(n=4096)
    c = 0.97
    ours = oracle.preemphasis(y, c)
    theirs = scipy_signal.lfilter([1.0, -c], [1.0], y)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_deemphasis_matches_scipy_lfilter():
    scipy_signal = pytest.importorskip("scipy.signal")
    y = _signal(n=4096)
    c = 0.97
    ours = oracle.deemphasis(y, c)
    theirs = scipy_signal.lfilter([1.0], [1.0, -c], y)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
    # And it inverts preemphasis exactly.
    np.testing.assert_allclose(
        oracle.deemphasis(oracle.preemphasis(y, c), c), y, atol=1e-9
    )


# --------------------------------------------------------------------------- #
# Slaney mel scale / filterbank: published constants + integral invariants
# --------------------------------------------------------------------------- #


def test_slaney_mel_scale_published_constants():
    # Linear region: 200/3 Hz per mel, zero intercept.
    np.testing.assert_allclose(oracle.hz_to_mel(np.array(0.0)), 0.0)
    np.testing.assert_allclose(
        oracle.hz_to_mel(np.array(200.0 / 3.0)), 1.0, atol=1e-12
    )
    # Breakpoint: 1 kHz = 15 mel; log region: 6.4 kHz = 15 + 27 = 42 mel
    # (27 log-steps per doubling-of-6.4x, Slaney's Auditory Toolbox).
    np.testing.assert_allclose(oracle.hz_to_mel(np.array(1000.0)), 15.0)
    np.testing.assert_allclose(
        oracle.hz_to_mel(np.array(6400.0)), 42.0, atol=1e-12
    )
    np.testing.assert_allclose(
        oracle.mel_to_hz(np.array(42.0)), 6400.0, atol=1e-8
    )
    # Round trip over the full band.
    f = np.linspace(0.0, SR / 2, 512)
    np.testing.assert_allclose(
        oracle.mel_to_hz(oracle.hz_to_mel(f)), f, atol=1e-8
    )


def test_slaney_filterbank_integral_invariant():
    """Slaney normalization makes each triangle integrate to ~1 over Hz."""
    n_mels = 80
    fb = oracle.mel_filterbank(SR, N_FFT, n_mels, 0.0, SR / 2)
    assert fb.shape == (n_mels, N_FFT // 2 + 1)
    bin_hz = (SR / 2) / (N_FFT // 2)
    integrals = fb.sum(axis=1) * bin_hz
    # Discretization error is largest for the narrowest (lowest) filters.
    np.testing.assert_allclose(integrals, 1.0, rtol=0.12)
    np.testing.assert_allclose(integrals[20:], 1.0, rtol=0.02)
    # Filter peaks sit at the interior mel grid points.
    mel_f = oracle.mel_to_hz(
        np.linspace(
            oracle.hz_to_mel(0.0), oracle.hz_to_mel(SR / 2), n_mels + 2
        )
    )
    fftfreqs = np.linspace(0.0, SR / 2, 1 + N_FFT // 2)
    for i in range(5, n_mels, 10):
        peak_hz = fftfreqs[np.argmax(fb[i])]
        width = mel_f[i + 2] - mel_f[i]
        assert abs(peak_hz - mel_f[i + 1]) < max(bin_hz, 0.05 * width)


def test_db_conversions_are_exact_inverses():
    x = np.logspace(-4, 1, 200)
    db = oracle.magnitude_to_decibel(x)
    np.testing.assert_allclose(
        oracle.decibel_to_magnitude(db), np.maximum(x, 1e-5), rtol=1e-12
    )
    norm = oracle.normalize_decibel(db, 20.0, -100.0)
    assert (norm >= 0.0).all() and (norm <= 1.0).all()
    inside = (db - 20.0 > -100.0) & (db - 20.0 < 0.0)
    np.testing.assert_allclose(
        oracle.inv_normalize_decibel(norm, 20.0, -100.0)[inside],
        db[inside],
        atol=1e-9,
    )
