"""Native C++ WAV decode / trim vs the pure-numpy oracle."""

import numpy as np
import pytest

from sstts.data import native_loader, wav as wav_mod
from sstts.dsp import reference as ref


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths, signals = [], []
    for i in range(6):
        n = int(rng.integers(3000, 12000))
        y = (0.5 * np.sin(np.linspace(0, 50 + i * 10, n))).astype(np.float32)
        y[: n // 10] = 0.0  # leading silence for trim tests
        p = root / f"u{i}.wav"
        wav_mod.save_wav(p, y, 22050)
        paths.append(str(p))
        signals.append(y)
    return paths, signals


def test_native_builds():
    assert native_loader.available(), "g++ toolchain expected in this image"


def test_native_decode_matches_numpy(corpus):
    paths, signals = corpus
    for p, y in zip(paths, signals):
        got, sr = native_loader.load_wav(p)
        want, sr2 = wav_mod.load_wav(p)
        assert sr == sr2 == 22050
        np.testing.assert_array_equal(got, want)


def test_native_batch_decode(corpus):
    paths, signals = corpus
    out, lengths, srs = native_loader.decode_batch(paths, max_len=20000)
    assert (srs == 22050).all()
    for i, (p, y) in enumerate(zip(paths, signals)):
        want, _ = wav_mod.load_wav(p)
        assert lengths[i] == len(want)
        np.testing.assert_array_equal(out[i, : lengths[i]], want)
        assert (out[i, lengths[i]:] == 0).all()


def test_native_batch_reports_bad_file(corpus, tmp_path):
    paths, _ = corpus
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"garbage")
    out, lengths, srs = native_loader.decode_batch([paths[0], str(bad)], 20000)
    assert lengths[0] > 0
    assert lengths[1] < 0


def test_native_trim_matches_oracle(corpus):
    _, signals = corpus
    for y in signals:
        got = native_loader.trim_silence(y, 40.0)
        want = ref.trim_silence(y.astype(np.float64), 40.0)
        assert len(got) == len(want)
        np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)
