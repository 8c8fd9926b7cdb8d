"""Native C++ WAV decode / trim vs the pure-numpy oracle."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast  # whole module is in the <5 min smoke tier

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


def test_native_adpcm_decode_matches_numpy():
    """Native C++ ADPCM row decode == numpy oracle within f32 rounding.

    The native path serves the hot fetch loop (Synthesizer._decode_wire);
    the numpy decoder is the oracle.  Parity is within float32 summation-
    order noise (~1e-7 — numpy's cumsum may associate differently), far
    below the quantizer step.  Covers silence rows, fp16-subnormal scale
    blocks (tiny amplitudes), full-scale rows, and non-multiple-of-256
    lengths (padded tail blocks).
    """
    import jax.numpy as jnp

    from sstts.dsp import ops

    rng = np.random.default_rng(7)
    for n in (256, 700, 5000):
        wav = np.clip(
            rng.standard_normal((4, n)).astype(np.float32) * 0.3, -1, 1
        )
        wav[0] = 0.0       # exact silence
        wav[1] *= 1e-6     # fp16-subnormal block scales
        wav[2] = np.clip(wav[2] * 10, -1, 1)  # heavy clipping
        wd = jnp.asarray(wav)
        for bits, enc, dec_np in (
            (4, ops.adpcm4_encode_wire, ops._adpcm4_decode_rows_np),
            (3, ops.adpcm3_encode_wire, ops._adpcm3_decode_rows_np),
            (2, ops.adpcm2_encode_wire, ops._adpcm2_decode_rows_np),
        ):
            rows = np.asarray(enc(wd))
            want = dec_np(rows)
            got = native_loader.adpcm_decode_rows(rows, bits)
            if got is None:  # no toolchain: dispatch falls back to numpy
                continue
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_adpcm_public_decode_dispatches():
    """The public decode entry points agree with the numpy oracle exactly
    as `adpcm_decode_rows` does (native or fallback — same contract)."""
    import jax.numpy as jnp

    from sstts.dsp import ops

    rng = np.random.default_rng(8)
    wav = np.clip(rng.standard_normal((3, 1000)).astype(np.float32) * 0.2, -1, 1)
    wd = jnp.asarray(wav)
    for enc, dec, dec_np in (
        (ops.adpcm4_encode_wire, ops.adpcm4_decode_host_rows,
         ops._adpcm4_decode_rows_np),
        (ops.adpcm3_encode_wire, ops.adpcm3_decode_host_rows,
         ops._adpcm3_decode_rows_np),
        (ops.adpcm2_encode_wire, ops.adpcm2_decode_host_rows,
         ops._adpcm2_decode_rows_np),
    ):
        rows = np.asarray(enc(wd))
        np.testing.assert_allclose(
            dec(rows), dec_np(rows), rtol=0, atol=1e-6
        )
