"""CLI end-to-end tests (reference entry scripts — SURVEY.md §2.5): train a
tiny model through `python -m sstts.cli train`, then batch-synthesize from
the checkpoint with --text / --text-file."""

import dataclasses

from sstts import cli as cli_mod
from sstts.config import Config, tiny_config


def _tiny():
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
            checkpoint_every=2,
        ),
        inference=dataclasses.replace(
            cfg.inference, max_decoder_steps=12, griffin_lim_iters=4
        ),
    )


def _patch_config(monkeypatch):
    tiny = _tiny()

    def fake(**kw):
        return Config(**kw) if kw else tiny

    monkeypatch.setattr(cli_mod, "Config", fake)


def test_cli_train_then_synthesize(tmp_path, monkeypatch):
    _patch_config(monkeypatch)
    workdir = tmp_path / "run"
    rc = cli_mod.main(
        ["train", "--workdir", str(workdir), "--max-steps", "2"]
    )
    assert rc == 0

    sentences = tmp_path / "sentences.txt"
    sentences.write_text("hello world\n\nthe quick brown fox\n")
    rc = cli_mod.main(
        [
            "synthesize",
            "--workdir", str(workdir),
            "--text", "a third sentence",
            "--text-file", str(sentences),
        ]
    )
    assert rc == 0
    wavs = sorted((workdir / _tiny().inference.output_dir).glob("*.wav"))
    assert len(wavs) == 3  # 1 --text + 2 non-blank file lines
    assert all(w.stat().st_size > 44 for w in wavs)  # header + samples


def test_fast_vocoder_preset_and_override_precedence(tmp_path, monkeypatch):
    """--fast-vocoder applies the gated GL-30 @ m=0.99 preset to the
    synthesize config; an explicit --set inference.* override still wins;
    the preset never touches state-defining (fingerprint) fields."""
    from sstts.config import Config as RealConfig
    from sstts.config import with_fast_vocoder

    base = RealConfig()
    fast = with_fast_vocoder(base)
    assert fast.inference.griffin_lim_iters == 30
    assert fast.inference.griffin_lim_momentum == 0.99
    assert fast.fingerprint() == base.fingerprint()

    _patch_config(monkeypatch)
    captured = {}

    class FakeSynth:
        @classmethod
        def from_checkpoint(cls, cfg, workdir):
            captured["cfg"] = cfg
            raise FileNotFoundError(workdir)

    monkeypatch.setattr("sstts.synthesize.Synthesizer", FakeSynth)
    rc = cli_mod.main(
        ["synthesize", "--workdir", str(tmp_path), "--text", "hi",
         "--fast-vocoder"]
    )
    assert rc == 1  # no checkpoint — but the cfg was already built
    assert captured["cfg"].inference.griffin_lim_iters == 30
    assert captured["cfg"].inference.griffin_lim_momentum == 0.99

    rc = cli_mod.main(
        ["synthesize", "--workdir", str(tmp_path), "--text", "hi",
         "--fast-vocoder", "--set", "inference.griffin_lim_iters=40"]
    )
    assert rc == 1
    assert captured["cfg"].inference.griffin_lim_iters == 40  # --set wins
    assert captured["cfg"].inference.griffin_lim_momentum == 0.99


def test_cli_synthesize_requires_text(tmp_path, monkeypatch):
    _patch_config(monkeypatch)
    rc = cli_mod.main(["synthesize", "--workdir", str(tmp_path)])
    assert rc == 1


def test_cli_synthesize_missing_checkpoint(tmp_path, monkeypatch):
    _patch_config(monkeypatch)
    rc = cli_mod.main(
        ["synthesize", "--workdir", str(tmp_path / "empty"), "--text", "hi"]
    )
    assert rc == 1


def test_cli_longform(tmp_path, monkeypatch):
    _patch_config(monkeypatch)
    workdir = tmp_path / "run"
    assert cli_mod.main(
        ["train", "--workdir", str(workdir), "--max-steps", "2"]
    ) == 0
    out = tmp_path / "doc.wav"
    rc = cli_mod.main(
        [
            "synthesize", "--workdir", str(workdir), "--longform",
            "--text", "one sentence here. and another one!",
            "--out", str(out),
        ]
    )
    assert rc == 0 and out.exists() and out.stat().st_size > 44
    # Text that normalizes to nothing errors instead of writing an empty WAV.
    rc = cli_mod.main(
        ["synthesize", "--workdir", str(workdir), "--longform",
         "--text", "\u4f60\u597d"]
    )
    assert rc == 1
