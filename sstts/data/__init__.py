"""Data layer (SURVEY.md layer R1): text front-end, WAV I/O, corpus
definitions (LJSpeech + synthetic), and the bucketed batch pipeline feeding
the on-device feature front-end."""

from sstts.data.ljspeech import Utterance, load_metadata, train_eval_split
from sstts.data.pipeline import Batcher, make_batch
from sstts.data.text import CHARSET, VOCAB_SIZE, decode, encode, normalize
from sstts.data.wav import load_wav, save_wav

__all__ = [
    "Batcher",
    "CHARSET",
    "Utterance",
    "VOCAB_SIZE",
    "decode",
    "encode",
    "load_metadata",
    "load_wav",
    "make_batch",
    "normalize",
    "save_wav",
    "train_eval_split",
]
