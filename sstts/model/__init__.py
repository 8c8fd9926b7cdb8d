"""Model layer (SURVEY.md layer R2): CBHG encoder, attention GRU decoder as
fixed-shape scans, post-processing CBHG, and masked losses."""

from sstts.model.attention import BahdanauAttention, LocalLuongAttention
from sstts.model.decoder import DecoderCell, teacher_inputs
from sstts.model.losses import tacotron_loss
from sstts.model.modules import CBHG, Conv1dBank, Highway, MaskedBatchNorm, PreNet
from sstts.model.rnn import BiGRU, GRUCell, UnidirectionalGRU
from sstts.model.tacotron import Tacotron

__all__ = [
    "BahdanauAttention",
    "BiGRU",
    "CBHG",
    "Conv1dBank",
    "DecoderCell",
    "GRUCell",
    "Highway",
    "LocalLuongAttention",
    "MaskedBatchNorm",
    "PreNet",
    "Tacotron",
    "UnidirectionalGRU",
    "tacotron_loss",
    "teacher_inputs",
]
