"""The Tacotron model: encoder, decoder scans, post-processing net.

Counterpart of the reference's `tacotron/model.py` graph-builder class
(SURVEY.md §2.2), re-expressed as a flax module whose training forward is one
jittable function and whose inference forward is one fixed-shape compiled
program (including the autoregressive scan — SURVEY.md §3.2).

Architecture (Tacotron, arXiv 1703.10135):
char embedding -> pre-net -> CBHG encoder -> (Bahdanau-attention GRU +
residual GRU stack, r frames/step) -> post-CBHG -> linear spectrogram.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sstts.config import ArchitectureConfig, DatasetConfig
from sstts.data.text import charset_for
from sstts.model.decoder import DecoderCell, teacher_inputs
from sstts.model.modules import CBHG, PreNet


class Tacotron(nn.Module):
    arch: ArchitectureConfig
    data: DatasetConfig
    dtype: jnp.dtype = jnp.float32
    #: GRU backend override for the CBHG BiGRUs (None = platform auto —
    #: Pallas fused kernel on TPU; mesh-aware callers pin "xla" under GSPMD
    #: partitioning, which cannot shard opaque custom calls).
    gru_backend: Optional[str] = None
    #: Teacher-forced decoder scan implementation (None = auto = "xla":
    #: the fused Pallas whole-scan kernel measured slower than the hoisted
    #: XLA scan at flagship shapes — sstts.ops.pallas_decoder.TEACHER_IMPL
    #: has the numbers; "fused" opts in).
    teacher_backend: Optional[str] = None

    def setup(self) -> None:
        a = self.arch
        # Charset-derived vocab honors dataset.extra_chars (German umlauts
        # etc. — SURVEY.md §2.3); base ids are stable, extras append.
        vocab = a.vocab_size or charset_for(self.data.extra_chars).vocab_size
        self.embedding = nn.Embed(vocab, a.embedding_dim, dtype=self.dtype)
        # Encoder pre-net: dropout at train time only (decoder pre-net keeps
        # dropout at inference, per Tacotron-1 — that flag lives in the cell).
        self.encoder_prenet = PreNet(
            a.prenet_units, a.prenet_dropout, always_dropout=False,
            dtype=self.dtype, name="encoder_prenet",
        )
        self.encoder_cbhg = CBHG(
            a.encoder_bank_k, a.encoder_bank_channels, a.encoder_proj_channels,
            a.encoder_highway_layers, a.encoder_highway_units, a.encoder_gru_units,
            dtype=self.dtype, fused_bank=a.fused_conv_bank,
            gru_backend=self.gru_backend, name="encoder_cbhg",
        )
        self.decoder_cell = DecoderCell(a, self.data.n_mels, dtype=self.dtype)
        # The post-CBHG's second projection returns to mel space by
        # definition (residual over the decoder's mel output), so its width
        # follows dataset.n_mels rather than trusting the config pair.
        post_proj = (a.post_proj_channels[0], self.data.n_mels)
        self.post_cbhg = CBHG(
            a.post_bank_k, a.post_bank_channels, post_proj,
            a.post_highway_layers, a.post_highway_units, a.post_gru_units,
            dtype=self.dtype, fused_bank=a.fused_conv_bank,
            gru_backend=self.gru_backend, name="post_cbhg",
        )
        self.linear_proj = nn.Dense(self.data.n_linear, dtype=self.dtype)

    # ------------------------------------------------------------------ #

    def encode(
        self, char_ids: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T) ids -> memory (B, T, 2*enc_gru), mask (B, T)."""
        mask = char_ids != 0
        x = self.embedding(char_ids)
        x = self.encoder_prenet(x, train=train)
        memory = self.encoder_cbhg(x, mask, train=train)
        return memory, mask

    def decode_teacher(
        self,
        memory: jnp.ndarray,
        memory_mask: jnp.ndarray,
        mel_gt: jnp.ndarray,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Teacher-forced scan -> (mel (B,F,M), stop_logits (B,F), align (B,S,T)).

        The pre-net runs BEFORE the scan (its inputs — the teacher frames —
        are all known upfront) and the frame/stop projections AFTER it on
        the stacked features: four per-step small matmuls become two pairs
        of large batched MXU matmuls, and the scan body keeps only the
        genuinely sequential attention/GRU chain (SURVEY.md §7).
        """
        r = self.arch.reduction_factor
        inputs = teacher_inputs(mel_gt, r)  # (B, S, M)
        batch, steps, _ = inputs.shape
        pre = self.decoder_cell.prenet(inputs, train=train)  # (B, S, P1)
        keys = self.decoder_cell.init_keys(memory)

        xs, alignments = None, None
        if not self.is_initializing():
            from sstts.ops import pallas_decoder as pd

            if pd.resolve_teacher_impl(self.teacher_backend, self.arch) == "fused":
                # Whole-scan Pallas kernel (weights VMEM-resident across the
                # S steps, state in scratch); backward rematerializes through
                # the XLA oracle.  Init always takes the nn.scan path below —
                # it creates the (shared) parameters the kernel reads.
                on_tpu = jax.default_backend() == "tpu"
                w = pd.teacher_weights_from_tree(
                    self.decoder_cell.variables["params"]
                )
                maskf = (
                    memory_mask.astype(jnp.float32)
                    if memory_mask is not None
                    else jnp.ones(memory.shape[:2], jnp.float32)
                )
                xs, alignments = pd.fused_teacher_scan_ad(
                    w, pre.astype(jnp.float32), memory, keys, maskf,
                    jnp.bfloat16 if on_tpu else jnp.float32,
                    not on_tpu,  # interpret mode off-TPU (tests/CPU)
                )
                xs = xs.astype(self.dtype)
                alignments = alignments.astype(self.dtype)
        if xs is None:
            carry0 = self.decoder_cell.init_carry(
                batch, memory.shape[1], memory.shape[-1]
            )

            def step(cell: DecoderCell, carry, pre_t):
                return cell.teacher_step(
                    carry, pre_t, memory, keys, memory_mask
                )

            if self.arch.remat_decoder:
                # FLOPs-for-HBM: save only the carry per step, recompute
                # the cell forward during backprop (arch.remat_decoder).
                # prevent_cse=False is the recommended setting under scan.
                step = nn.remat(step, prevent_cse=False)
            scan = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=1,
                out_axes=1,
                unroll=self.arch.decoder_scan_unroll,
            )
            _, (xs, alignments) = scan(self.decoder_cell, carry0, pre)
        mel = self.decoder_cell.frame_proj(xs).reshape(
            batch, steps * r, self.data.n_mels
        )
        stops = self.decoder_cell.stop_proj(xs).reshape(batch, steps * r)
        return mel, stops, alignments

    def decode_infer(
        self,
        memory: jnp.ndarray,
        memory_mask: jnp.ndarray,
        max_steps: int,
        stop_threshold: float = 0.5,
        min_steps: int = 8,
    ) -> Dict[str, jnp.ndarray]:
        """Autoregressive fixed-shape scan with stop-token mask accumulation.

        Returns mel (B, max_steps*r, M), stop_logits, alignments (B, S, T),
        n_frames (B,) — the per-utterance emitted frame count.
        """
        r = self.arch.reduction_factor
        batch = memory.shape[0]
        keys = self.decoder_cell.init_keys(memory)
        carry0 = self.decoder_cell.init_carry(
            batch, memory.shape[1], memory.shape[-1]
        )

        def step(cell: DecoderCell, carry, step_idx):
            new_carry, out = cell(
                carry, None, memory, keys, memory_mask,
                train=False, stop_threshold=stop_threshold,
            )
            fin = jnp.logical_and(new_carry.finished, step_idx >= min_steps - 1)
            fin = jnp.logical_or(carry.finished, fin)
            return new_carry._replace(finished=fin), out

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=1,
        )
        _, out = scan(self.decoder_cell, carry0, jnp.arange(max_steps))
        mel = out.mel.reshape(batch, max_steps * r, self.data.n_mels)
        stops = out.stop_logits.reshape(batch, max_steps * r)
        # out.finished[b, s] == True means step s emitted masked silence.
        emitted_steps = jnp.sum(~out.finished, axis=1)
        return {
            "mel": mel,
            "stop_logits": stops,
            "alignments": out.alignment,
            "n_frames": emitted_steps * r,
        }

    def postprocess(
        self,
        mel: jnp.ndarray,
        frame_mask: Optional[jnp.ndarray],
        train: bool = True,
    ) -> jnp.ndarray:
        """Predicted mel -> linear spectrogram via the post-processing CBHG."""
        y = self.post_cbhg(mel, frame_mask, train=train)
        return self.linear_proj(y)

    # ------------------------------------------------------------------ #

    def __call__(
        self,
        char_ids: jnp.ndarray,
        mel_gt: jnp.ndarray,
        frame_mask: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Dict[str, Any]:
        """Teacher-forced training forward (creates every parameter)."""
        memory, memory_mask = self.encode(char_ids, train=train)
        mel, stops, alignments = self.decode_teacher(
            memory, memory_mask, mel_gt, train=train
        )
        linear = self.postprocess(mel, frame_mask, train=train)
        f32 = lambda x: x.astype(jnp.float32)  # noqa: E731 — losses in f32
        return {
            "mel": f32(mel),
            "linear": f32(linear),
            "stop_logits": f32(stops),
            "alignments": f32(alignments),
        }
