"""Attention GRU decoder as fixed-shape `lax.scan` programs.

The reference decodes with `tf.contrib.seq2seq.dynamic_decode` + an
`AttentionWrapper` around GRU cells (SURVEY.md §2.2/§3.1): per-step host-free
but dynamically-shaped.  Here both decoding modes compile to single fixed-shape
scans (SURVEY.md §7 hard parts):

* **teacher-forced** (training): scan over ground-truth frame groups,
* **autoregressive** (inference): scan feeding back the model's own last
  frame, with stop-token *mask accumulation* instead of a dynamic
  `while_loop` — every utterance in the batch runs to `max_steps`, finished
  ones keep a frozen carry and masked outputs, so one compiled program covers
  any batch and stays pjit/pod-friendly.

Each step emits `r = reduction_factor` mel frames + r stop logits
(stop tokens are a rebuild addition over the reference — BASELINE north star).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sstts.config import ArchitectureConfig
from sstts.model.attention import attention_context, make_attention
from sstts.model.modules import PreNet
from sstts.model.rnn import GRUCell


class DecoderCarry(NamedTuple):
    attn_h: jnp.ndarray  # (B, Ha) attention-GRU state
    dec_hs: Tuple[jnp.ndarray, ...]  # decoder GRU states, each (B, Hd)
    context: jnp.ndarray  # (B, Dm) previous attention context
    alignment: jnp.ndarray  # (B, T) previous alignment
    prev_frame: jnp.ndarray  # (B, n_mels) last emitted/teacher frame
    finished: jnp.ndarray  # (B,) bool, AR stop-token accumulation


class StepOutput(NamedTuple):
    mel: jnp.ndarray  # (B, r, n_mels)
    stop_logits: jnp.ndarray  # (B, r)
    alignment: jnp.ndarray  # (B, T)
    finished: jnp.ndarray  # (B,) finished *before* this step's emission


class DecoderCell(nn.Module):
    """One decoder step: prenet -> attention GRU -> residual GRU stack -> r*M."""

    arch: ArchitectureConfig
    n_mels: int
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        a = self.arch
        self.prenet = PreNet(
            a.prenet_units, a.prenet_dropout, a.prenet_dropout_at_inference,
            dtype=self.dtype, name="prenet",
        )
        self.attention = make_attention(
            a.attention_type, a.attention_units, self.dtype,
            window=a.local_attention_window,
        )
        self.attn_gru = GRUCell(a.attention_gru_units, dtype=self.dtype)
        self.dec_proj = nn.Dense(a.decoder_gru_units, dtype=self.dtype)
        self.dec_grus = [
            GRUCell(a.decoder_gru_units, dtype=self.dtype, name=f"dec_gru{i}")
            for i in range(a.decoder_gru_layers)
        ]
        self.frame_proj = nn.Dense(a.reduction_factor * self.n_mels, dtype=self.dtype)
        self.stop_proj = nn.Dense(a.reduction_factor, dtype=self.dtype)

    def init_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.attention.init_keys(memory)

    def init_carry(self, batch: int, t_enc: int, memory_dim: int) -> DecoderCarry:
        a = self.arch
        # First alignment points at position 0 (standard seq2seq convention);
        # relevant only for local attention's window placement.
        align0 = jnp.zeros((batch, t_enc), self.dtype).at[:, 0].set(1.0)
        return DecoderCarry(
            attn_h=jnp.zeros((batch, a.attention_gru_units), self.dtype),
            dec_hs=tuple(
                jnp.zeros((batch, a.decoder_gru_units), self.dtype)
                for _ in range(a.decoder_gru_layers)
            ),
            context=jnp.zeros((batch, memory_dim), self.dtype),
            alignment=align0,
            prev_frame=jnp.zeros((batch, self.n_mels), self.dtype),  # <GO>
            finished=jnp.zeros((batch,), bool),
        )

    def _sequential_chain(
        self,
        carry: DecoderCarry,
        prenet_out: jnp.ndarray,
        memory: jnp.ndarray,
        keys: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
    ):
        """The genuinely sequential per-step chain shared by `__call__` and
        `teacher_step`: attention GRU -> attention -> residual GRU stack.
        ONE definition so the two step entry points (and the Pallas
        whole-scan kernel's parity test against them) can never diverge.
        Returns (attn_h, alignment, context, new_dec_hs, x)."""
        attn_in = jnp.concatenate([prenet_out, carry.context], axis=-1)
        attn_h, _ = self.attn_gru(carry.attn_h, (attn_in, None))
        alignment = self.attention(attn_h, keys, memory_mask, carry.alignment)
        context = attention_context(alignment, memory)
        # The softmax runs in f32 (bf16-safe); keep the carry dtype uniform.
        alignment = alignment.astype(self.dtype)
        context = context.astype(self.dtype)
        attn_h = attn_h.astype(self.dtype)
        x = self.dec_proj(jnp.concatenate([attn_h, context], axis=-1))
        new_dec_hs = []
        for gru, h in zip(self.dec_grus, carry.dec_hs):
            h_new, out = gru(h, (x, None))
            new_dec_hs.append(h_new)
            x = x + out  # residual connection
        return attn_h, alignment, context, tuple(new_dec_hs), x

    def teacher_step(
        self,
        carry: DecoderCarry,
        prenet_out: jnp.ndarray,
        memory: jnp.ndarray,
        keys: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
    ) -> Tuple[DecoderCarry, Tuple[jnp.ndarray, jnp.ndarray]]:
        """One teacher-forced step with the MXU-hostile work hoisted out.

        Teacher forcing knows every step's input upfront, so the pre-net
        runs BEFORE the scan as one batched (B, S, .) matmul pair and the
        frame/stop projections run AFTER it on the stacked features
        (SURVEY.md §7 "small sequential matmuls underutilize the MXU") —
        this step keeps only the genuinely sequential chain.  Returns
        (new_carry, (x, alignment)) where x is the feature the projections
        consume.  Same math as `__call__`'s teacher path, step for step
        (both call `_sequential_chain`).
        """
        attn_h, alignment, context, new_dec_hs, x = self._sequential_chain(
            carry, prenet_out, memory, keys, memory_mask
        )
        new_carry = DecoderCarry(
            attn_h=attn_h,
            dec_hs=tuple(new_dec_hs),
            context=context,
            alignment=alignment,
            # prev_frame is never read under teacher forcing (the next
            # step's input is the next teacher frame).
            prev_frame=carry.prev_frame,
            finished=carry.finished,
        )
        return new_carry, (x, alignment)

    def __call__(
        self,
        carry: DecoderCarry,
        teacher_frame: Optional[jnp.ndarray],
        memory: jnp.ndarray,
        keys: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        train: bool = True,
        stop_threshold: float = 0.5,
    ) -> Tuple[DecoderCarry, StepOutput]:
        a = self.arch
        autoregressive = teacher_frame is None
        prev = carry.prev_frame if autoregressive else teacher_frame

        pre = self.prenet(prev, train=train)
        attn_h, alignment, context, new_dec_hs, x = self._sequential_chain(
            carry, pre, memory, keys, memory_mask
        )

        mel = self.frame_proj(x).reshape(-1, a.reduction_factor, self.n_mels)
        stop_logits = self.stop_proj(x)

        if autoregressive:
            # Freeze everything once finished; emit silence frames.
            fin = carry.finished
            keep = lambda new, old: jnp.where(  # noqa: E731
                fin.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
            )
            mel = jnp.where(fin[:, None, None], 0.0, mel)
            new_carry = DecoderCarry(
                attn_h=keep(attn_h, carry.attn_h),
                dec_hs=tuple(
                    keep(nh, oh) for nh, oh in zip(new_dec_hs, carry.dec_hs)
                ),
                context=keep(context, carry.context),
                alignment=keep(alignment, carry.alignment),
                prev_frame=keep(mel[:, -1, :], carry.prev_frame),
                finished=jnp.logical_or(
                    fin,
                    jax.nn.sigmoid(stop_logits.max(axis=-1)) > stop_threshold,
                ),
            )
            return new_carry, StepOutput(mel, stop_logits, alignment, fin)

        new_carry = DecoderCarry(
            attn_h=attn_h,
            dec_hs=tuple(new_dec_hs),
            context=context,
            alignment=alignment,
            prev_frame=mel[:, -1, :],
            finished=carry.finished,
        )
        return new_carry, StepOutput(mel, stop_logits, alignment, carry.finished)


def group_frames(mel: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, F, M) -> (B, F//r, r, M); F must be a multiple of r."""
    b, f, m = mel.shape
    if f % r:
        raise ValueError(f"frame count {f} not a multiple of reduction factor {r}")
    return mel.reshape(b, f // r, r, m)


def teacher_inputs(mel_gt: jnp.ndarray, r: int) -> jnp.ndarray:
    """Teacher-forcing inputs: last frame of each *previous* r-group.

    Step 0 receives the zero <GO> frame.  (B, F, M) -> (B, F//r, M).
    """
    groups = group_frames(mel_gt, r)  # (B, S, r, M)
    last = groups[:, :, -1, :]  # (B, S, M)
    return jnp.pad(last[:, :-1], ((0, 0), (1, 0), (0, 0)))
