"""Training losses (reference `tacotron/model.py` loss — SURVEY.md §2.2).

L1 on mel + L1 on linear spectrogram, with the linear term re-weighted toward
low frequencies (<3 kHz) as in the Tacotron paper, plus BCE on the stop token
(a rebuild addition, SURVEY.md §2.2).  All terms are masked by the per-example
valid-frame counts so padded batches train identically to unpadded ones.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sstts.config import ArchitectureConfig, DatasetConfig


def frame_mask_from_lengths(lengths: jnp.ndarray, total: int) -> jnp.ndarray:
    """(B,) lengths -> (B, total) bool mask."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, total), 1)
    return pos < lengths[:, None]


def masked_l1(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    m = mask[..., None].astype(pred.dtype)
    num = jnp.sum(jnp.abs(pred - target) * m)
    den = jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
    return num / den


def stop_targets(loss_frames: jnp.ndarray, total: int) -> jnp.ndarray:
    """1.0 at and after each utterance's final valid frame, else 0."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, total), 1)
    return (pos >= (loss_frames - 1)[:, None]).astype(jnp.float32)


def tacotron_loss(
    outputs: Dict[str, jnp.ndarray],
    mel_gt: jnp.ndarray,
    linear_gt: jnp.ndarray,
    loss_frames: jnp.ndarray,
    arch: ArchitectureConfig,
    data: DatasetConfig,
    text_lengths: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    total = mel_gt.shape[1]
    mask = frame_mask_from_lengths(loss_frames, total)

    l_mel = masked_l1(outputs["mel"], mel_gt, mask)

    n_low = max(1, int(arch.loss_low_freq_hz / (data.sample_rate / 2) * data.n_linear))
    l_lin_full = masked_l1(outputs["linear"], linear_gt, mask)
    l_lin_low = masked_l1(
        outputs["linear"][..., :n_low], linear_gt[..., :n_low], mask
    )
    w = arch.loss_low_freq_weight
    l_linear = (1.0 - w) * l_lin_full + w * l_lin_low

    logits = outputs["stop_logits"]
    targets = stop_targets(loss_frames, total)
    # Mask extends one group past the end so the positive class is seen.
    # loss_frames == 0 marks a fill row (epoch-tail batch padding): it must
    # contribute nothing, so its stop mask is empty rather than the first
    # reduction group.
    stop_mask = frame_mask_from_lengths(
        jnp.where(
            loss_frames > 0,
            jnp.minimum(loss_frames + arch.reduction_factor, total),
            0,
        ),
        total,
    ).astype(jnp.float32)
    bce = optax_sigmoid_bce(logits, targets)
    l_stop = jnp.sum(bce * stop_mask) / jnp.maximum(jnp.sum(stop_mask), 1.0)

    loss = l_mel + l_linear + arch.stop_token_weight * l_stop
    metrics = {
        "loss_mel": l_mel,
        "loss_linear": l_linear,
        "loss_stop": l_stop,
    }
    if arch.guided_attention_weight > 0.0 and text_lengths is not None:
        dec_steps = jnp.ceil(
            loss_frames.astype(jnp.float32) / arch.reduction_factor
        )
        l_attn = guided_attention_loss(
            outputs["alignments"], text_lengths.astype(jnp.float32),
            dec_steps, arch.guided_attention_sigma,
        )
        loss = loss + arch.guided_attention_weight * l_attn
        metrics["loss_attn"] = l_attn
    metrics["loss"] = loss
    return loss, metrics


def optax_sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE (max(x,0) - x*z + log1p(exp(-|x|)))."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def guided_attention_loss(
    alignments: jnp.ndarray,
    text_lengths: jnp.ndarray,
    decoder_steps: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Diagonal attention prior (Tachibana et al. 2017, arXiv 1710.08969).

    Penalizes attention mass far from the text/audio diagonal:
    W[s, t] = 1 - exp(-(t/T - s/S)^2 / (2 sigma^2)), masked to each
    utterance's valid (decoder steps x text length) region.  An opt-in
    extension over the reference (guided_attention_weight=0 disables).
    """
    b, s_len, t_len = alignments.shape
    s_pos = jax.lax.broadcasted_iota(jnp.float32, (1, s_len, 1), 1)
    t_pos = jax.lax.broadcasted_iota(jnp.float32, (1, 1, t_len), 2)
    s_norm = s_pos / jnp.maximum(decoder_steps.reshape(b, 1, 1), 1.0)
    t_norm = t_pos / jnp.maximum(text_lengths.reshape(b, 1, 1), 1.0)
    w = 1.0 - jnp.exp(-((t_norm - s_norm) ** 2) / (2.0 * sigma**2))
    mask = (
        (s_pos < decoder_steps.reshape(b, 1, 1))
        & (t_pos < text_lengths.reshape(b, 1, 1))
    ).astype(jnp.float32)
    return jnp.sum(alignments * w * mask) / jnp.maximum(jnp.sum(mask), 1.0)
