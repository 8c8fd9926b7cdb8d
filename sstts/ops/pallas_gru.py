"""Pallas fused GRU-sequence kernel for TPU.

The [NS] north star calls for Pallas-fused conv+GRU cells (SURVEY.md §2.6).
This kernel runs an ENTIRE GRU sequence in one `pallas_call`:

* the time axis is the grid — Pallas pipelines the per-step input blocks
  HBM->VMEM with automatic double buffering,
* both weight matrices and the bias use constant index maps, so they are
  DMA'd to VMEM once and stay resident across all T steps,
* the hidden state lives in a VMEM scratch buffer for the whole sequence —
  it never round-trips to HBM between steps,
* both gate matmuls hit the MXU with f32 accumulation; the gate nonlinearity
  runs on the VPU in the same kernel,
* optional per-step masking freezes the carry on padded steps (same contract
  as the XLA path: padded batch == batch=1), and `reverse=True` flips the
  grid index map for the backward direction of a BiGRU.

The XLA `lax.scan` path (sstts.model.rnn) is the correctness oracle; tests
compare both (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gru_step_math(x, h, wx, wh, b):
    """Shared fused-gate GRU math: returns the new hidden state.

    Candidate uses the r * (h @ U_n) formulation (see sstts.model.rnn).
    """
    hidden = h.shape[-1]
    gx = jnp.dot(x, wx, preferred_element_type=jnp.float32) + b
    gh = jnp.dot(h, wh, preferred_element_type=jnp.float32)
    xr, xz, xn = gx[..., :hidden], gx[..., hidden : 2 * hidden], gx[..., 2 * hidden :]
    hr, hz, hn = gh[..., :hidden], gh[..., hidden : 2 * hidden], gh[..., 2 * hidden :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return z * h + (1.0 - z) * n


def _kernel(xs_ref, mask_ref, wx_ref, wh_ref, b_ref, ys_ref, h_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    x = xs_ref[0]  # (B, D)
    h = h_scratch[...]
    h_new = gru_step_math(x, h, wx_ref[...], wh_ref[...], b_ref[0])
    if mask_ref is not None:
        m = mask_ref[0]  # (B, 1) f32
        h_new = m * h_new + (1.0 - m) * h
        out = m * h_new
    else:
        out = h_new
    h_scratch[...] = h_new
    ys_ref[0] = out


def gru_sequence(
    xs: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    b: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    reverse: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T, D) inputs -> (B, T, H) GRU outputs in one fused kernel.

    wx: (D, 3H), wh: (H, 3H), b: (3H,); mask: optional (B, T) {0,1}.
    """
    batch, t_len, d_in = xs.shape
    hidden = wh.shape[0]
    xs_t = jnp.swapaxes(xs, 0, 1).astype(jnp.float32)  # (T, B, D)
    b2 = b.reshape(1, -1).astype(jnp.float32)

    if reverse:
        step_index = lambda t: (t_len - 1 - t, 0, 0)  # noqa: E731
    else:
        step_index = lambda t: (t, 0, 0)  # noqa: E731
    mask_index = step_index
    const2 = lambda t: (0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((1, batch, d_in), step_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_in, 3 * hidden), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, 3 * hidden), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * hidden), const2, memory_space=pltpu.VMEM),
    ]
    args = [xs_t, wx.astype(jnp.float32), wh.astype(jnp.float32), b2]
    if mask is not None:
        # (T, B, 1): a trailing unit dim keeps the block tiling legal on TPU
        # (a (1, B) block violates the sublane-divisibility constraint).
        mask_t = jnp.swapaxes(mask.astype(jnp.float32), 0, 1)[..., None]
        in_specs.insert(1, pl.BlockSpec((1, batch, 1), mask_index,
                                        memory_space=pltpu.VMEM))
        args.insert(1, mask_t)
        body = _kernel
    else:
        def body(xs_ref, wx_ref, wh_ref, b_ref, ys_ref, h_scratch):
            _kernel(xs_ref, None, wx_ref, wh_ref, b_ref, ys_ref, h_scratch)

    ys = pl.pallas_call(
        body,
        grid=(t_len,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, batch, hidden), step_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, batch, hidden), jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(*args)
    return jnp.swapaxes(ys, 0, 1)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gru_sequence_ad(
    xs: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    b: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    reverse: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused-sequence GRU: Pallas forward, XLA backward.

    `pallas_call` has no autodiff rule, so the backward pass rematerializes
    the sequence through the `lax.scan` oracle (identical math, identical
    parameter layout) and differentiates that.  Inference pays only the fast
    fused kernel; training pays one extra XLA forward inside the backward —
    acceptable because the train step is host-link-bound, not device-bound
    (BASELINE.md).  Measured on v5e (scripts/profile_gru.py, same-window
    A/B): 2.2x faster than the scan at the post-CBHG shape (B=32, T=800,
    H=128); parity-within-noise at encoder length (T=128).
    """
    return gru_sequence(xs, wx, wh, b, mask, reverse=reverse, interpret=interpret)


def _gru_ad_fwd(xs, wx, wh, b, mask, reverse, interpret):
    out = gru_sequence(xs, wx, wh, b, mask, reverse=reverse, interpret=interpret)
    return out, (xs, wx, wh, b, mask)


def _gru_ad_bwd(reverse, interpret, residuals, g):
    xs, wx, wh, b, mask = residuals

    def ref(xs, wx, wh, b):
        return gru_sequence_xla(xs, wx, wh, b, mask, reverse=reverse)

    _, vjp = jax.vjp(ref, xs, wx, wh, b)
    dxs, dwx, dwh, db = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dxs, dwx, dwh, db, dmask


gru_sequence_ad.defvjp(_gru_ad_fwd, _gru_ad_bwd)


def gru_sequence_xla(
    xs: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    b: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    reverse: bool = False,
) -> jnp.ndarray:
    """lax.scan oracle with identical semantics to `gru_sequence`."""
    batch = xs.shape[0]
    hidden = wh.shape[0]
    xs_t = jnp.swapaxes(xs, 0, 1).astype(jnp.float32)
    mask_t = None if mask is None else jnp.swapaxes(
        mask.astype(jnp.float32), 0, 1
    )

    def step(h, inp):
        x, m = inp
        h_new = gru_step_math(x, h, wx, wh, b)
        if m is not None:
            h_new = m[:, None] * h_new + (1.0 - m[:, None]) * h
            out = m[:, None] * h_new
        else:
            out = h_new
        return h_new, out

    h0 = jnp.zeros((batch, hidden), jnp.float32)
    _, ys = jax.lax.scan(step, h0, (xs_t, mask_t), reverse=reverse)
    if reverse:
        # lax.scan(reverse=True) already emits outputs in original order.
        pass
    return jnp.swapaxes(ys, 0, 1)
