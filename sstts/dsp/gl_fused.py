"""Fully fused Griffin-Lim iteration as one Pallas TPU kernel.

`sstts.dsp.griffin_lim._loop_banded` composes each iteration from four XLA
ops: iSTFT GEMM -> banded reprojection (Pallas) -> STFT GEMM -> fused
phase-renorm/rescale.  That already minimizes work, but the *spectrum* and
*frames* arrays still make a full HBM round-trip between every stage:

    read q -> write frames -> read frames -> write frames' ->
    read frames' -> write s -> read s + mag -> write q'

This module collapses the whole iteration into ONE kernel.  Each grid step
(one batch row x one block of `bt` frames):

1. GEMM1: the block's spectrum rows (plus a 2*d_max-row halo, shipped as a
   second tiny input) x the inverse-DFT matrix -> windowed synthesis frames,
   f32, assembled in a VMEM scratch slab (MXU).
2. Banded shift-add in VMEM (lane rotates + masks, identical math to
   `reproject.reproject_frames_pallas`), scaled by the window-sum envelope.
3. GEMM2: reprojected frames x the forward-DFT matrix -> next spectrum, f32
   accumulation (MXU).
4. Fused renorm: q' = s * rsqrt(re^2 + im^2) * mag, cast to the loop dtype.

HBM traffic per iteration drops from ~8 full-array passes to:
read q + halo + mag, write q'.  The handful of edge rows whose reprojected
frames receive reflect-pad mirror values (impractical lane-reversals
in-kernel) are repaired exactly by a thin XLA post-pass that rebuilds just
those frames rows from q; see `_patch_edges` / `_edge_frames_xla`.

Layout contract (matching `_loop_banded`'s packed bf16 path): the spectrum
rides flat as (..., n_frames, 2*hp) with the real half in lanes [0, hp) and
the imaginary half in [hp, 2*hp); for even n_fft the Nyquist coefficient is
packed into DC's imaginary slot.  `w_inv` is (2*hp, wp), `w_fwd` (wp, 2*hp),
both zero-padded beyond the true window support / spectrum bins, so padding
lanes contribute exact zeros through both GEMMs.

SURVEY.md §2.6 (TPU-native Griffin-Lim), §7 "Pallas optimization pass".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sstts.dsp.reproject import _band_plan, _apply_mirror_runs
from sstts.dsp.reproject import _pick_block as _pick_block_capped


#: Frame-block row cap.  Bigger blocks raise MXU m-utilization (the two
#: in-kernel GEMMs process bt rows per pass against the 128-row systolic
#: array) but grow VMEM residency; the two resident DFT matrices already
#: hold ~9 MB of the ~16 MB/core.  Measured on v5e at the headline shapes
#: (scripts/profile_fused_gl.py): bt 64 -> 51.2 ms GL-60, bt 128 -> 43.5 ms
#: (m-utilization beats the 12% row padding), and 128 still fits VMEM.
BT_MAX = 128

#: Trace-time ablation hook for `fused_reproject_analyze` — MEASUREMENT
#: ONLY (scripts/profile_gl_ablate.py; round-3 verdict #5: attribute the
#: semi kernel's distance to its pure-GEMM floor).  None = full kernel;
#: "no_shift" skips the banded shift-add VPU loop; "no_renorm" skips the
#: phase-renorm/rescale epilogue.  Both break numerics; never set outside
#: the profiling harness.
_ABLATE: str | None = None


def _pick_block(n_frames: int, bt_max: int | None = None) -> int:
    """Multiple-of-8 frame-block size <= bt_max minimizing row padding
    (shared heuristic: `reproject._pick_block`)."""
    bt_max = BT_MAX if bt_max is None else bt_max
    return _pick_block_capped(n_frames, bt_max=bt_max, bt_min=16)


def _renorm_rows(s32: jnp.ndarray, mag_rows: jnp.ndarray, hp: int, dtype):
    """q' rows = s * rsqrt(|s|^2) * mag (joint DC/Nyquist pair in packed
    layouts, same contract as `_loop_banded`'s renorm)."""
    sr = s32[..., :hp]
    si = s32[..., hp:]
    inv = jax.lax.rsqrt(sr * sr + si * si + 1e-24)
    return (
        s32 * jnp.concatenate([inv, inv], axis=-1) * mag_rows.astype(jnp.float32)
    ).astype(dtype)


def _edge_frames_xla(
    q3: jnp.ndarray,
    w_inv: jnp.ndarray,
    plan: dict,
    rows_lo: int,
    rows_hi: int,
    n_frames: int,
    hop: int,
    precision,
    dtype,
) -> jnp.ndarray:
    """Exact (pre-mirror) reprojected frames rows [rows_lo, rows_hi),
    rebuilt from the spectrum in XLA: GEMM1 on the thin q neighborhood, the
    banded shift-add on lane-padded columns (lanes beyond the window support
    are exact zeros in both directions), then the wss envelope."""
    d_max, w_len = plan["d_max"], plan["w_len"]
    wp = w_inv.shape[1]
    g_lo = max(0, rows_lo - d_max)
    g_hi = min(n_frames, rows_hi + d_max)
    f1 = jnp.matmul(
        q3[:, g_lo:g_hi].astype(dtype), w_inv.astype(dtype),
        precision=precision, preferred_element_type=jnp.float32,
    )
    top = g_lo - (rows_lo - d_max)
    bot = (rows_hi + d_max) - g_hi
    col_pad = d_max * hop
    f1 = jnp.pad(f1, [(0, 0), (top, bot), (col_pad, col_pad)])
    H = rows_hi - rows_lo
    acc = None
    for d in range(-d_max, d_max + 1):
        term = f1[
            :,
            d_max - d : d_max - d + H,
            col_pad + d * hop : col_pad + d * hop + wp,
        ]
        acc = term if acc is None else acc + term
    wss = jnp.pad(
        jnp.asarray(plan["wss2d"]), [(0, 0), (0, wp - w_len)]
    )[rows_lo:rows_hi]
    return acc * wss


def _patch_edges(
    qn: jnp.ndarray,
    q3: jnp.ndarray,
    mag2: jnp.ndarray,
    w_inv: jnp.ndarray,
    w_fwd: jnp.ndarray,
    plan: dict,
    n_frames: int,
    hop: int,
    hp: int,
    precision,
) -> jnp.ndarray:
    """Exactly recompute the few rows whose reprojected frames receive
    reflect-pad mirror values (wss-masked to zero inside the kernel).

    `runs` is static host data; targets and sources cluster at the first and
    last few frames, so each side is one thin slab: rebuild its frames rows
    from q, apply the mirror runs, redo GEMM2 + renorm, and reassemble with
    a single concatenate per side.
    """
    runs = plan["runs"]
    if not runs:
        return qn
    # Each side's slab must contain every run's target AND source rows
    # (sources can sit a few rows past the targets).
    half_t = n_frames // 2
    head_end = max(
        [max(r[0], r[3]) for r in runs if r[0] < half_t], default=-1
    ) + 1
    tail_start = min(
        [min(r[0], r[3]) for r in runs if r[0] >= half_t], default=n_frames
    )
    dtype = qn.dtype

    def fix(rows_lo, rows_hi, local_runs):
        slab = _edge_frames_xla(
            q3, w_inv, plan, rows_lo, rows_hi, n_frames, hop, precision,
            dtype,
        )
        slab = _apply_mirror_runs(slab, local_runs)
        s32 = jnp.matmul(
            slab.astype(dtype), w_fwd.astype(dtype), precision=precision,
            preferred_element_type=jnp.float32,
        )
        return _renorm_rows(s32, mag2[:, rows_lo:rows_hi], hp, dtype)

    if head_end > tail_start:  # tiny frame counts: slabs overlap, fix all
        return fix(0, n_frames, runs)

    parts = []
    if head_end > 0:
        parts.append(
            fix(0, head_end, [r for r in runs if r[0] < head_end])
        )
    parts.append(qn[:, head_end:tail_start])
    if tail_start < n_frames:
        local = [
            (r[0] - tail_start, r[1], r[2], r[3] - tail_start, r[4], r[5])
            for r in runs
            if r[0] >= tail_start
        ]
        parts.append(fix(tail_start, n_frames, local))
    return jnp.concatenate(parts, axis=1)


def _reproject_rows_xla(
    frames3: jnp.ndarray,
    plan: dict,
    rows_lo: int,
    rows_hi: int,
    n_frames: int,
    hop: int,
) -> jnp.ndarray:
    """Exact (pre-mirror) reprojected frames rows [rows_lo, rows_hi), built
    in XLA directly from the synthesis frames (the semi-fused kernel's
    input): banded shift-add on lane-padded columns + the wss envelope.
    Counterpart of `_edge_frames_xla`, minus its GEMM1 (frames are given)."""
    d_max, w_len = plan["d_max"], plan["w_len"]
    wp = frames3.shape[-1]
    g_lo = max(0, rows_lo - d_max)
    g_hi = min(n_frames, rows_hi + d_max)
    f1 = frames3[:, g_lo:g_hi].astype(jnp.float32)
    top = g_lo - (rows_lo - d_max)
    bot = (rows_hi + d_max) - g_hi
    col_pad = d_max * hop
    f1 = jnp.pad(f1, [(0, 0), (top, bot), (col_pad, col_pad)])
    H = rows_hi - rows_lo
    acc = None
    for d in range(-d_max, d_max + 1):
        term = f1[
            :,
            d_max - d : d_max - d + H,
            col_pad + d * hop : col_pad + d * hop + wp,
        ]
        acc = term if acc is None else acc + term
    wss = jnp.pad(
        jnp.asarray(plan["wss2d"]), [(0, 0), (0, wp - w_len)]
    )[rows_lo:rows_hi]
    return acc * wss


def fused_reproject_analyze(
    frames: jnp.ndarray,
    mag2: jnp.ndarray,
    w_fwd: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int,
    length: int,
    prev: jnp.ndarray | None = None,
    momentum: float = 0.0,
    precision=jax.lax.Precision.DEFAULT,
    interpret: bool = False,
):
    """Semi-fused Griffin-Lim iteration tail: reprojection + analysis GEMM +
    renorm as ONE Pallas kernel (the split path's stages 2-4).

    The split iteration (`griffin_lim._loop_banded`, iter_impl="split") runs
    GEMM1 (XLA) -> Pallas reprojection -> GEMM2 (XLA) -> renorm (XLA), which
    costs the frames array one extra HBM round-trip (reprojection write ->
    GEMM2 read) and the spectrum another (GEMM2 write -> renorm read).  This
    kernel keeps GEMM1 in XLA — where its full-M GEMM beats an in-kernel
    block GEMM (the fully fused kernel measured 7% behind split) — and fuses
    everything after it: each grid step DMAs one frames block (+ halo),
    shift-adds in VMEM, dots with the resident `w_fwd` (MXU), and applies the
    phase renorm / magnitude rescale in the epilogue.  Per-iteration HBM
    traffic for these stages drops from
    read F + write F' + read F' + write S + read (S, mag) + write Q'
    to read (F, halo, mag) + write Q'.

    momentum > 0 runs the fast-GL extrapolated update in the same epilogue
    (`prev` = previous iteration's raw spectrum): returns (q', s) so the
    loop can carry s; momentum == 0 returns q' alone.  Numerics match the
    split path op-for-op (same shift-add, same GEMM shape, same f32 renorm
    math — tested in tests/test_dsp.py); the few reflect-pad edge rows are
    repaired exactly in XLA, as in `fused_gl_iteration`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    *batch, n_frames, wp = frames.shape
    L = mag2.shape[-1]
    hp = L // 2
    plan = _band_plan(n_fft, hop, win_length, n_frames, length)
    w_len, d_max = plan["w_len"], plan["d_max"]
    assert wp == -(-w_len // 128) * 128 or interpret, (wp, w_len)
    assert w_fwd.shape == (wp, L), (w_fwd.shape, wp, L)
    with_momentum = prev is not None and momentum > 0.0
    bt = _pick_block(n_frames)
    t_round = -(-n_frames // bt) * bt
    n_t = t_round // bt
    if not batch:
        out = fused_reproject_analyze(
            frames[None], mag2[None], w_fwd, n_fft, hop, win_length, length,
            None if prev is None else prev[None], momentum, precision,
            interpret,
        )
        return (out[0][0], out[1][0]) if with_momentum else out[0]
    b_total = int(np.prod(batch))
    dtype = frames.dtype

    f3 = frames.reshape(b_total, n_frames, wp)
    mag3 = jnp.broadcast_to(
        mag2.reshape(-1, n_frames, L), (b_total, n_frames, L)
    )
    row_pad = t_round - n_frames
    if row_pad:
        f3p = jnp.pad(f3, [(0, 0), (0, row_pad), (0, 0)])
        mag3p = jnp.pad(mag3, [(0, 0), (0, row_pad), (0, 0)])
    else:
        f3p, mag3p = f3, mag3
    # Halo rows as a second tiny pipelined input (same O(1)-ops scheme as
    # reproject_frames_pallas / fused_gl_iteration).
    f4 = f3p.reshape(b_total, n_t, bt, wp)
    zrow = jnp.zeros((b_total, 1, d_max, wp), dtype)
    tops = jnp.concatenate([zrow, f4[:, :-1, bt - d_max :]], axis=1)
    bots = jnp.concatenate([f4[:, 1:, :d_max], zrow], axis=1)
    halo = jnp.concatenate([tops, bots], axis=2)  # (b, n_t, 2*d_max, wp)
    wss2d = jnp.pad(
        jnp.asarray(plan["wss2d"]),
        [(0, t_round - n_frames), (0, wp - w_len)],
    )
    w_fwd = w_fwd.astype(dtype)
    if with_momentum:
        p3 = jnp.broadcast_to(
            prev.reshape(-1, n_frames, L), (b_total, n_frames, L)
        )
        if row_pad:
            p3 = jnp.pad(p3, [(0, 0), (0, row_pad), (0, 0)])
        m32 = np.float32(momentum)

    off = max(8, -(-d_max // 8) * 8)
    R = off + bt + d_max

    def body(cblk, hblk, wfwd_ref, wss_ref, mblk, fscr):
        """Shared slab assembly + shift-add + GEMM2; returns f32 spectrum."""
        fscr[off - d_max : off] = hblk[0, 0, :d_max].astype(jnp.float32)
        fscr[off : off + bt] = cblk[0].astype(jnp.float32)
        fscr[off + bt : off + bt + d_max] = hblk[0, 0, d_max:].astype(
            jnp.float32
        )
        f = fscr[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, wp), 1)
        acc = f[off : off + bt, :]
        if _ABLATE != "no_shift":
            for d in range(-d_max, d_max + 1):
                if d == 0:
                    continue
                rows = f[off - d : off - d + bt, :]
                rows = pltpu.roll(rows, shift=(-d * hop) % wp, axis=1)
                valid = (lane >= -d * hop) & (lane < w_len - d * hop)
                acc = acc + jnp.where(valid, rows, 0.0)
        fr = acc * wss_ref[:]
        return jnp.dot(
            fr.astype(dtype), wfwd_ref[:], precision=precision,
            preferred_element_type=jnp.float32,
        )

    def renorm_block(s32, mblk):
        if _ABLATE == "no_renorm":
            return s32
        sr = s32[:, :hp]
        si = s32[:, hp:]
        inv = jax.lax.rsqrt(sr * sr + si * si + 1e-24)
        return (
            s32
            * jnp.concatenate([inv, inv], axis=1)
            * mblk[0].astype(jnp.float32)
        )

    blockspec_frames = pl.BlockSpec(
        (1, bt, wp), lambda ti, bi: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    blockspec_spec = pl.BlockSpec(
        (1, bt, L), lambda ti, bi: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    common_in_specs = [
        blockspec_frames,
        pl.BlockSpec(
            (1, 1, 2 * d_max, wp), lambda ti, bi: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (wp, 2 * hp), lambda ti, bi: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (bt, wp), lambda ti, bi: (ti, 0), memory_space=pltpu.VMEM
        ),
        blockspec_spec,
    ]
    scratch = [pltpu.VMEM((R, wp), jnp.float32)]

    if with_momentum:

        def kernel(cblk, hblk, wfwd_ref, wss_ref, mblk, pblk,
                   qout_ref, sout_ref, fscr):
            s32 = body(cblk, hblk, wfwd_ref, wss_ref, mblk, fscr)
            sout_ref[0] = s32.astype(sout_ref.dtype)
            extrap = s32 + m32 * (s32 - pblk[0].astype(jnp.float32))
            qout_ref[0] = renorm_block(extrap, mblk).astype(qout_ref.dtype)

        qn, sn = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((b_total, t_round, L), dtype),
                jax.ShapeDtypeStruct((b_total, t_round, L), dtype),
            ),
            grid=(n_t, b_total),
            in_specs=common_in_specs + [blockspec_spec],
            out_specs=(blockspec_spec, blockspec_spec),
            scratch_shapes=scratch,
            interpret=interpret,
        )(f3p, halo, w_fwd, wss2d, mag3p, p3)
    else:

        def kernel(cblk, hblk, wfwd_ref, wss_ref, mblk, qout_ref, fscr):
            s32 = body(cblk, hblk, wfwd_ref, wss_ref, mblk, fscr)
            qout_ref[0] = renorm_block(s32, mblk).astype(qout_ref.dtype)

        qn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b_total, t_round, L), dtype),
            grid=(n_t, b_total),
            in_specs=common_in_specs,
            out_specs=blockspec_spec,
            scratch_shapes=scratch,
            interpret=interpret,
        )(f3p, halo, w_fwd, wss2d, mag3p)
        sn = None

    if t_round > n_frames:
        qn = qn[:, :n_frames]
        sn = None if sn is None else sn[:, :n_frames]

    # Exact edge repair (reflect-pad mirror rows), rebuilt from the frames
    # input in XLA — same structure as _patch_edges, minus its GEMM1.
    runs = plan["runs"]
    if runs:
        half_t = n_frames // 2
        head_end = max(
            [max(r[0], r[3]) for r in runs if r[0] < half_t], default=-1
        ) + 1
        tail_start = min(
            [min(r[0], r[3]) for r in runs if r[0] >= half_t],
            default=n_frames,
        )

        def fix(rows_lo, rows_hi, local_runs):
            slab = _reproject_rows_xla(
                f3, plan, rows_lo, rows_hi, n_frames, hop
            )
            slab = _apply_mirror_runs(slab, local_runs)
            s32 = jnp.matmul(
                slab.astype(dtype), w_fwd, precision=precision,
                preferred_element_type=jnp.float32,
            )
            if with_momentum:
                ex = s32 + m32 * (
                    s32 - p3[:, rows_lo:rows_hi].astype(jnp.float32)
                )
                qrows = _renorm_rows(
                    ex, mag3[:, rows_lo:rows_hi], hp, dtype
                )
                return qrows, s32.astype(dtype)
            return (
                _renorm_rows(s32, mag3[:, rows_lo:rows_hi], hp, dtype),
                None,
            )

        def splice(arr, head, tail):
            parts = []
            if head is not None:
                parts.append(head)
            parts.append(arr[:, head_end:tail_start])
            if tail is not None:
                parts.append(tail)
            return jnp.concatenate(parts, axis=1)

        if head_end > tail_start:  # tiny frame counts: slabs overlap
            qn, s_fix = fix(0, n_frames, runs)
            sn = s_fix if sn is not None else None
        else:
            head_q = head_s = tail_q = tail_s = None
            if head_end > 0:
                head_q, head_s = fix(
                    0, head_end, [r for r in runs if r[0] < head_end]
                )
            if tail_start < n_frames:
                local = [
                    (r[0] - tail_start, r[1], r[2], r[3] - tail_start,
                     r[4], r[5])
                    for r in runs
                    if r[0] >= tail_start
                ]
                tail_q, tail_s = fix(tail_start, n_frames, local)
            qn = splice(qn, head_q, tail_q)
            if sn is not None:
                sn = splice(sn, head_s, tail_s)

    qn = qn.reshape(*batch, n_frames, L)
    if with_momentum:
        return qn, sn.reshape(*batch, n_frames, L)
    return qn


def fused_gl_iteration(
    q: jnp.ndarray,
    mag2: jnp.ndarray,
    w_inv: jnp.ndarray,
    w_fwd: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int,
    length: int,
    precision=jax.lax.Precision.DEFAULT,
    interpret: bool = False,
) -> jnp.ndarray:
    """One Griffin-Lim iteration q -> q' as a single fused Pallas program.

    q, mag2: (..., n_frames, 2*hp) loop-dtype arrays (flat re/im layout);
    w_inv: (2*hp, wp); w_fwd: (wp, 2*hp).  Numerically equivalent to
    `renorm(mm(reproject(mm(q, w_inv)), w_fwd))` from `_loop_banded`
    (tested in tests/test_dsp.py); edge rows are repaired exactly by
    `_patch_edges`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    *batch, n_frames, L = q.shape
    hp = L // 2
    wp = w_inv.shape[1]
    plan = _band_plan(n_fft, hop, win_length, n_frames, length)
    w_len, d_max = plan["w_len"], plan["d_max"]
    assert wp == -(-w_len // 128) * 128 or interpret, (wp, w_len)
    assert w_fwd.shape == (wp, L), (w_fwd.shape, wp, L)
    bt = _pick_block(n_frames)
    t_round = -(-n_frames // bt) * bt
    n_t = t_round // bt
    if not batch:
        return fused_gl_iteration(
            q[None], mag2[None], w_inv, w_fwd, n_fft, hop, win_length,
            length, precision, interpret,
        )[0]
    b_total = int(np.prod(batch))
    dtype = q.dtype

    q3 = q.reshape(b_total, n_frames, L)
    mag3 = jnp.broadcast_to(
        mag2.reshape(-1, n_frames, L), (b_total, n_frames, L)
    )
    row_pad = t_round - n_frames
    if row_pad:
        q3 = jnp.pad(q3, [(0, 0), (0, row_pad), (0, 0)])
        mag3 = jnp.pad(mag3, [(0, 0), (0, row_pad), (0, 0)])
    # Halo rows (d_max spectrum rows above + below each block) as a second,
    # tiny pipelined input — same scheme as reproject_frames_pallas.
    q4 = q3.reshape(b_total, n_t, bt, L)
    zrow = jnp.zeros((b_total, 1, d_max, L), dtype)
    tops = jnp.concatenate([zrow, q4[:, :-1, bt - d_max :]], axis=1)
    bots = jnp.concatenate([q4[:, 1:, :d_max], zrow], axis=1)
    halo = jnp.concatenate([tops, bots], axis=2)  # (b, n_t, 2*d_max, L)
    wss2d = jnp.pad(
        jnp.asarray(plan["wss2d"]),
        [(0, t_round - n_frames), (0, wp - w_len)],
    )
    w_inv = w_inv.astype(dtype)
    w_fwd = w_fwd.astype(dtype)

    off = max(8, -(-d_max // 8) * 8)
    R = off + bt + d_max  # f32 frames slab rows; [0, off-d_max) never read

    def kernel(cblk, hblk, winv_ref, wfwd_ref, wss_ref, mblk,
               qout_ref, fscr):
        # GEMM1 (MXU): block rows and halo rows -> f32 synthesis frames,
        # assembled into the scratch slab at center offset `off`.
        f_main = jnp.dot(
            cblk[0], winv_ref[:], precision=precision,
            preferred_element_type=jnp.float32,
        )
        f_halo = jnp.dot(
            hblk[0, 0], winv_ref[:], precision=precision,
            preferred_element_type=jnp.float32,
        )
        fscr[off - d_max : off] = f_halo[:d_max]
        fscr[off : off + bt] = f_main
        fscr[off + bt : off + bt + d_max] = f_halo[d_max:]
        f = fscr[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, wp), 1)
        # Banded shift-add: same rotate+mask scheme (and the same wrap-lands-
        # in-masked-lanes argument) as reproject_frames_pallas; here the
        # [w_len, wp) lanes are exact zeros (w_inv's padded columns).
        acc = f[off : off + bt, :]
        for d in range(-d_max, d_max + 1):
            if d == 0:
                continue
            rows = f[off - d : off - d + bt, :]
            rows = pltpu.roll(rows, shift=(-d * hop) % wp, axis=1)
            valid = (lane >= -d * hop) & (lane < w_len - d * hop)
            acc = acc + jnp.where(valid, rows, 0.0)
        fr = acc * wss_ref[:]
        # GEMM2 (MXU) + fused renorm/rescale.
        s = jnp.dot(
            fr.astype(dtype), wfwd_ref[:], precision=precision,
            preferred_element_type=jnp.float32,
        )
        sr = s[:, :hp]
        si = s[:, hp:]
        inv = jax.lax.rsqrt(sr * sr + si * si + 1e-24)
        qout_ref[0] = (
            s
            * jnp.concatenate([inv, inv], axis=1)
            * mblk[0].astype(jnp.float32)
        ).astype(qout_ref.dtype)

    # Grid order: frame blocks OUTER, batch INNER, so the wss envelope block
    # (index depends only on ti) is fetched once per frame block instead of
    # once per (batch, block) pair; the DFT matrices (constant index) are
    # fetched exactly once per call either way.
    qn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_total, t_round, L), dtype),
        grid=(n_t, b_total),
        in_specs=[
            pl.BlockSpec(
                (1, bt, L), lambda ti, bi: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 2 * d_max, L), lambda ti, bi: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2 * hp, wp), lambda ti, bi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (wp, 2 * hp), lambda ti, bi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, wp), lambda ti, bi: (ti, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bt, L), lambda ti, bi: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bt, L), lambda ti, bi: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((R, wp), jnp.float32)],
        interpret=interpret,
    )(q3, halo, w_inv, w_fwd, wss2d, mag3)

    if t_round > n_frames:
        qn = qn[:, :n_frames]
    qn = _patch_edges(
        qn, q3[:, :n_frames], mag3[:, :n_frames], w_inv, w_fwd, plan,
        n_frames, hop, hp, precision,
    )
    return qn.reshape(*batch, n_frames, L)
