"""Fused frames->frames reprojection for the Griffin-Lim inner loop.

One Griffin-Lim iteration moves spectra -> (iSTFT) -> time signal -> (STFT)
-> spectra.  Between the two DFT GEMMs the composed data path
(`overlap_add` -> window-sum normalize -> reflect pad -> `frame_signal`)
materializes the time signal and several frame-array temporaries — measured
~3.6 ms of a 5.4 ms iteration at the headline shapes (B=32 x 800 frames,
`scripts/profile_gl_parts.py`), with the four GEMMs costing only ~1.9 ms.

This module collapses that data path into a single *banded shift-add in the
frames domain*.  With window support `w_len`, hop `h`, and `start = n_fft//2
- lo` (`lo` = first nonzero window tap), the overlap-added sample under
frame position (t, j) is

    y[t*h + j - start] = sum_d F[t - d, j + d*h],   d in [-D, D],
    D = (w_len - 1) // h,

so the re-framed, window-sum-normalized frames are

    F'[t, j] = inv_wss[lo + t*h + j] * sum_d F[t - d, j + d*h]

for positions whose sample index s = t*h + j - start falls inside the
signal, plus mirrored copies (librosa's reflect padding) for the few edge
positions where s < 0 or s >= length.  Every term is a static slice of a
zero-padded F — one XLA fusion, no gather/scatter, no time-domain
temporaries.  Equivalent to `istft` -> `stft` composition (tested in
tests/test_dsp.py); SURVEY.md §3.5 / §7 "On-device Griffin-Lim".
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sstts.dsp import reference as ref


@functools.lru_cache(maxsize=None)
def _band_plan(
    n_fft: int, hop: int, win_length: int, n_frames: int, length: int
) -> dict:
    """Static host-side plan: geometry, normalization, mirror runs.

    Returns host numpy only (lru_cache'd — see CLAUDE.md).
    """
    window = ref.pad_center(ref.hann_window(win_length), n_fft).astype(np.float64)
    nz = np.nonzero(window)[0]
    lo, hi = int(nz[0]), int(nz[-1]) + 1
    w_len = hi - lo
    start = n_fft // 2 - lo
    d_max = (w_len - 1) // hop
    t_idx = np.arange(n_frames)

    # inv window-sum-square envelope over the padded OLA domain, framed:
    # wss2d[t, j] = inv_wss_full[lo + t*hop + j], zeroed outside the signal.
    w2 = window**2
    total = (n_frames - 1) * hop + n_fft
    wss = np.zeros(total, np.float64)
    for i in range(n_frames):
        wss[i * hop : i * hop + n_fft] += w2
    inv_full = np.where(wss > 1e-10, 1.0 / np.maximum(wss, 1e-10), 1.0)
    pos = lo + t_idx[:, None] * hop + np.arange(w_len)[None, :]  # (T, w_len)
    s = pos - n_fft // 2  # signal sample index at each frame position
    wss2d = inv_full[pos] * ((s >= 0) & (s < length))

    # Mirror runs implementing librosa's reflect padding at the two edges:
    # out[t, a:b] = flip(out[t_src, src_lo:src_hi]).
    runs: List[Tuple[int, int, int, int, int, int]] = []

    def add_runs(t: int, js: np.ndarray, u_mirror: np.ndarray) -> None:
        if js.size == 0:
            return
        t_src = np.minimum(n_frames - 1, u_mirror // hop)
        j_src = u_mirror - t_src * hop
        # group contiguous j with equal t_src (j_src then descends by 1)
        cut = np.flatnonzero(np.diff(t_src)) + 1
        for grp_j, grp_src_t, grp_src_j in zip(
            np.split(js, cut), np.split(t_src, cut), np.split(j_src, cut)
        ):
            runs.append(
                (
                    t,
                    int(grp_j[0]),
                    int(grp_j[-1]) + 1,
                    int(grp_src_t[0]),
                    int(grp_src_j[-1]),
                    int(grp_src_j[0]) + 1,
                )
            )

    U = start + length
    for t in range(n_frames):
        u = t * hop + np.arange(w_len)
        left = np.flatnonzero(u < start)
        if left.size:
            add_runs(t, left, 2 * start - u[left])
        right = np.flatnonzero(u >= U)
        if right.size:
            add_runs(t, right, 2 * (U - 1) - u[right])

    return {
        "lo": lo,
        "w_len": w_len,
        "start": start,
        "d_max": d_max,
        "wss2d": wss2d.astype(np.float32),
        "runs": tuple(runs),
    }


def _apply_mirror_runs(out: jnp.ndarray, runs) -> jnp.ndarray:
    """Overwrite the few edge positions with their reflect-pad mirrors."""
    for t, a, b, t_src, src_lo, src_hi in runs:
        out = out.at[..., t, a:b].set(
            jnp.flip(out[..., t_src, src_lo:src_hi], axis=-1)
        )
    return out


def reproject_frames(
    frames: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int,
    length: int,
) -> jnp.ndarray:
    """Windowed synthesis frames -> next iteration's analysis frames.

    `frames` is (..., n_frames, w_len) — the iSTFT GEMM output on the
    window support.  Returns the same shape, equal to
    `frame_signal(reflect_pad(istft_ola(frames)))` restricted to the window
    support (the exact composition it replaces).  Accumulates in f32.
    """
    *batch, n_frames, w_len = frames.shape
    plan = _band_plan(n_fft, hop, win_length, n_frames, length)
    assert w_len == plan["w_len"], (w_len, plan["w_len"])
    d_max = plan["d_max"]
    col_pad = d_max * hop

    fp = jnp.pad(
        frames.astype(jnp.float32),
        [(0, 0)] * len(batch) + [(d_max, d_max), (col_pad, col_pad)],
    )
    acc = None
    for d in range(-d_max, d_max + 1):
        term = fp[
            ...,
            d_max - d : d_max - d + n_frames,
            col_pad + d * hop : col_pad + d * hop + w_len,
        ]
        acc = term if acc is None else acc + term
    out = acc * jnp.asarray(plan["wss2d"])
    return _apply_mirror_runs(out, plan["runs"])


def _mirror_runs_windowed(
    out: jnp.ndarray, runs, n_frames: int
) -> jnp.ndarray:
    """Apply mirror runs via small head/tail row windows + one concat.

    A full-array `.at[].set` per run makes XLA copy the whole frames tensor
    once per run inside the Griffin-Lim loop; restricting the updates to the
    few edge rows and re-assembling with a single concatenate lets XLA
    materialize the result directly into the next GEMM's operand.
    """
    if not runs:
        return out
    t_all = [r[0] for r in runs] + [r[3] for r in runs]
    head_rows = [t for t in t_all if t < n_frames // 2]
    tail_rows = [t for t in t_all if t >= n_frames // 2]
    win_l = max(head_rows, default=-1) + 1
    win_r = min(tail_rows, default=n_frames)
    if win_l > win_r:  # tiny frame counts: windows overlap, do it plainly
        return _apply_mirror_runs(out, runs)
    head = out[:, :win_l]
    tail = out[:, win_r:]
    for t, a, b, t_src, src_lo, src_hi in runs:
        if t < win_l:
            head = head.at[:, t, a:b].set(
                jnp.flip(head[:, t_src, src_lo:src_hi], axis=-1)
            )
        else:
            tail = tail.at[:, t - win_r, a:b].set(
                jnp.flip(tail[:, t_src - win_r, src_lo:src_hi], axis=-1)
            )
    return jnp.concatenate([head, out[:, win_l:win_r], tail], axis=1)


def _pick_block(n_frames: int, bt_max: int = 256, bt_min: int = 64) -> int:
    """Multiple-of-8 frame-block size in [bt_min, bt_max] minimizing row
    padding (Mosaic needs the block sublane dim divisible by 8; non-dividing
    totals are handled by zero-padding the frame axis up to the grid)."""
    if n_frames <= bt_max:
        return -(-n_frames // 8) * 8
    best = None
    for bt in range(bt_max, bt_min - 1, -8):
        pad = -(-n_frames // bt) * bt - n_frames
        if best is None or (pad, -bt) < best[0]:
            best = ((pad, -bt), bt)
    return best[1]


def reproject_frames_pallas(
    frames: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int,
    length: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas TPU kernel for `reproject_frames`.

    The banded shift-add runs entirely in VMEM: each grid step DMAs one
    (block + halo) slab of frames, applies the 2D+1 shifted adds with the
    VPU, scales by the window-sum envelope, and writes one output block —
    one HBM read + one HBM write per iteration instead of XLA's
    materialized pad/slice chain (`scripts/profile_stages.py`: 3.6 ms ->
    ~0.3 ms per Griffin-Lim iteration at the headline shapes).  The edge
    mirror surgery (a handful of rows) stays in XLA.  Falls back to the
    XLA formulation when the frame count has no suitable block divisor.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    *batch, n_frames, w_in = frames.shape
    plan = _band_plan(n_fft, hop, win_length, n_frames, length)
    w_len = plan["w_len"]
    assert w_in in (w_len, -(-w_len // 128) * 128), (w_in, w_len)
    d_max = plan["d_max"]
    bt = _pick_block(n_frames)
    t_round = -(-n_frames // bt) * bt

    if not batch:
        return reproject_frames_pallas(
            frames[None], n_fft, hop, win_length, length, interpret
        )[0]
    b_total = int(np.prod(batch))
    # Lane dimension padded to a 128 multiple so every in-kernel shape is
    # tiling-aligned.  The rotate's wrapped lanes (including the
    # [w_len, w_pad) padding garbage) always land inside masked regions:
    # for shift d the garbage occupies out lanes >= w_len - d*hop while the
    # valid mask ends exactly there (d > 0), or < |d|*hop while the mask
    # starts exactly there (d < 0).
    w_pad = -(-w_len // 128) * 128
    f3 = frames.reshape(b_total, n_frames, frames.shape[-1])
    col_pad = w_pad - frames.shape[-1]
    row_pad = t_round - n_frames
    if col_pad or row_pad:
        f3 = jnp.pad(f3, [(0, 0), (0, row_pad), (0, col_pad)])
    n_t = t_round // bt
    # Halo rows (d_max above + d_max below each block) travel as a second,
    # tiny pipelined input, so the main frames array streams through the
    # Pallas grid pipeline block-aligned with automatic double buffering —
    # an earlier version DMA'd an overlapping (block + halo) slab manually
    # from ANY-space HBM, which serialized the transfer against compute and
    # cost ~35% of the kernel's runtime at the headline shapes.
    # Built with O(1) XLA ops (this runs once per Griffin-Lim iteration, and
    # at small sub-batches op dispatch count matters): view frames as blocks,
    # then each block's halo is the tail/head rows of its neighbors.
    f3r = f3.reshape(b_total, n_t, bt, w_pad)
    zrow = jnp.zeros((b_total, 1, d_max, w_pad), f3.dtype)
    tops = jnp.concatenate([zrow, f3r[:, :-1, bt - d_max :]], axis=1)
    bots = jnp.concatenate([f3r[:, 1:, :d_max], zrow], axis=1)
    halo = jnp.concatenate([tops, bots], axis=2)  # (b, n_t, 2*d_max, w_pad)
    wss2d = jnp.pad(
        jnp.asarray(plan["wss2d"]),
        [(0, t_round - n_frames), (0, w_pad - w_len)],
    )
    dtype = frames.dtype

    # Center rows sit at sublane-aligned offset 8 in the f32 scratch slab;
    # the halos occupy the fringes ([8-d_max, 8) and [8+bt, 8+bt+d_max)).
    off = max(8, -(-d_max // 8) * 8)

    def kernel(cblk, hblk, wss_ref, out_ref, f32blk):
        # Assemble the haloed slab in f32 (the lane rotate needs 32-bit).
        f32blk[off - d_max : off] = hblk[0, 0, :d_max].astype(jnp.float32)
        f32blk[off : off + bt] = cblk[0].astype(jnp.float32)
        f32blk[off + bt : off + bt + d_max] = hblk[0, 0, d_max:].astype(
            jnp.float32
        )
        f = f32blk[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, w_pad), 1)
        # d = 0 term needs no rotate and no mask: its out-of-support lanes
        # only ever see the input's [w_len, w_pad) padding, and the final
        # wss scale is zero beyond the window support anyway.
        acc = f[off : off + bt, :]
        for d in range(-d_max, d_max + 1):
            if d == 0:
                continue
            # term[t, j] = rows[t, j + d*hop]; the lane rotate wraps, but
            # every wrapped position is exactly a masked (out-of-support)
            # position, so wrap semantics never leak into the result.
            rows = f[off - d : off - d + bt, :]
            rows = pltpu.roll(rows, shift=(-d * hop) % w_pad, axis=1)
            valid = (lane >= -d * hop) & (lane < w_len - d * hop)
            acc = acc + jnp.where(valid, rows, 0.0)
        out_ref[0] = (acc * wss_ref[:]).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_total, t_round, w_pad), dtype),
        grid=(b_total, n_t),
        in_specs=[
            pl.BlockSpec(
                (1, bt, w_pad), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 2 * d_max, w_pad), lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bt, w_pad), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bt, w_pad), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((off + bt + d_max, w_pad), jnp.float32),
        ],
        interpret=interpret,
    )(f3, halo, wss2d)
    if t_round > n_frames:
        out = out[:, :n_frames]
    out = _mirror_runs_windowed(out, plan["runs"], n_frames)
    return out.reshape(*batch, n_frames, w_pad)[..., :w_in]


def reproject(
    frames: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int,
    length: int,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, XLA banded formulation elsewhere.

    Returns the reprojected frames in the input dtype.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return reproject_frames_pallas(frames, n_fft, hop, win_length, length)
    # The XLA path also accepts the GL loop's 128-lane-padded layout (the
    # Pallas kernel's calling convention): slice to the window support,
    # reproject, and re-pad with exact zeros.
    n_frames, w_in = frames.shape[-2], frames.shape[-1]
    plan = _band_plan(n_fft, hop, win_length, n_frames, length)
    w_len = plan["w_len"]
    if w_in != w_len:
        assert w_in == -(-w_len // 128) * 128, (w_in, w_len)
        out = reproject_frames(
            frames[..., :w_len], n_fft, hop, win_length, length
        ).astype(frames.dtype)
        return jnp.pad(
            out, [(0, 0)] * (out.ndim - 1) + [(0, w_in - w_len)]
        )
    return reproject_frames(frames, n_fft, hop, win_length, length).astype(
        frames.dtype
    )
