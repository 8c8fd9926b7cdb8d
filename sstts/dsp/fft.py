"""MXU matmul FFT: real FFT/iFFT as four-step Cooley-Tukey DFT matmuls.

The TPU has no FFT unit, but it has a 128x128 systolic array.  This module
carries two matmul formulations of the transform, measured head-to-head at
the headline GL shape (25600, 2048) rows x n_fft, chained in-program,
2026-08-20 (`scripts/profile_fft_recon.py`):

* XLA's native TPU FFT lowering (`jnp.fft.rfft`): **7.92 ms/pass** — the
  baseline both alternatives are judged against.
* The four-step Cooley-Tukey rfft/irfft below: **24.5 ms/pass** — the
  factored form's FLOP savings drown in 128x128 tile padding of the ~32x32
  stage matmuls, so it LOSES to XLA's FFT at production shapes.  It stays
  as a golden-tested (~1e-6 vs `jnp.fft`) experimentation path only
  (`sstts.dsp.stft.USE_MATMUL_FFT`, default False).
* The window-support-reduced direct rDFT GEMM pair
  (`_rdft_matrices_windowed`, bf16): **0.63 ms/pass** — the form the
  Griffin-Lim loop actually runs.  The direct DFT keeps the full-width
  GEMM the MXU wants, the Hann window's 46% zero taps fold into the
  matrices, and bf16 halves the bytes; 12.6x faster than XLA's FFT.

Four-step construction (kept for reference / odd shapes):

* rFFT(N) of a real signal packs even/odd samples into a complex signal of
  length N' = N/2 and runs one complex FFT of size N' plus O(N) unpacking,
* the complex FFT uses the four-step (Bailey) decomposition N' = N1*N2:
  DFT_N1 down the columns (matmul), twiddle, DFT_N2 across the rows (matmul),
  transpose — with N1, N2 ~ sqrt(N') = 32 for the default n_fft=2048,
* complex arithmetic is expanded into real einsums with
  `preferred_element_type=f32` and HIGHEST precision, so results match
  `jnp.fft` to ~1e-6 (golden-tested) and the mel-L1 gate is unaffected.

`rfft` / `irfft` are drop-in replacements for `jnp.fft.rfft/irfft` on the
last axis for even N whose half factors into two integers; anything else
falls back to `jnp.fft` transparently.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


def _best_split(n: int) -> Optional[Tuple[int, int]]:
    """Factor n = a * b with a, b as close to sqrt(n) as possible."""
    best = None
    for a in range(int(math.isqrt(n)), 1, -1):
        if n % a == 0:
            best = (a, n // a)
            break
    if best is None or best[0] == 1:
        return None
    return best


@functools.lru_cache(maxsize=None)
def _cfft_consts(n: int):
    """(DFT_N1 re/im, twiddle re/im, DFT_N2 re/im) host constants, or None."""
    split = _best_split(n)
    if split is None:
        return None
    n1, n2 = split
    k1 = np.arange(n1)
    d1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)  # (k1, n1)
    kk = np.outer(np.arange(n1), np.arange(n2))
    tw = np.exp(-2j * np.pi * kk / n)  # (k1, n2)
    j2 = np.arange(n2)
    d2 = np.exp(-2j * np.pi * np.outer(j2, j2) / n2)  # (n2, k2)
    # NOTE: cached values must be host numpy (never jnp): a device array
    # created inside a jit trace would leak the tracer through the cache.
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)  # noqa: E731
    return (
        n1, n2,
        f32(d1.real), f32(d1.imag),
        f32(tw.real), f32(tw.imag),
        f32(d2.real), f32(d2.imag),
    )


def _cfft(re: jnp.ndarray, im: jnp.ndarray, n: int):
    """Complex FFT over the last axis (length n) via four-step matmuls.

    Each DFT stage is expressed as ONE flat (M, K) @ (K, N) GEMM (complex ->
    4 real GEMMs) rather than a huge batch of tiny matmuls — plain GEMMs are
    what the TPU compiler handles best.
    """
    n1, n2, d1r, d1i, twr, twi, d2r, d2i = (
        jnp.asarray(c) if i >= 2 else c
        for i, c in enumerate(_cfft_consts(n))
    )
    batch = re.shape[:-1]
    # Stage 1: A[.., k1, n2] = sum_n1 D1[k1, n1] x[.., n1, n2].
    # Flatten to ((batch * n2), n1) @ (n1, k1).
    xr = re.reshape(*batch, n1, n2)
    xi = im.reshape(*batch, n1, n2)
    xr_t = jnp.swapaxes(xr, -1, -2).reshape(-1, n1)
    xi_t = jnp.swapaxes(xi, -1, -2).reshape(-1, n1)
    d1r_t, d1i_t = d1r.T, d1i.T  # (n1, k1)

    def gemm(a, b):
        return jnp.matmul(a, b, precision=_PRECISION)

    ar = gemm(xr_t, d1r_t) - gemm(xi_t, d1i_t)  # ((b*n2), k1)
    ai = gemm(xr_t, d1i_t) + gemm(xi_t, d1r_t)
    ar = jnp.swapaxes(ar.reshape(*batch, n2, n1), -1, -2)  # (.., k1, n2)
    ai = jnp.swapaxes(ai.reshape(*batch, n2, n1), -1, -2)
    # Twiddle.
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # Stage 2: C[.., k1, k2] = sum_n2 B[.., k1, n2] D2[n2, k2] — already a
    # flat GEMM over the last axis.
    br_f = br.reshape(-1, n2)
    bi_f = bi.reshape(-1, n2)
    cr = gemm(br_f, d2r) - gemm(bi_f, d2i)
    ci = gemm(br_f, d2i) + gemm(bi_f, d2r)
    cr = cr.reshape(*batch, n1, n2)
    ci = ci.reshape(*batch, n1, n2)
    # Output index is k = n1 * k2 + k1 -> transpose (k1, k2) -> (k2, k1).
    cr = jnp.swapaxes(cr, -1, -2).reshape(*batch, n)
    ci = jnp.swapaxes(ci, -1, -2).reshape(*batch, n)
    return cr, ci


@functools.lru_cache(maxsize=None)
def _pack_consts(n: int):
    """Unpack twiddles W_N^k for k = 0..N/2 (rfft bin count)."""
    half = n // 2
    k = np.arange(half + 1)
    w = np.exp(-2j * np.pi * k / n)
    # Host numpy only (see _cfft_consts note on tracer leaks).
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def supported(n: int) -> bool:
    return n % 2 == 0 and _cfft_consts(n // 2) is not None


def rfft(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Real FFT over the last axis: (..., n) real -> (..., n//2+1) complex64."""
    if x.shape[-1] != n:
        raise ValueError(f"rfft: expected last dim {n}, got {x.shape[-1]}")
    if not supported(n):
        return jnp.fft.rfft(x, n=n, axis=-1)
    half = n // 2
    x = x.astype(jnp.float32)
    ze = x[..., 0::2]  # even samples -> real part
    zo = x[..., 1::2]  # odd samples  -> imag part
    zr, zi = _cfft(ze, zo, half)
    # Unpack: X[k] = E[k] + W^k O[k], E = (Z[k]+conj(Z[-k]))/2,
    # O = -i (Z[k]-conj(Z[-k]))/2, with Z[-0] = Z[0] wraparound.
    zr_full = jnp.concatenate([zr, zr[..., :1]], axis=-1)  # k = 0..half
    zi_full = jnp.concatenate([zi, zi[..., :1]], axis=-1)
    zr_rev = jnp.flip(zr_full, axis=-1)  # Z[half - k]
    zi_rev = jnp.flip(zi_full, axis=-1)
    er = 0.5 * (zr_full + zr_rev)
    ei = 0.5 * (zi_full - zi_rev)
    # O[k] = -i (Z[k] - conj(Z[-k]))/2 = [ (zi_full + zi_rev)/2, -(zr_full - zr_rev)/2 ]
    orr = 0.5 * (zi_full + zi_rev)
    oi = -0.5 * (zr_full - zr_rev)
    wr_np, wi_np = _pack_consts(n)
    wr, wi = jnp.asarray(wr_np), jnp.asarray(wi_np)
    xr = er + wr * orr - wi * oi
    xi = ei + wr * oi + wi * orr
    return jax.lax.complex(xr, xi)


def irfft(spec: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse real FFT over the last axis: (..., n//2+1) -> (..., n) real."""
    if spec.shape[-1] != n // 2 + 1:
        raise ValueError(
            f"irfft: expected last dim {n // 2 + 1}, got {spec.shape[-1]}"
        )
    if not supported(n):
        return jnp.fft.irfft(spec, n=n, axis=-1)
    half = n // 2
    xr = jnp.real(spec).astype(jnp.float32)
    xi = jnp.imag(spec).astype(jnp.float32)
    xr_rev = jnp.flip(xr, axis=-1)  # X[half + 1 - ... ] -> X[N' - k] for k idx
    xi_rev = jnp.flip(xi, axis=-1)
    # E[k] = (X[k] + conj(X[N'-k]))/2 ; W^k O[k] = (X[k] - conj(X[N'-k]))/2.
    er = 0.5 * (xr + xr_rev)
    ei = 0.5 * (xi - xi_rev)
    pr = 0.5 * (xr - xr_rev)
    pi = 0.5 * (xi + xi_rev)
    wr_np, wi_np = _pack_consts(n)  # W^k ; O[k] = conj(W^k) * P[k]
    wr, wi = jnp.asarray(wr_np), jnp.asarray(wi_np)
    orr = wr * pr + wi * pi
    oi = wr * pi - wi * pr
    # Z[k] = E[k] + i O[k], k = 0..half-1 (drop the wraparound bin).
    zr = (er - oi)[..., :half]
    zi = (ei + orr)[..., :half]
    # ICFFT(Z) = conj(CFFT(conj(Z))) / half.
    cr, ci = _cfft(zr, -zi, half)
    zr_t = cr / half
    zi_t = -ci / half
    # x[2t] = Re, x[2t+1] = Im -> interleave.
    out = jnp.stack([zr_t, zi_t], axis=-1)
    return out.reshape(*spec.shape[:-1], n)[..., :n]


# --------------------------------------------------------------------------- #
# Direct rDFT as a single real GEMM.
#
# For n_fft=2048 the Cooley-Tukey split (32, 32) pads its GEMMs from K=N=32 up
# to the 128x128 MXU tile, wasting 16x — which exactly cancels the factored
# algorithm's FLOP savings.  A DIRECT real DFT, x @ [cos | -sin] with shape
# (n, n+2), runs the SAME padded-MXU cost as the factored form with zero
# packing/transpose traffic, so it is the better matmul formulation at STFT
# sizes.  Precision is selectable: HIGHEST ~ f32-exact (6 bf16 passes), HIGH
# (3 passes, ~21-bit mantissa) is the Griffin-Lim sweet spot, DEFAULT (1 pass)
# for throughput experiments.
# --------------------------------------------------------------------------- #


def _rdft_matrices(n: int):
    """DFT matrices built INSIDE the trace from iota (no giant HLO literals).

    A 16.8 MB host-constant matrix baked into the program sent the remote
    TPU compiler into minutes-long constant processing; computing cos/sin of
    `2*pi*((t*k) mod n)/n` at runtime costs ~8M transcendentals once per call
    (XLA hoists it out of loops) and keeps the HLO tiny.  The integer `mod n`
    keeps the angle in [0, 2*pi) so f32 cos/sin stays accurate at any t*k.

    Returns (fwd (n, 2*half), inv (2*half, n)).
    """
    half = n // 2 + 1
    t = jax.lax.broadcasted_iota(jnp.int32, (n, half), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n, half), 1)
    phase = ((t * k) % n).astype(jnp.float32) * np.float32(2.0 * np.pi / n)
    cos = jnp.cos(phase)  # (n, half)
    sin = jnp.sin(phase)
    fwd = jnp.concatenate([cos, -sin], axis=1)  # (n, 2*half)
    # Inverse: x[t] = (1/n) * sum_k w_k (re_k cos + im_k (-sin)), w = 2
    # except DC and Nyquist (even n).
    w = np.full(half, 2.0, np.float32)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    w_col = jnp.asarray(w)[:, None] * np.float32(1.0 / n)
    inv = jnp.concatenate([w_col * cos.T, w_col * (-sin.T)], axis=0)
    return fwd, inv


def rdft(
    x: jnp.ndarray, n: int, precision=jax.lax.Precision.HIGH,
    fwd: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Real DFT via one GEMM: (..., n) -> complex64 (..., n//2+1)."""
    if fwd is None:
        fwd, _ = _rdft_matrices(n)
    half = n // 2 + 1
    out = jnp.matmul(
        x.astype(jnp.float32), fwd,
        precision=precision, preferred_element_type=jnp.float32,
    )
    return jax.lax.complex(out[..., :half], out[..., half:])


def irdft(
    spec: jnp.ndarray, n: int, precision=jax.lax.Precision.HIGH,
    inv: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse real DFT via one GEMM: complex (..., n//2+1) -> (..., n)."""
    if inv is None:
        _, inv = _rdft_matrices(n)
    parts = jnp.concatenate(
        [jnp.real(spec), jnp.imag(spec)], axis=-1
    ).astype(jnp.float32)
    return jnp.matmul(
        parts, inv,
        precision=precision, preferred_element_type=jnp.float32,
    )


def _rdft_matrices_split(n: int):
    """Traced split matrices: (cos (n,h), neg_sin (n,h), inv_re (h,n), inv_im (h,n))."""
    half = n // 2 + 1
    t = jax.lax.broadcasted_iota(jnp.int32, (n, half), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n, half), 1)
    phase = ((t * k) % n).astype(jnp.float32) * np.float32(2.0 * np.pi / n)
    cos = jnp.cos(phase)
    nsin = -jnp.sin(phase)
    w = np.full(half, 2.0, np.float32)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    w_col = jnp.asarray(w)[:, None] * np.float32(1.0 / n)
    return cos, nsin, w_col * cos.T, w_col * nsin.T


def rdft_ri(x, n, precision=jax.lax.Precision.DEFAULT, consts=None):
    """Real DFT returning (re, im) as separate arrays — no complex dtype,
    no concat/slice materializations (two direct GEMMs)."""
    cos, nsin, _, _ = consts if consts is not None else _rdft_matrices_split(n)
    mm = lambda a, b: jnp.matmul(  # noqa: E731
        a, b.astype(a.dtype), precision=precision,
        preferred_element_type=jnp.float32,
    )
    return mm(x, cos), mm(x, nsin)


def irdft_ri(re, im, n, precision=jax.lax.Precision.DEFAULT, consts=None):
    """Inverse real DFT from (re, im) parts — two direct GEMMs."""
    _, _, inv_re, inv_im = consts if consts is not None else _rdft_matrices_split(n)
    mm = lambda a, b: jnp.matmul(  # noqa: E731
        a, b.astype(a.dtype), precision=precision,
        preferred_element_type=jnp.float32,
    )
    return mm(re, inv_re) + mm(im, inv_im)


def _rdft_matrices_windowed(n: int, window: np.ndarray):
    """Window-folded, support-reduced DFT matrices for analysis/synthesis.

    An STFT frame is multiplied by a window that is zero outside its
    `win_length` center taps, so the DFT contraction only needs those rows —
    for the default hparams (win 1102 inside n_fft 2048) that cuts both GEMMs
    ~46% — and the window scaling folds into the matrices, eliminating two
    full-size elementwise passes per Griffin-Lim iteration.

    Returns (lo, w_len, cos_w (w_len, h), nsin_w (w_len, h),
    inv_re_w (h, w_len), inv_im_w (h, w_len)) where [lo, lo+w_len) is the
    window support.  Matrices are built inside the trace from iota (small
    window-value literal only).
    """
    window = np.asarray(window, dtype=np.float32)
    nz = np.nonzero(window)[0]
    lo, hi = int(nz[0]), int(nz[-1]) + 1
    w_len = hi - lo
    half = n // 2 + 1
    t = lo + jax.lax.broadcasted_iota(jnp.int32, (w_len, half), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (w_len, half), 1)
    phase = ((t * k) % n).astype(jnp.float32) * np.float32(2.0 * np.pi / n)
    cos = jnp.cos(phase)
    nsin = -jnp.sin(phase)
    wvals = jnp.asarray(window[lo:hi])[:, None]  # (w_len, 1) small literal
    cos_w = cos * wvals
    nsin_w = nsin * wvals
    w = np.full(half, 2.0, np.float32)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    w_col = jnp.asarray(w)[:, None] * np.float32(1.0 / n)
    inv_re_w = (w_col * cos.T) * wvals.T
    inv_im_w = (w_col * nsin.T) * wvals.T
    return lo, w_len, cos_w, nsin_w, inv_re_w, inv_im_w
