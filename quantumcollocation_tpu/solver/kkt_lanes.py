"""Lanes-layout Pallas kernels for the block-tridiagonal KKT solve.

Why: the XLA path (kkt.py) runs batched (B, d, d) linear algebra with d ~ 16.
On TPU these tiny ops cannot tile the MXU/VPU — measured throughput scales
LINEARLY in batch (dispatch-bound, chip ~idle).  The fix is the
batch-across-lanes layout: every matrix ENTRY is a 128-lane vector of batch
instances, so a Cholesky column update or a matmul inner product is a full
VPU op on 128 instances at once.

Two implementations share the same lanes linear algebra:
  - the FUSED path (default): ONE pallas_call per elimination sweep — the
    grid is (batch tiles, knots), the Riccati carry lives in VMEM scratch,
    and the per-knot blocks are DMA-pipelined automatically.  Replaces
    ~2(T-1) kernel launches per solve with 2.
  - the per-step scan path (kept for cross-validation): a lax.scan whose
    body is one Pallas kernel per knot.

The fused path supports:
  - multi-column right-hand sides (rz (B, T, d, r), rnu (B, T-1, s, r)) —
    the L-BFGS SMW correction solves [rz | U] in ONE sweep;
  - `want_factors=True` — additionally returns LanesFactors so a rhs-only
    re-solve (`resolve_kkt_lanes`, Ipopt's second-order correction) costs
    two rhs sweeps with NO refactorization.

All matrix-index loops are static Python unrolls (d, s <= ~40), producing a
few hundred vector ops per kernel — friendly to Mosaic.  Arrays are
transposed to (..., lanes) once per solve.

Numerics match kkt.py exactly (same elimination); validated in interpret
mode against the XLA path and dense solves.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "solve_kkt_lanes",
    "solve_kkt_lanes_scan",
    "resolve_kkt_lanes",
    "LanesFactors",
    "to_lanes_layout",
]

_L = 128  # lane tile


def _compiler_params(*dims):
    """Raise the scoped-VMEM allowance for large stage dimensions: the
    default 16 MB cap rejects d~47 per-knot block sets (measured 21-32 MB
    with double-buffered DMA), while the chip's physical VMEM is larger.
    None (defaults) for small dims — identical behavior to round 3."""
    if max(dims) < 24:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
    )



def to_lanes_layout(x):
    """Pad the leading batch axis to a multiple of 128 and move it LAST
    (the lanes layout used by LanesFactors and the fused kernels)."""
    Bt = x.shape[0]
    Bp = ((Bt + _L - 1) // _L) * _L
    if Bp != Bt:
        x = jnp.pad(x, [(0, Bp - Bt)] + [(0, 0)] * (x.ndim - 1))
    return jnp.moveaxis(x, 0, -1)


class LanesFactors(NamedTuple):
    """Stage-wise factorization in lanes layout (batch padded to 128 in the
    LAST axis).  Carries the constraint blocks so `resolve_kkt_lanes` needs
    only the new rhs — the cheap path for second-order corrections."""

    LP: Any  # (T-1, d, d, Bp) Cholesky of the eliminated primal blocks
    LS: Any  # (T-1, s, s, Bp) Cholesky of the stage Schur complements
    XA: Any  # (T-1, d, s, Bp) P^{-1} A^T
    G: Any  # (T-1, s, d, Bp)  A P^{-1} C - B
    LPf: Any  # (d, d, Bp)     Cholesky of the terminal block
    Cl: Any  # (T-1, d, d, Bp)
    Al: Any  # (T-1, s, d, Bp)
    Bl: Any  # (T-1, s, d, Bp)


# --------------------------------------------------------------------------- #
# lanes linear algebra (all arrays (..., L))
#
# Two register families:
#  - UNROLLED (suffix _u): every scalar entry is its own (L,)-vector op.
#    Minimal FLOPs, but the traced-op count is O(n^2)-O(n^3) per call, which
#    makes trace + Mosaic compile time cubic in the stage dimension
#    (measured 10/40/160 s at d=15/28/47) — the round-3 lanes_max_dim=24
#    ceiling.
#  - VECTORIZED (suffix _v): inner loops become full-width broadcast
#    multiply + axis-0 reductions over (n, r, L) buffers with zero padding
#    ahead of the frontier, so each row/column costs O(1) traced ops —
#    O(n) ops per primitive and compile time linear-ish in n.  Runtime
#    FLOPs are up to 2x (full-width triangular work), traded for far fewer,
#    wider VPU instructions.
#
# `_use_vec(n)` picks the family; the public names dispatch on it.
# --------------------------------------------------------------------------- #

# Real-TPU A/B (artifacts/tpu_lanes_vec_r04.json, B=512/T=51/d=15):
# unrolled 0.1-0.3 ms/solve vs vectorized 25 ms — the frontier-buffer
# full-width work is a ~100x RUNTIME loss at small d, so the vectorized
# family is strictly a large-d play: it exists because the unrolled
# family cannot compile at d=47 inside any reasonable budget (>10 min
# Mosaic), while vectorized compiles in 41 s and solves B=128 in 28 ms.
_VEC_MIN_DIM = 25  # default: d <= 24 (SolverOptions.lanes_max_dim default)

# trace-time override set by the public entry points' `vec_min_dim` kwarg
# (threaded from SolverOptions.lanes_max_dim by the solver, so family
# selection follows the CONFIGURED unrolled/vectorized cutover instead of
# this module's hard-coded default — ADVICE r4)
_vec_min_dim_active: list = [None]


@contextlib.contextmanager
def _vec_policy(min_dim):
    prev = _vec_min_dim_active[0]
    _vec_min_dim_active[0] = min_dim
    try:
        yield
    finally:
        _vec_min_dim_active[0] = prev


def _use_vec(*dims):
    import os

    ov = os.environ.get("QCT_LANES_VEC")
    if ov is not None:
        return ov not in ("0", "false")
    thr = (
        _vec_min_dim_active[0]
        if _vec_min_dim_active[0] is not None
        else _VEC_MIN_DIM
    )
    return max(dims) >= thr


def _row_set(buf, i, row):
    """buf with buf[i] <- row, as a masked select (Mosaic lowers no scatter;
    .at[...].set on values emits one)."""
    n = buf.shape[0]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * (buf.ndim - 1), 0)
        == i
    )
    return jnp.where(sel, row[None], buf)


def _chol_v(M, n):
    """Vectorized lanes Cholesky: O(n) traced ops per column (frontier with
    a zero-padded factor buffer held COLUMN-major so updates are
    leading-axis masked selects)."""
    dtype = M.dtype
    Lc = jnp.zeros_like(M)  # Lc[j] = column j of L (rows along axis 1)
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for j in range(n):
        # s_i = sum_k L[i, k] L[j, k] = sum_k Lc[k, i] Lc[k, j];
        # columns k >= j are still zero
        s = jnp.sum(Lc * Lc[:, j][:, None, :], axis=0)  # (n, L)
        c = M[:, j] - s
        piv = jnp.sqrt(c[j])
        col = c / piv[None]
        col = jnp.where(rows_idx >= j, col, jnp.zeros((), dtype))
        Lc = _row_set(Lc, j, col)
    return jnp.swapaxes(Lc, 0, 1)


def _fwd_sub_v(Lm, Bm, n):
    """Solve Lm Y = Bm, vectorized: O(1) traced ops per row."""
    Ybuf = jnp.zeros_like(Bm)
    for i in range(n):
        s = jnp.sum(Lm[i][:, None, :] * Ybuf, axis=0)  # (r, L)
        Ybuf = _row_set(Ybuf, i, (Bm[i] - s) / Lm[i, i][None])
    return Ybuf


def _bwd_sub_v(Lm, Bm, n):
    """Solve Lm^T Y = Bm, vectorized: O(1) traced ops per row."""
    Ybuf = jnp.zeros_like(Bm)
    for i in reversed(range(n)):
        # sum_k L[k, i] Y[k]: rows <= i of Ybuf are still zero, and
        # L[k, i] = 0 for k < i (lower-triangular), so full width is exact
        s = jnp.sum(Lm[:, i][:, None, :] * Ybuf, axis=0)
        Ybuf = _row_set(Ybuf, i, (Bm[i] - s) / Lm[i, i][None])
    return Ybuf


def _mm_v(Am, Bm):
    """(m, k, L) @ (k, n, L) lanes matmul, one broadcast-reduce per row."""
    rows = [
        jnp.sum(Am[i][:, None, :] * Bm, axis=0) for i in range(Am.shape[0])
    ]
    return jnp.stack(rows, axis=0)


def _chol_u(M, n):
    """Cholesky of (n, n, L) SPD matrices; returns lower-triangular (n, n, L).

    Scatter-free: columns are computed as vectors and the factor is assembled
    with stack/concatenate only (Mosaic has no scatter lowering).
    """
    cols = []
    for j in range(n):
        # column j: c = M[j:, j] - sum_{k<j} Lcols[k][j:] * Lcols[k][j]
        c = M[j:, j]
        for k in range(j):
            c = c - cols[k][j - k:] * cols[k][j - k][None]
        piv = jnp.sqrt(c[0])
        if c.shape[0] > 1:
            col = jnp.concatenate([piv[None], c[1:] / piv[None]], axis=0)
        else:  # last column: avoid 0-sized vectors (Mosaic rejects them)
            col = piv[None]
        cols.append(col)  # (n - j, L)
    # assemble rows: L[i, j] = cols[j][i - j] for j <= i else 0
    zero = jnp.zeros_like(M[0, 0])
    rows = []
    for i in range(n):
        entries = [
            cols[j][i - j] if j <= i else zero for j in range(n)
        ]
        rows.append(jnp.stack(entries, axis=0))  # (n, L)
    return jnp.stack(rows, axis=0)


def _fwd_sub_u(Lm, Bm, n):
    """Solve Lm Y = Bm with Lm (n,n,L) lower, Bm (n, r, L). Returns (n, r, L)."""
    rows = []
    for i in range(n):
        acc = Bm[i]
        for k in range(i):
            acc = acc - Lm[i, k][None] * rows[k]
        rows.append(acc / Lm[i, i][None])
    return jnp.stack(rows)


def _bwd_sub_u(Lm, Bm, n):
    """Solve Lm^T Y = Bm with Lm (n,n,L) lower, Bm (n, r, L)."""
    rows = [None] * n
    for i in reversed(range(n)):
        acc = Bm[i]
        for k in range(i + 1, n):
            acc = acc - Lm[k, i][None] * rows[k]
        rows[i] = acc / Lm[i, i][None]
    return jnp.stack(rows)


def _mm_u(Am, Bm):
    """(m, k, L) @ (k, n, L) -> (m, n, L) lanes matmul.

    Static unroll into VPU multiply-adds: Mosaic's tpu.matmul requires batch
    dims at position 0, but the lanes layout keeps the batch LAST (each
    matrix entry is a 128-lane vector), so a dot_general here is
    uncompilable on real TPUs — express the contraction elementwise instead.
    """
    k = Am.shape[1]
    rows = []
    for i in range(Am.shape[0]):
        acc = Am[i, 0][None] * Bm[0]
        for kk in range(1, k):
            acc = acc + Am[i, kk][None] * Bm[kk]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


# ---- family dispatchers --------------------------------------------------- #


def _chol(M, n):
    return _chol_v(M, n) if _use_vec(n) else _chol_u(M, n)


def _fwd_sub(Lm, Bm, n):
    return _fwd_sub_v(Lm, Bm, n) if _use_vec(n) else _fwd_sub_u(Lm, Bm, n)


def _bwd_sub(Lm, Bm, n):
    return _bwd_sub_v(Lm, Bm, n) if _use_vec(n) else _bwd_sub_u(Lm, Bm, n)


def _chol_solve(Lm, Bm, n):
    return _bwd_sub(Lm, _fwd_sub(Lm, Bm, n), n)


def _mm(Am, Bm):
    k = Am.shape[1]
    return _mm_v(Am, Bm) if _use_vec(Am.shape[0], k) else _mm_u(Am, Bm)


def _mt(Am):
    return jnp.swapaxes(Am, 0, 1)


# --------------------------------------------------------------------------- #
# per-step kernels (scan variant)
# --------------------------------------------------------------------------- #


def _fwd_step_kernel(
    P_ref, q_ref, Hn_ref, C_ref, A_ref, B_ref, rzn_ref, rnu_ref,
    Pn_ref, qn_ref, LP_ref, LS_ref, XA_ref, qsave_ref,
    *, d: int, s: int, delta_c: float,
):
    P = P_ref[...]
    q = q_ref[...]  # (d, 1, L)
    C = C_ref[...]
    A = A_ref[...]
    Bm = B_ref[...]

    LP = _chol(P, d)
    At = _mt(A)  # (d, s, L)
    XA = _chol_solve(LP, At, d)  # (d, s, L)
    XC = _chol_solve(LP, C, d)  # (d, d, L)
    x = _chol_solve(LP, q, d)  # (d, 1, L)

    S = _mm(A, XA) + delta_c * jnp.eye(s, dtype=P.dtype)[:, :, None]
    LS = _chol(S, s)
    G = _mm(A, XC) - Bm  # (s, d, L)
    y = _chol_solve(LS, _mm(A, x) - rnu_ref[...], s)  # (s, 1, L)

    SG = _chol_solve(LS, G, s)  # (s, d, L)
    Pn = Hn_ref[...] - _mm(_mt(C), XC) + _mm(_mt(G), SG)
    Pn = 0.5 * (Pn + _mt(Pn))
    qn = rzn_ref[...] - _mm(_mt(C), x) + _mm(_mt(G), y)

    Pn_ref[...] = Pn
    qn_ref[...] = qn
    LP_ref[...] = LP
    LS_ref[...] = LS
    XA_ref[...] = XA
    qsave_ref[...] = q


def _bwd_step_kernel(
    dz_ref, LP_ref, LS_ref, XA_ref, q_ref, C_ref, A_ref, B_ref, rnu_ref,
    dz_out_ref, nu_out_ref, *, d: int, s: int,
):
    dz_next = dz_ref[...]  # (d, 1, L)
    LP = LP_ref[...]
    LS = LS_ref[...]
    XA = XA_ref[...]
    u = q_ref[...] - _mm(C_ref[...], dz_next)
    v = rnu_ref[...] - _mm(B_ref[...], dz_next)
    x = _chol_solve(LP, u, d)
    y = _chol_solve(LS, _mm(A_ref[...], x) - v, s)
    dz_t = x - _mm(XA, y)
    dz_out_ref[...] = dz_t
    nu_out_ref[...] = y


def _spec(*shape):
    return pl.BlockSpec(shape, lambda i: (0,) * (len(shape) - 1) + (i,))


def _make_fwd_step(d, s, delta_c, interpret):
    kernel = functools.partial(
        _fwd_step_kernel, d=d, s=s, delta_c=delta_c
    )

    def fwd_step(P, q, Hn, C, A, B, rzn, rnu):
        Lb = P.shape[-1]
        grid = (Lb // _L,)
        out_shape = [
            jax.ShapeDtypeStruct((d, d, Lb), P.dtype),  # P_next
            jax.ShapeDtypeStruct((d, 1, Lb), P.dtype),  # q_next
            jax.ShapeDtypeStruct((d, d, Lb), P.dtype),  # LP
            jax.ShapeDtypeStruct((s, s, Lb), P.dtype),  # LS
            jax.ShapeDtypeStruct((d, s, Lb), P.dtype),  # XA
            jax.ShapeDtypeStruct((d, 1, Lb), P.dtype),  # qsave
        ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _spec(d, d, _L), _spec(d, 1, _L), _spec(d, d, _L),
                _spec(d, d, _L), _spec(s, d, _L), _spec(s, d, _L),
                _spec(d, 1, _L), _spec(s, 1, _L),
            ],
            out_specs=[
                _spec(d, d, _L), _spec(d, 1, _L), _spec(d, d, _L),
                _spec(s, s, _L), _spec(d, s, _L), _spec(d, 1, _L),
            ],
            out_shape=out_shape,
            compiler_params=_compiler_params(d, s),
            interpret=interpret,
        )(P, q, Hn, C, A, B, rzn, rnu)

    return fwd_step


def _make_bwd_step(d, s, interpret):
    kernel = functools.partial(_bwd_step_kernel, d=d, s=s)

    def bwd_step(dz_next, LP, LS, XA, q, C, A, B, rnu):
        Lb = dz_next.shape[-1]
        grid = (Lb // _L,)
        out_shape = [
            jax.ShapeDtypeStruct((d, 1, Lb), dz_next.dtype),
            jax.ShapeDtypeStruct((s, 1, Lb), dz_next.dtype),
        ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _spec(d, 1, _L), _spec(d, d, _L), _spec(s, s, _L),
                _spec(d, s, _L), _spec(d, 1, _L), _spec(d, d, _L),
                _spec(s, d, _L), _spec(s, d, _L), _spec(s, 1, _L),
            ],
            out_specs=[_spec(d, 1, _L), _spec(s, 1, _L)],
            out_shape=out_shape,
            compiler_params=_compiler_params(d, s),
            interpret=interpret,
        )(dz_next, LP, LS, XA, q, C, A, B, rnu)

    return bwd_step


# --------------------------------------------------------------------------- #
# layout helpers
# --------------------------------------------------------------------------- #


def _mats_to_lanes(H, C, A, B):
    """Matrix blocks batch-first -> lanes layout, batch padded to 128."""
    Bt, T, d, _ = H.shape
    Bp = ((Bt + _L - 1) // _L) * _L

    def pad(x):
        if Bp == Bt:
            return x
        pad_width = [(0, Bp - Bt)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    # padding lanes get identity H blocks so Cholesky stays finite
    Hp = pad(H)
    if Bp != Bt:
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=H.dtype), (Bp - Bt, T, d, d)
        )
        Hp = Hp.at[Bt:].set(eye)
    Cp, Ap, Bjp = pad(C), pad(A), pad(B)

    def lanes(x):
        return jnp.moveaxis(x, 0, -1)

    return lanes(Hp), lanes(Cp), lanes(Ap), lanes(Bjp), Bp


def _rhs_to_lanes(x, Bp):
    """rhs batch-first (Bt, T, rows[, r]) -> lanes (T, rows, r, Bp)."""
    if x.ndim == 3:
        x = x[..., None]
    Bt = x.shape[0]
    if Bp != Bt:
        x = jnp.pad(x, [(0, Bp - Bt)] + [(0, 0)] * (x.ndim - 1))
    return jnp.moveaxis(x, 0, -1)


def _to_lanes(H, C, A, B, rz, rnu):
    """batch-first -> lanes layout (T, rows, cols, Bp), batch padded to 128."""
    Hl, Cl, Al, Bl, Bp = _mats_to_lanes(H, C, A, B)
    rzl = _rhs_to_lanes(rz, Bp)  # (T, d, r, Bp)
    rnul = _rhs_to_lanes(rnu, Bp)  # (T-1, s, r, Bp)
    return Hl, Cl, Al, Bl, rzl, rnul, H.shape[0]


# --------------------------------------------------------------------------- #
# fused full-sweep kernels (one pallas_call per elimination direction)
# --------------------------------------------------------------------------- #


def _fwd_sweep_kernel(
    H_ref, C_ref, A_ref, B_ref, rz_ref, rnu_ref, *refs,
    d: int, s: int, delta_c: float, Tm1: int, save_g: bool,
):
    """One forward-elimination step per grid iteration; the Riccati carry is
    held as a DELTA in VMEM scratch so step t consumes only knot-t blocks:
        P_t = H_t + Delta_t,   Delta_0 = 0.
    rhs blocks carry r columns ((d, r, L)); with save_g the per-knot Schur
    cross block G is also written out (the rhs-only re-solve needs it).
    """
    if save_g:
        (LP_ref, LS_ref, XA_ref, qs_ref, Dfin_ref, qdfin_ref, G_ref,
         Pd, qd) = refs
    else:
        LP_ref, LS_ref, XA_ref, qs_ref, Dfin_ref, qdfin_ref, Pd, qd = refs
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        Pd[...] = jnp.zeros_like(Pd)
        qd[...] = jnp.zeros_like(qd)

    P = H_ref[0] + Pd[...]
    q = rz_ref[0] + qd[...]
    C = C_ref[0]
    A = A_ref[0]
    Bm = B_ref[0]

    LP = _chol(P, d)
    XA = _chol_solve(LP, _mt(A), d)  # (d, s, L)
    XC = _chol_solve(LP, C, d)  # (d, d, L)
    x = _chol_solve(LP, q, d)  # (d, r, L)

    S = _mm(A, XA) + delta_c * jnp.eye(s, dtype=P.dtype)[:, :, None]
    LS = _chol(S, s)
    G = _mm(A, XC) - Bm  # (s, d, L)
    y = _chol_solve(LS, _mm(A, x) - rnu_ref[0], s)
    SG = _chol_solve(LS, G, s)

    Dn = _mm(_mt(G), SG) - _mm(_mt(C), XC)
    Pd[...] = 0.5 * (Dn + _mt(Dn))
    qd[...] = _mm(_mt(G), y) - _mm(_mt(C), x)

    LP_ref[0] = LP
    LS_ref[0] = LS
    XA_ref[0] = XA
    qs_ref[0] = q
    if save_g:
        G_ref[0] = G

    @pl.when(t == Tm1 - 1)
    def _():
        Dfin_ref[...] = Pd[...]
        qdfin_ref[...] = qd[...]


def _rhs_fwd_sweep_kernel(
    LP_ref, LS_ref, G_ref, C_ref, A_ref, rz_ref, rnu_ref,
    qs_ref, qdfin_ref,
    qd,
    *, d: int, s: int, Tm1: int,
):
    """Forward rhs elimination against an EXISTING factorization — the
    triangular-solves-only half of the second-order-correction re-solve."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        qd[...] = jnp.zeros_like(qd)

    q = rz_ref[0] + qd[...]
    x = _chol_solve(LP_ref[0], q, d)  # (d, r, L)
    y = _chol_solve(LS_ref[0], _mm(A_ref[0], x) - rnu_ref[0], s)
    qd[...] = _mm(_mt(G_ref[0]), y) - _mm(_mt(C_ref[0]), x)
    qs_ref[0] = q

    @pl.when(t == Tm1 - 1)
    def _():
        qdfin_ref[...] = qd[...]


def _bwd_sweep_kernel(
    LP_ref, LS_ref, XA_ref, qs_ref, C_ref, A_ref, B_ref, rnu_ref, dzl_ref,
    dz_ref, nu_ref,
    dzn,
    *, d: int, s: int,
):
    """One backward-substitution step per grid iteration (time reversed via
    the BlockSpec index maps); dz_{t+1} carried in VMEM scratch."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dzn[...] = dzl_ref[...]

    dz_next = dzn[...]
    u = qs_ref[0] - _mm(C_ref[0], dz_next)
    v = rnu_ref[0] - _mm(B_ref[0], dz_next)
    x = _chol_solve(LP_ref[0], u, d)
    y = _chol_solve(LS_ref[0], _mm(A_ref[0], x) - v, s)
    dz_t = x - _mm(XA_ref[0], y)
    dzn[...] = dz_t
    dz_ref[0] = dz_t
    nu_ref[0] = y


def _spec_t(*rowcol):
    # per-knot block, forward order
    return pl.BlockSpec(
        (1, *rowcol, _L), lambda b, t: (t, *(0,) * len(rowcol), b)
    )


def _spec_fix(*rowcol):
    # knot-independent block (revisited across t)
    return pl.BlockSpec(
        (*rowcol, _L), lambda b, t: (*(0,) * len(rowcol), b)
    )


def _rspec_t(Tm1, *rowcol):
    # per-knot block, REVERSED order (grid step t touches knot T-2-t)
    return pl.BlockSpec(
        (1, *rowcol, _L),
        lambda b, t: (Tm1 - 1 - t, *(0,) * len(rowcol), b),
    )


def _bwd_sweep(LPs, LSs, XAs, qs, Cl, Al, Bl, rnul, dz_last, *, interpret):
    """Backward-substitution sweep shared by the solve and re-solve paths."""
    Tm1, d, _, Bp = LPs.shape
    s = LSs.shape[1]
    r = qs.shape[2]
    nb = Bp // _L
    dtype = LPs.dtype
    bwd_kernel = functools.partial(_bwd_sweep_kernel, d=d, s=s)
    return pl.pallas_call(
        bwd_kernel,
        grid=(nb, Tm1),
        in_specs=[
            _rspec_t(Tm1, d, d),  # LP
            _rspec_t(Tm1, s, s),  # LS
            _rspec_t(Tm1, d, s),  # XA
            _rspec_t(Tm1, d, r),  # q saved
            _rspec_t(Tm1, d, d),  # C
            _rspec_t(Tm1, s, d),  # A
            _rspec_t(Tm1, s, d),  # B
            _rspec_t(Tm1, s, r),  # rnu
            _spec_fix(d, r),  # dz_last
        ],
        out_specs=[_rspec_t(Tm1, d, r), _rspec_t(Tm1, s, r)],
        out_shape=[
            jax.ShapeDtypeStruct((Tm1, d, r, Bp), dtype),
            jax.ShapeDtypeStruct((Tm1, s, r, Bp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((d, r, _L), dtype)],
        compiler_params=_compiler_params(d, s),
        interpret=interpret,
    )(LPs, LSs, XAs, qs, Cl, Al, Bl, rnul, dz_last)


def _from_lanes_solution(dz_rest, dz_last, nus, Bt, squeeze):
    dz_l = jnp.concatenate([dz_rest, dz_last[None]], axis=0)  # (T, d, r, Bp)
    dz = jnp.moveaxis(dz_l, -1, 0)[:Bt]  # (Bt, T, d, r)
    nu = jnp.moveaxis(nus, -1, 0)[:Bt]  # (Bt, T-1, s, r)
    if squeeze:
        dz = dz[..., 0]
        nu = nu[..., 0]
    red = tuple(range(1, dz.ndim))
    ok = jnp.isfinite(dz).all(axis=red) & jnp.isfinite(nu).all(
        axis=tuple(range(1, nu.ndim))
    )
    return dz, nu, ok


@functools.partial(
    jax.jit,
    static_argnames=("delta_c", "interpret", "want_factors", "vec_min_dim"),
)
def solve_kkt_lanes(
    H, C, A, B, rz, rnu, delta_c: float, *,
    interpret: bool = False, want_factors: bool = False,
    vec_min_dim: int | None = None,
):
    """Batched block-tridiagonal KKT solve in lanes layout (fused sweeps).

    vec_min_dim: stage-dimension threshold at which the vectorized lanes
    family replaces the unrolled one (None -> module default
    _VEC_MIN_DIM=25); the solver threads SolverOptions.lanes_max_dim+1 here
    so family selection matches the configured cutover."""
    with _vec_policy(vec_min_dim):
        return _solve_kkt_lanes_impl(
            H, C, A, B, rz, rnu, delta_c,
            interpret=interpret, want_factors=want_factors,
        )


def _solve_kkt_lanes_impl(
    H, C, A, B, rz, rnu, delta_c: float, *,
    interpret: bool = False, want_factors: bool = False,
):
    """Batched block-tridiagonal KKT solve in lanes layout (fused sweeps).

    Inputs in standard batch-first layout: H (Bt, T, d, d), C (Bt, T-1, d, d),
    A/B (Bt, T-1, s, d), rz (Bt, T, d) or multi-column (Bt, T, d, r),
    rnu (Bt, T-1, s[, r]).  The batch is padded to a multiple of 128
    internally.  Returns (dz, nu, ok) matching solver.kkt.solve_kkt vmapped
    over the batch; with want_factors=True returns (dz, nu, ok, fac) where
    fac is a LanesFactors for `resolve_kkt_lanes` rhs-only re-solves.
    """
    Bt, T, d, _ = H.shape
    s = A.shape[2]
    squeeze = rz.ndim == 3
    Hl, Cl, Al, Bl, Bp = _mats_to_lanes(H, C, A, B)
    rzl = _rhs_to_lanes(rz, Bp)
    rnul = _rhs_to_lanes(rnu, Bp)
    r = rzl.shape[2]
    nb = Bp // _L
    Tm1 = T - 1
    dtype = Hl.dtype

    fwd_kernel = functools.partial(
        _fwd_sweep_kernel, d=d, s=s, delta_c=float(delta_c), Tm1=Tm1,
        save_g=want_factors,
    )
    out_specs = [
        _spec_t(d, d),  # LP
        _spec_t(s, s),  # LS
        _spec_t(d, s),  # XA
        _spec_t(d, r),  # q saved
        _spec_fix(d, d),  # Delta_final
        _spec_fix(d, r),  # qdelta_final
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Tm1, d, d, Bp), dtype),
        jax.ShapeDtypeStruct((Tm1, s, s, Bp), dtype),
        jax.ShapeDtypeStruct((Tm1, d, s, Bp), dtype),
        jax.ShapeDtypeStruct((Tm1, d, r, Bp), dtype),
        jax.ShapeDtypeStruct((d, d, Bp), dtype),
        jax.ShapeDtypeStruct((d, r, Bp), dtype),
    ]
    if want_factors:
        out_specs.append(_spec_t(s, d))  # G
        out_shape.append(jax.ShapeDtypeStruct((Tm1, s, d, Bp), dtype))
    outs = pl.pallas_call(
        fwd_kernel,
        grid=(nb, Tm1),
        in_specs=[
            _spec_t(d, d),  # H_t (t = 0..T-2)
            _spec_t(d, d),  # C_t
            _spec_t(s, d),  # A_t
            _spec_t(s, d),  # B_t
            _spec_t(d, r),  # rz_t
            _spec_t(s, r),  # rnu_t
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((d, d, _L), dtype),
            pltpu.VMEM((d, r, _L), dtype),
        ],
        compiler_params=_compiler_params(d, s),
        interpret=interpret,
    )(Hl[:Tm1], Cl, Al, Bl, rzl[:Tm1], rnul)
    if want_factors:
        LPs, LSs, XAs, qs, Dfin, qdfin, Gs = outs
    else:
        LPs, LSs, XAs, qs, Dfin, qdfin = outs
        Gs = None

    # terminal block: P_fin = H_{T-1} + Delta, solve for dz_{T-1}
    P_fin = Hl[Tm1] + Dfin
    P_fin = 0.5 * (P_fin + _mt(P_fin))
    q_fin = rzl[Tm1] + qdfin
    LPf = _chol(P_fin, d)
    dz_last = _chol_solve(LPf, q_fin, d)

    dz_rest, nus = _bwd_sweep(
        LPs, LSs, XAs, qs, Cl, Al, Bl, rnul, dz_last, interpret=interpret
    )
    dz, nu, ok = _from_lanes_solution(dz_rest, dz_last, nus, Bt, squeeze)
    if want_factors:
        fac = LanesFactors(LPs, LSs, XAs, Gs, LPf, Cl, Al, Bl)
        return dz, nu, ok, fac
    return dz, nu, ok


@functools.partial(
    jax.jit, static_argnames=("interpret", "vec_min_dim")
)
def resolve_kkt_lanes(
    fac: LanesFactors, rz, rnu, *,
    interpret: bool = False, vec_min_dim: int | None = None,
):
    """Rhs-only re-solve (see _resolve_kkt_lanes_impl); vec_min_dim as in
    solve_kkt_lanes (static: part of the jit cache key so different
    cutovers never share a compiled kernel)."""
    with _vec_policy(vec_min_dim):
        return _resolve_kkt_lanes_impl(fac, rz, rnu, interpret=interpret)


def _resolve_kkt_lanes_impl(
    fac: LanesFactors, rz, rnu, *, interpret: bool = False
):
    """Rhs-only re-solve against an existing lanes factorization.

    rz (Bt, T, d[, r]), rnu (Bt, T-1, s[, r]) batch-first.  Two rhs sweeps
    (forward elimination + backward substitution), no Cholesky work — the
    lanes analog of kkt.solve_with_factors, used by the second-order
    correction (Ipopt step A-5.1)."""
    LPs, LSs, XAs, Gs, LPf, Cl, Al, Bl = fac
    Tm1, d, _, Bp = LPs.shape
    s = LSs.shape[1]
    Bt = rz.shape[0]
    squeeze = rz.ndim == 3
    rzl = _rhs_to_lanes(rz, Bp)
    rnul = _rhs_to_lanes(rnu, Bp)
    r = rzl.shape[2]
    nb = Bp // _L
    dtype = LPs.dtype

    rhs_kernel = functools.partial(
        _rhs_fwd_sweep_kernel, d=d, s=s, Tm1=Tm1
    )
    qs, qdfin = pl.pallas_call(
        rhs_kernel,
        grid=(nb, Tm1),
        in_specs=[
            _spec_t(d, d),  # LP
            _spec_t(s, s),  # LS
            _spec_t(s, d),  # G
            _spec_t(d, d),  # C
            _spec_t(s, d),  # A
            _spec_t(d, r),  # rz_t
            _spec_t(s, r),  # rnu_t
        ],
        out_specs=[_spec_t(d, r), _spec_fix(d, r)],
        out_shape=[
            jax.ShapeDtypeStruct((Tm1, d, r, Bp), dtype),
            jax.ShapeDtypeStruct((d, r, Bp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((d, r, _L), dtype)],
        compiler_params=_compiler_params(d, s),
        interpret=interpret,
    )(LPs, LSs, Gs, Cl, Al, rzl[:Tm1], rnul)

    q_fin = rzl[Tm1] + qdfin
    dz_last = _chol_solve(LPf, q_fin, d)
    dz_rest, nus = _bwd_sweep(
        LPs, LSs, XAs, qs, Cl, Al, Bl, rnul, dz_last, interpret=interpret
    )
    return _from_lanes_solution(dz_rest, dz_last, nus, Bt, squeeze)


# --------------------------------------------------------------------------- #
# per-step scan solve (cross-validation / fallback)
# --------------------------------------------------------------------------- #


@functools.partial(
    jax.jit, static_argnames=("delta_c", "interpret", "vec_min_dim")
)
def solve_kkt_lanes_scan(
    H, C, A, B, rz, rnu, delta_c: float, *,
    interpret: bool = False, vec_min_dim: int | None = None,
):
    """Per-knot-kernel variant (see impl); vec_min_dim as in
    solve_kkt_lanes."""
    with _vec_policy(vec_min_dim):
        return _solve_kkt_lanes_scan_impl(
            H, C, A, B, rz, rnu, delta_c, interpret=interpret
        )


def _solve_kkt_lanes_scan_impl(
    H, C, A, B, rz, rnu, delta_c: float, *, interpret: bool = False
):
    """Per-knot-kernel variant of solve_kkt_lanes (lax.scan over knots;
    ~2(T-1) kernel launches per solve).  Same numerics; kept as a
    cross-validation reference and fallback."""
    Bt, T, d, _ = H.shape
    s = A.shape[2]
    Hl, Cl, Al, Bl, rzl, rnul, _ = _to_lanes(H, C, A, B, rz, rnu)

    fwd = _make_fwd_step(d, s, float(delta_c), interpret)
    bwd = _make_bwd_step(d, s, interpret)

    def fwd_scan(carry, inp):
        P, q = carry
        Hn, C_t, A_t, B_t, rzn, rnu_t = inp
        Pn, qn, LP, LS, XA, qs = fwd(P, q, Hn, C_t, A_t, B_t, rzn, rnu_t)
        return (Pn, qn), (LP, LS, XA, qs)

    (P_fin, q_fin), saved = jax.lax.scan(
        fwd_scan,
        (Hl[0], rzl[0]),
        (Hl[1:], Cl, Al, Bl, rzl[1:], rnul),
    )
    LPs, LSs, XAs, qs = saved

    # terminal solve (single pallas step with A=0 to reuse machinery would
    # waste work; do it in lanes jnp directly — tiny)
    LPf = _chol(P_fin, d)
    dz_last = _chol_solve(LPf, q_fin, d)

    def bwd_scan(dz_next, inp):
        LP, LS, XA, q_t, C_t, A_t, B_t, rnu_t = inp
        dz_t, nu_t = bwd(dz_next, LP, LS, XA, q_t, C_t, A_t, B_t, rnu_t)
        return dz_t, (dz_t, nu_t)

    _, (dz_rest, nus) = jax.lax.scan(
        bwd_scan,
        dz_last,
        (LPs, LSs, XAs, qs, Cl, Al, Bl, rnul),
        reverse=True,
    )

    dz_l = jnp.concatenate([dz_rest, dz_last[None]], axis=0)  # (T, d, 1, Bp)
    dz = jnp.moveaxis(dz_l[:, :, 0, :], -1, 0)[:Bt]  # (Bt, T, d)
    nu = jnp.moveaxis(nus[:, :, 0, :], -1, 0)[:Bt]  # (Bt, T-1, s)
    ok = jnp.isfinite(dz).all(axis=(1, 2)) & jnp.isfinite(nu).all(axis=(1, 2))
    return dz, nu, ok
