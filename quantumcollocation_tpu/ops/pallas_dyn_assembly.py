"""Pallas TPU kernel: FULLY fused defect/Jacobian/Hessian assembly.

Round-4 measured the IPM's pre stage at 51% of each iteration (13.2 of
25.9 ms at B=512/T=51), and a finer round-5 probe split it as ~5.4 ms bank
kernel + ~5 ms post-bank F/A/B einsum assembly + ~9 ms Hessian contraction
— the post-bank parts are DISPATCH-bound (dozens of small XLA ops over
(B*T, tiny) tensors), not FLOP-bound.  This kernel fuses the whole
per-knot dynamics evaluation into ONE pallas_call in lanes layout:

    inputs   z_t, z_{t+1} knot rows, lam defect multipliers  (per lane)
    compute  propagator bank (same Horner/Gauss-Jordan/squaring chain as
             pallas_prop_bank) -> defects F, Jacobian stage blocks A/B,
             and the Hessian-of-Lagrangian defect curvature Hc/Cc
    outputs  F (s,L), A (s,d,L), B (s,d,L), Hc (d,d,L), Cc (d,d,L)

replacing the bank kernel + ~40 XLA einsum/scatter ops per iteration with
a single kernel launch.  NLP scaling (var_scale/defect_scale) is folded
into the entry writes as trace-time Python constants — zero runtime cost.

Like the unrolled kkt_lanes family, trace/compile cost grows ~cubically in
the stage dimension: the caller gates on d <= SolverOptions.lanes_max_dim.

Numerics match solver/analytic.py exactly (same recursions, same
assembly); cross-validated in tests/test_pallas_ops.py interpret mode.

Role parity: the reference's QuantumDynamics sparse F/dF/mu-d2F evaluators
(/root/reference/test/scripts/integrator_test_script.jl:41-52), fused.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..dynamics.expm import frechet_pairs, pade_coefficients
from .pallas_prop_bank import _gj_inverse, _mm

__all__ = ["AssemblySpec", "dyn_assembly_lanes", "spec_from_analytic"]

_L = 128


class _GroupSpec(NamedTuple):
    kind: str  # "exp" | "pade"
    n: int
    na: int
    a0: int
    a1: int
    dt_col: Any  # int | None
    dt_static: Any  # float | None
    order: int
    num_squarings: int
    members: tuple  # of (u0, u1, r0, r1, ncols)


class AssemblySpec(NamedTuple):
    """Hashable static description of one AnalyticStageDynamics (the numpy
    G matrices travel separately as traced constants)."""

    d: int
    s: int
    groups: tuple  # of _GroupSpec
    deriv_rows: tuple  # of (x0, x1, dx0, dx1, r0, r1, dt_col, dt_static)
    dteq_rows: tuple  # of (c0, c1, r0, r1)
    var_scale: Any  # tuple of floats | None
    defect_scale: Any  # tuple of floats | None


def spec_from_analytic(analytic) -> AssemblySpec:
    return AssemblySpec(
        d=analytic.d,
        s=analytic.s,
        groups=tuple(
            _GroupSpec(
                kind=g.kind,
                n=int(g.G_drift.shape[0]),
                na=int(g.G_drives.shape[0]),
                a0=g.a_slice[0],
                a1=g.a_slice[1],
                dt_col=g.dt_col,
                dt_static=g.dt_static,
                order=g.order,
                num_squarings=g.num_squarings,
                members=tuple(tuple(m) for m in g.members),
            )
            for g in analytic.groups
        ),
        deriv_rows=tuple(
            (r.x0, r.x1, r.dx0, r.dx1, r.r0, r.r1, r.dt_col, r.dt_static)
            for r in analytic.deriv_rows
        ),
        dteq_rows=tuple(
            (r.c0, r.c1, r.r0, r.r1) for r in analytic.dteq_rows
        ),
        var_scale=(
            tuple(float(v) for v in analytic.var_scale)
            if analytic.var_scale is not None
            else None
        ),
        defect_scale=(
            tuple(float(v) for v in analytic.defect_scale)
            if analytic.defect_scale is not None
            else None
        ),
    )


def _group_bank(a_rows, dt, Gd, Gs, g: _GroupSpec, dtype, L):
    """Bank for one group inside the kernel: returns (P, dP, d2P) for exp
    or (N, dN, d2N, D, dD, d2D) for pade; lanes layout (n, n, L)."""
    n, na = g.n, g.na
    free_dt = g.dt_col is not None
    K = na + (1 if free_dt else 0)
    pairs = frechet_pairs(K)
    coeffs = pade_coefficients(g.order)
    scale = 2.0 ** (-g.num_squarings) if g.kind == "exp" else 1.0

    G = Gd[:, :, None] + sum(
        a_rows[j][None, None, :] * Gs[j][:, :, None] for j in range(na)
    )
    if isinstance(dt, float):
        X = G * (dt * scale)
        dX = [Gs[j][:, :, None] * (dt * scale) for j in range(na)]
    else:
        X = G * dt[None, None, :] * scale
        dX = [Gs[j][:, :, None] * dt[None, None, :] * scale for j in range(na)]
    if free_dt:
        dX.append(G * scale)
    d2X = {}
    if free_dt:
        for p, (k, l) in enumerate(pairs):
            if k < na and l == na:
                d2X[p] = Gs[k][:, :, None] * scale

    eye_l = jnp.eye(n, dtype=dtype)[:, :, None] * jnp.ones((1, 1, L), dtype)
    Kp = len(pairs)

    def horner(sign):
        acc = coeffs[-1] * eye_l
        dacc = [jnp.zeros((n, n, L), dtype) for _ in range(K)]
        d2acc = [jnp.zeros((n, n, L), dtype) for _ in range(Kp)]
        for c in reversed(coeffs[:-1]):
            d2acc_new = []
            for p, (k, l) in enumerate(pairs):
                t = _mm(sign * X, d2acc[p])
                t = t + _mm(sign * dX[k], dacc[l])
                t = t + _mm(sign * dX[l], dacc[k])
                if p in d2X:
                    t = t + _mm(sign * d2X[p], acc)
                d2acc_new.append(t)
            d2acc = d2acc_new
            dacc = [
                _mm(sign * dX[k], acc) + _mm(sign * X, dacc[k])
                for k in range(K)
            ]
            acc = _mm(sign * X, acc) + c * eye_l
        return acc, dacc, d2acc

    N_m, dN, d2N = horner(1.0)
    D_m, dD, d2D = horner(-1.0)
    if g.kind == "pade":
        return N_m, dN, d2N, D_m, dD, d2D

    eye_rows = [eye_l[i] for i in range(n)]
    Dinv = _gj_inverse(D_m, n, eye_rows)
    P = _mm(Dinv, N_m)
    dP = [_mm(Dinv, dN[k] - _mm(dD[k], P)) for k in range(K)]
    d2P = []
    for p, (k, l) in enumerate(pairs):
        t = d2N[p] - _mm(d2D[p], P)
        t = t - _mm(dD[k], dP[l]) - _mm(dD[l], dP[k])
        d2P.append(_mm(Dinv, t))
    for _ in range(g.num_squarings):
        d2P = [
            _mm(d2P[p], P) + _mm(P, d2P[p])
            + _mm(dP[k], dP[l]) + _mm(dP[l], dP[k])
            for p, (k, l) in enumerate(pairs)
        ]
        dP = [_mm(dP[k], P) + _mm(P, dP[k]) for k in range(K)]
        P = _mm(P, P)
    return P, dP, d2P


def _assembly_kernel(
    Zt_ref, Ztp1_ref, lam_ref, *refs, spec: AssemblySpec,
):
    ng = len(spec.groups)
    G_refs = refs[: 2 * ng]
    F_ref, A_ref, B_ref, Hk_ref, Cc_ref = refs[2 * ng :]
    dtype = Zt_ref.dtype
    L = Zt_ref.shape[-1]
    d, s = spec.d, spec.s
    vs = spec.var_scale
    ds = spec.defect_scale

    def vsc(i):
        return 1.0 if vs is None else vs[i]

    def dsc(r):
        return 1.0 if ds is None else ds[r]

    def zt(i):
        return Zt_ref[i] * vsc(i)

    def ztp1(i):
        return Ztp1_ref[i] * vsc(i)

    def lam_p(r):
        return lam_ref[r] * dsc(r)

    zero = jnp.zeros((L,), dtype)
    F_rows = [None] * s
    A_ent = [[None] * d for _ in range(s)]
    B_ent = [[None] * d for _ in range(s)]
    Hk_ent = [[None] * d for _ in range(d)]
    Cc_ent = [[None] * d for _ in range(d)]

    def add(ent, i, j, v):
        ent[i][j] = v if ent[i][j] is None else ent[i][j] + v

    for gi, g in enumerate(spec.groups):
        Gd = G_refs[2 * gi][...]
        Gs = G_refs[2 * gi + 1][...]
        n, na = g.n, g.na
        free_dt = g.dt_col is not None
        K = na + (1 if free_dt else 0)
        pairs = frechet_pairs(K)
        theta_cols = list(range(g.a0, g.a1)) + (
            [g.dt_col] if free_dt else []
        )
        a_rows = [zt(g.a0 + j) for j in range(na)]
        dt = zt(g.dt_col) if free_dt else float(g.dt_static)
        bank = _group_bank(a_rows, dt, Gd, Gs, g, dtype, L)
        if g.kind == "exp":
            P, dP, d2P = bank
        else:
            N_m, dN, d2N, D_m, dD, d2D = bank

        for (u0, u1, r0, r1, ncols) in g.members:
            # iso layout: z row u0 + c*n + r  <->  U[r, c]
            U0 = jnp.stack(
                [
                    jnp.stack([zt(u0 + c * n + r) for c in range(ncols)])
                    for r in range(n)
                ]
            )  # (n, ncols, L)
            U1 = jnp.stack(
                [
                    jnp.stack([ztp1(u0 + c * n + r) for c in range(ncols)])
                    for r in range(n)
                ]
            )
            Lam = jnp.stack(
                [
                    jnp.stack(
                        [lam_p(r0 + c * n + r) for c in range(ncols)]
                    )
                    for r in range(n)
                ]
            )  # (n, ncols, L)

            if g.kind == "exp":
                resid = U1 - _mm(P, U0)
                A_state = P  # A block = -P
                dcols = [_mm(dP[k], U0) for k in range(K)]  # A col = -dcols
                dsign = -1.0
            else:
                resid = _mm(D_m, U1) - _mm(N_m, U0)
                A_state = N_m  # A block = -N
                dcols = [
                    _mm(dD[k], U1) - _mm(dN[k], U0) for k in range(K)
                ]  # A col = +dcols
                dsign = 1.0

            for c in range(ncols):
                for r in range(n):
                    row = r0 + c * n + r
                    F_rows[row] = resid[r, c] * dsc(row)
                    # state blocks (block-diagonal over columns c)
                    for rp in range(n):
                        col = u0 + c * n + rp
                        A_ent[row][col] = (
                            -A_state[r, rp] * (dsc(row) * vsc(col))
                        )
                        if g.kind == "pade":
                            B_ent[row][col] = D_m[r, rp] * (
                                dsc(row) * vsc(col)
                            )
                        elif rp == r:
                            B_ent[row][col] = (
                                jnp.full((L,), dsc(row) * vsc(col), dtype)
                            )
                    # theta columns
                    for k in range(K):
                        col = theta_cols[k]
                        A_ent[row][col] = dsign * dcols[k][r, c] * (
                            dsc(row) * vsc(col)
                        )

            # ---- curvature of -lam . F ---------------------------------- #
            U0T = jnp.swapaxes(U0, 0, 1)  # (ncols, n, L)
            W0 = _mm(Lam, U0T)  # (n, n, L): Lam U0^T
            if g.kind == "exp":
                for p, (k, l) in enumerate(pairs):
                    h = sum(
                        d2P[p][i, j] * W0[i, j]
                        for i in range(n)
                        for j in range(n)
                    )
                    ck, cl = theta_cols[k], theta_cols[l]
                    hv = h * (vsc(ck) * vsc(cl))
                    add(Hk_ent, ck, cl, hv)
                    if ck != cl:
                        add(Hk_ent, cl, ck, hv)
                # (u_t, theta_k): dP_k^T Lam
                for k in range(K):
                    ckc = theta_cols[k]
                    M = _mm(jnp.swapaxes(dP[k], 0, 1), Lam)  # (n, ncols, L)
                    for c in range(ncols):
                        for r in range(n):
                            ui = u0 + c * n + r
                            v = M[r, c] * (vsc(ui) * vsc(ckc))
                            add(Hk_ent, ui, ckc, v)
                            add(Hk_ent, ckc, ui, v)
            else:
                U1T = jnp.swapaxes(U1, 0, 1)
                W1 = _mm(Lam, U1T)
                for p, (k, l) in enumerate(pairs):
                    h = sum(
                        d2N[p][i, j] * W0[i, j] - d2D[p][i, j] * W1[i, j]
                        for i in range(n)
                        for j in range(n)
                    )
                    ck, cl = theta_cols[k], theta_cols[l]
                    hv = h * (vsc(ck) * vsc(cl))
                    add(Hk_ent, ck, cl, hv)
                    if ck != cl:
                        add(Hk_ent, cl, ck, hv)
                for k in range(K):
                    ckc = theta_cols[k]
                    Mt = _mm(jnp.swapaxes(dN[k], 0, 1), Lam)
                    Mp1 = _mm(jnp.swapaxes(dD[k], 0, 1), Lam)
                    for c in range(ncols):
                        for r in range(n):
                            ui = u0 + c * n + r
                            v = Mt[r, c] * (vsc(ui) * vsc(ckc))
                            add(Hk_ent, ui, ckc, v)
                            add(Hk_ent, ckc, ui, v)
                            # C-block: rows theta_k in z_t, cols u in z_{t+1}
                            add(
                                Cc_ent, ckc, ui,
                                -Mp1[r, c] * (vsc(ui) * vsc(ckc)),
                            )

    # ---- derivative defects x_{t+1} - x_t - dx_t dt ---------------------- #
    for (x0, x1, dx0, dx1, r0, r1, dt_col, dt_static) in spec.deriv_rows:
        kdim = x1 - x0
        dt = zt(dt_col) if dt_col is not None else float(dt_static)
        for i in range(kdim):
            row = r0 + i
            xi, dxi = x0 + i, dx0 + i
            dx_v = zt(dxi)
            F_rows[row] = (ztp1(xi) - zt(xi) - dx_v * dt) * dsc(row)
            A_ent[row][xi] = jnp.full((L,), -dsc(row) * vsc(xi), dtype)
            if isinstance(dt, float):
                A_ent[row][dxi] = jnp.full(
                    (L,), -dt * dsc(row) * vsc(dxi), dtype
                )
            else:
                A_ent[row][dxi] = -dt * (dsc(row) * vsc(dxi))
            B_ent[row][xi] = jnp.full((L,), dsc(row) * vsc(xi), dtype)
            if dt_col is not None:
                A_ent[row][dt_col] = -dx_v * (dsc(row) * vsc(dt_col))
                # bilinear curvature: -lam . (-dx dt) couples (dx, dt)
                lv = lam_p(row) * (vsc(dxi) * vsc(dt_col))
                add(Hk_ent, dxi, dt_col, lv)
                add(Hk_ent, dt_col, dxi, lv)

    # ---- dt-equality defects --------------------------------------------- #
    for (c0, c1, r0, r1) in spec.dteq_rows:
        for i in range(c1 - c0):
            row, ci = r0 + i, c0 + i
            F_rows[row] = (ztp1(ci) - zt(ci)) * dsc(row)
            A_ent[row][ci] = jnp.full((L,), -dsc(row) * vsc(ci), dtype)
            B_ent[row][ci] = jnp.full((L,), dsc(row) * vsc(ci), dtype)

    F_ref[...] = jnp.stack([r if r is not None else zero for r in F_rows])
    A_ref[...] = jnp.stack(
        [
            jnp.stack([e if e is not None else zero for e in row])
            for row in A_ent
        ]
    )
    B_ref[...] = jnp.stack(
        [
            jnp.stack([e if e is not None else zero for e in row])
            for row in B_ent
        ]
    )
    Hk_ref[...] = jnp.stack(
        [
            jnp.stack([e if e is not None else zero for e in row])
            for row in Hk_ent
        ]
    )
    Cc_ref[...] = jnp.stack(
        [
            jnp.stack([e if e is not None else zero for e in row])
            for row in Cc_ent
        ]
    )


@functools.partial(
    jax.jit, static_argnames=("spec", "interpret")
)
def dyn_assembly_lanes(
    Z, lam, G_consts, *, spec: AssemblySpec, interpret: bool = False
):
    """Fused F/A/B/Hc/Cc for a SCALED decision tensor.

    Z (B, T, d) scaled; lam (B, T-1, s) scaled; G_consts: flat tuple
    (G_drift_0, G_drives_0, G_drift_1, ...) per group in spec order.

    Returns (F (B,T-1,s), A (B,T-1,s,d), Bj (B,T-1,s,d),
             Hc (B,T,d,d) with zero final row, Cc (B,T-1,d,d)) — exactly
    matching AnalyticStageDynamics.dyn_eval + defect_curvature output in
    scaled units.
    """
    Bt, T, d = Z.shape
    s = spec.s
    Tm1 = T - 1
    M = Bt * Tm1
    dtype = Z.dtype
    Mp = ((M + _L - 1) // _L) * _L

    Zt = Z[:, :-1].reshape(M, d)
    Ztp1 = Z[:, 1:].reshape(M, d)
    lamf = lam.reshape(M, s)

    def to_lanes(x, rows):
        xp = jnp.zeros((Mp, rows), dtype).at[:M].set(x)
        return jnp.moveaxis(xp, 0, -1)  # (rows, Mp)

    Zt_l = to_lanes(Zt, d)
    Ztp1_l = to_lanes(Ztp1, d)
    lam_l = to_lanes(lamf, s)

    def spec_lane(*rowcol):
        return pl.BlockSpec(
            (*rowcol, _L), lambda i: (*(0,) * len(rowcol), i)
        )

    def spec_const(*shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    in_specs = [spec_lane(d), spec_lane(d), spec_lane(s)]
    g_args = []
    for gi, g in enumerate(spec.groups):
        in_specs.append(spec_const(g.n, g.n))
        in_specs.append(spec_const(g.na, g.n, g.n))
        g_args.append(jnp.asarray(G_consts[2 * gi], dtype))
        g_args.append(jnp.asarray(G_consts[2 * gi + 1], dtype))

    out_specs = [
        spec_lane(s),
        spec_lane(s, d),
        spec_lane(s, d),
        spec_lane(d, d),
        spec_lane(d, d),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((s, Mp), dtype),
        jax.ShapeDtypeStruct((s, d, Mp), dtype),
        jax.ShapeDtypeStruct((s, d, Mp), dtype),
        jax.ShapeDtypeStruct((d, d, Mp), dtype),
        jax.ShapeDtypeStruct((d, d, Mp), dtype),
    ]
    kernel = functools.partial(_assembly_kernel, spec=spec)
    F_l, A_l, B_l, Hk_l, Cc_l = pl.pallas_call(
        kernel,
        grid=(Mp // _L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(Zt_l, Ztp1_l, lam_l, *g_args)

    def unlane(x, *tail):
        # (rows..., Mp) -> (B, T-1, rows...)
        y = jnp.moveaxis(x, -1, 0)[:M]
        return y.reshape(Bt, Tm1, *tail)

    F = unlane(F_l, s)
    A = unlane(A_l, s, d)
    Bj = unlane(B_l, s, d)
    Hk = unlane(Hk_l, d, d)
    Cc = unlane(Cc_l, d, d)
    Hc = jnp.zeros((Bt, T, d, d), dtype).at[:, :-1].set(Hk)
    return F, A, Bj, Hc, Cc
