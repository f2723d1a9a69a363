"""Block-tridiagonal KKT factorization and solve (stage-wise Riccati scan).

This replaces the reference stack's only native component — Ipopt's sparse
KKT factorization (MUMPS/HSL; /root/reference/README.md:93) — with a
TPU-native structured factorization: the trajectory KKT system

    [ H̄_t      C_t        A_t^T ]
    [ C_t^T    H̄_{t+1}    B_t^T ]   (symmetric quasi-definite after
    [ A_t      B_t       -δ_c I ]    regularization)

is eliminated stage by stage.  Each elimination step is two small Cholesky
factorizations (d and s) plus a handful of small matmuls — a lax.scan over
knots, vmapped over thousands of batch instances so every step is a large
batched matmul on the MXU.  Quasi-definiteness (H̄ ≻ 0 via barrier + δ_w,
-δ_c I ≺ 0) guarantees the factorization exists without pivoting.

Single-instance shapes (the IPM vmaps over a leading batch axis):
    H  (T, d, d)    Lagrangian Hessian diagonal blocks (with barrier + reg)
    C  (T-1, d, d)  Hessian coupling blocks
    A  (T-1, s, d)  defect Jacobian wrt z_t
    B  (T-1, s, d)  defect Jacobian wrt z_{t+1}
    rz (T, d)       rhs for the z rows
    rnu (T-1, s)    rhs for the constraint rows

Solves  [[H̄, J^T], [J, -δ_c I]] [Δz; ν] = [rz; rnu]  and returns
(Δz, ν, ok);  Δλ = -ν for the IPM's sign convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = ["solve_kkt"]


def _chol_solve(L, rhs):
    y = solve_triangular(L, rhs, lower=True)
    return solve_triangular(L.T, y, lower=False)


def solve_kkt(H, C, A, B, rz, rnu, delta_c):
    """Factor + solve the block-tridiagonal saddle system. See module doc."""
    T, d, _ = H.shape
    s = A.shape[1]
    eye_s = jnp.eye(s, dtype=H.dtype)

    # ---- forward elimination --------------------------------------------- #
    def fwd_step(carry, inp):
        P, q = carry
        H_next, C_t, A_t, B_t, rz_next, rnu_t = inp
        L_P = jnp.linalg.cholesky(P)
        X_A = _chol_solve(L_P, A_t.T)  # (d, s)
        X_C = _chol_solve(L_P, C_t)  # (d, d)
        x = _chol_solve(L_P, q)  # (d,)
        S = delta_c * eye_s + A_t @ X_A  # (s, s)
        L_S = jnp.linalg.cholesky(S)
        G = A_t @ X_C - B_t  # (s, d)
        y = _chol_solve(L_S, A_t @ x - rnu_t)  # (s,)
        P_next = H_next - C_t.T @ X_C + G.T @ _chol_solve(L_S, G)
        q_next = rz_next - C_t.T @ x + G.T @ y
        # symmetrize against drift
        P_next = 0.5 * (P_next + P_next.T)
        saved = (L_P, L_S, X_A, q)
        return (P_next, q_next), saved

    inputs = (H[1:], C, A, B, rz[1:], rnu)
    (P_final, q_final), saved = jax.lax.scan(fwd_step, (H[0], rz[0]), inputs)
    L_Ps, L_Ss, X_As, qs = saved  # stacked over t = 0..T-2

    # ---- terminal solve --------------------------------------------------- #
    L_final = jnp.linalg.cholesky(P_final)
    dz_last = _chol_solve(L_final, q_final)

    # ---- backward substitution ------------------------------------------- #
    def bwd_step(dz_next, inp):
        L_P, L_S, X_A, q_t, C_t, A_t, B_t, rnu_t = inp
        u = q_t - C_t @ dz_next
        v = rnu_t - B_t @ dz_next
        x = _chol_solve(L_P, u)
        y = _chol_solve(L_S, A_t @ x - v)
        dz_t = x - X_A @ y
        return dz_t, (dz_t, y)

    inputs_bwd = (L_Ps, L_Ss, X_As, qs, C, A, B, rnu)
    _, (dz_rest, nus) = jax.lax.scan(
        bwd_step, dz_last, inputs_bwd, reverse=True
    )
    dz = jnp.concatenate([dz_rest, dz_last[None]], axis=0)

    ok = jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(nus))
    return dz, nus, ok
