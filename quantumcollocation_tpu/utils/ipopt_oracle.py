"""Independent float64 optimality certification + cross-solver oracle.

The reference's L1 NLP solver is Ipopt (/root/reference/README.md:93), and
the driver's north star asks for "matching Ipopt iterates within tolerance".
No Ipopt binary (or Julia runtime for the reference stack) exists in this
environment, so Ipopt parity is validated by two independent instruments:

1. ``kkt_certificate(prob)`` — evaluates Ipopt's *scaled optimality error*
   ``E_0`` (Wächter & Biegler, "On the implementation of an interior-point
   filter line-search algorithm", Math. Prog. 106, 2006, eq. (5)) at a
   solution in float64, with equality/bound multipliers recovered by least
   squares.  ``E_0 <= tol`` is the literal acceptance test Ipopt applies to
   its own iterates — i.e. Ipopt, arriving at this point, would declare
   optimality.

2. ``trust_constr_solve(prob)`` — solves the SAME flattened NLP with scipy's
   ``trust-constr`` (an independent interior-point implementation, Byrd-Omojokun
   trust region) either from the same initial point (cross-solver optimum
   comparison) or warm-started from our solution ("polish" mode: a vanishing
   objective improvement certifies local optimality against a foreign solver).

Both operate on the UNSCALED ``prob.nlp`` (the mathematical problem, before
the IPM's internal Ipopt-style gradient scaling).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..solver.stage_nlp import make_nlp_functions

__all__ = [
    "FlatNLP",
    "flatten_nlp",
    "kkt_certificate",
    "trust_constr_solve",
]


@dataclass
class FlatNLP:
    """The stage NLP flattened to scipy form over the FREE coordinates.

    Pinned coordinates (free_mask == False: initial/final conditions and
    replicated globals) are substituted as constants, matching how the IPM
    treats them (fixed masks, problems/problem.py:155-168).
    """

    fun: Callable  # f(x) -> float
    grad: Callable  # ∇f(x) -> (n,)
    cons: Callable  # c(x) -> (n_c,)  equality defects, target 0
    cons_jac: Callable  # J(x) -> (n_c, n)
    x0: np.ndarray  # (n,)
    lb: np.ndarray  # (n,)
    ub: np.ndarray  # (n,)
    n: int
    n_c: int
    pack: Callable  # Z (T, d) -> x (n,)
    unpack: Callable  # x -> Z (T, d)
    ineq: Callable | None = None  # g(x) -> (n_g,)  inequalities, target >= 0
    ineq_jac: Callable | None = None  # Jg(x) -> (n_g, n)
    n_g: int = 0


def flatten_nlp(prob, Z=None) -> FlatNLP:
    """Flatten ``prob.nlp`` to dense scipy form (float64, CPU).

    Z: optional (T, d) decision tensor supplying the initial point
    (defaults to nlp.z0).  Stage inequalities g(z_t, t) >= 0 (final-fidelity
    floors, L1 slack couplings, complex-modulus disks) are stacked over all
    T knots into one g(x) >= 0 vector — the same lowering Ipopt applies via
    slacks (WB06 §3.4), so min-time/bang-bang solutions are certifiable too.
    """
    nlp = prob.nlp
    fns = make_nlp_functions(nlp, exact_hessian=False)
    T, d = nlp.T, nlp.d
    free = np.asarray(nlp.free_mask).reshape(-1)
    z_base = np.asarray(Z if Z is not None else nlp.z0, dtype=np.float64)
    base_flat = jnp.asarray(z_base.reshape(-1))
    idx = jnp.asarray(np.nonzero(free)[0])

    def to_Z(x):
        flat = base_flat.at[idx].set(x)
        return flat.reshape(T, d)

    @jax.jit
    def _f(x):
        return fns.total_cost(to_Z(x))

    _g = jax.jit(jax.grad(_f))

    @jax.jit
    def _c(x):
        return fns.defects(to_Z(x)).reshape(-1)

    _J = jax.jit(jax.jacrev(_c))

    if nlp.m > 0:

        @jax.jit
        def _gq(x):
            return fns.ineqs(to_Z(x)).reshape(-1)

        _Jg = jax.jit(jax.jacrev(_gq))
        ineq = lambda x: np.asarray(_gq(jnp.asarray(x, dtype=jnp.float64)))  # noqa: E731
        ineq_jac = lambda x: np.asarray(_Jg(jnp.asarray(x, dtype=jnp.float64)))  # noqa: E731
        n_g = int(nlp.m * T)
    else:
        ineq = ineq_jac = None
        n_g = 0

    lb = np.asarray(nlp.lb, dtype=np.float64).reshape(-1)[free]
    ub = np.asarray(nlp.ub, dtype=np.float64).reshape(-1)[free]
    x0 = z_base.reshape(-1)[free]
    # scipy requires x0 strictly inside for interior methods; nudge onto bounds
    x0 = np.clip(x0, lb, ub)

    def pack(Zfull):
        return np.asarray(Zfull, dtype=np.float64).reshape(-1)[free]

    def unpack(x):
        return np.asarray(to_Z(jnp.asarray(x, dtype=jnp.float64)))

    return FlatNLP(
        fun=lambda x: float(_f(jnp.asarray(x, dtype=jnp.float64))),
        grad=lambda x: np.asarray(_g(jnp.asarray(x, dtype=jnp.float64))),
        cons=lambda x: np.asarray(_c(jnp.asarray(x, dtype=jnp.float64))),
        cons_jac=lambda x: np.asarray(_J(jnp.asarray(x, dtype=jnp.float64))),
        x0=x0,
        lb=lb,
        ub=ub,
        n=int(free.sum()),
        n_c=int(nlp.s * (T - 1)),
        pack=pack,
        unpack=unpack,
        ineq=ineq,
        ineq_jac=ineq_jac,
        n_g=n_g,
    )


def kkt_certificate(prob, Z=None, *, active_tol: float = 1e-5) -> dict:
    """Ipopt's scaled optimality error E_0 at the solution, in float64.

    Multiplier recovery: λ (equalities), ν (active inequalities g(x) >= 0)
    and z_L/z_U (bound duals, restricted to the active set
    ``|x - bound| <= active_tol·(1+|x|)``) solve the stationarity
    least-squares problem; ν and the bound duals are projected to ≥ 0 (their
    sign at a KKT point) and the residual re-evaluated, so a non-KKT point
    cannot certify by abusing the sign freedom.

    Inequalities use the same active-set treatment Ipopt applies after its
    slack lowering (WB06 §3.4): inactive rows (g_i > active_tol) carry
    ν_i = 0 and contribute their complementarity ν_i·g_i = 0 exactly.

    Returns dict with e_stat, e_feas, e_comp, E0 (Ipopt's scaled max), plus
    the scaling factors s_d, s_c (s_max = 100, WB06 eq. (6)).
    """
    if Z is None:
        if getattr(prob, "result", None) is None:
            raise ValueError("pass Z or solve the problem first")
        Z = np.asarray(prob.result.Z[0])
    flat = flatten_nlp(prob, Z=Z)
    x = flat.pack(np.asarray(Z))
    g = flat.grad(x)
    c = flat.cons(x)
    J = flat.cons_jac(x)
    n, n_c = flat.n, flat.n_c

    scale = 1.0 + np.abs(x)
    act_lo = np.isfinite(flat.lb) & (x - flat.lb <= active_tol * scale)
    act_hi = np.isfinite(flat.ub) & (flat.ub - x <= active_tol * scale)

    if flat.n_g > 0:
        gi = flat.ineq(x)
        Jg = flat.ineq_jac(x)
        act_g = gi <= active_tol * (1.0 + np.abs(gi))
        feas_g = float(np.max(np.maximum(-gi, 0.0)))  # violation of g >= 0
    else:
        gi = np.zeros(0)
        Jg = np.zeros((0, n))
        act_g = np.zeros(0, dtype=bool)
        feas_g = 0.0

    # stationarity: g + J^T λ - Jg^T ν - z_L + z_U = 0  (ν, z_L, z_U >= 0)
    cols = [J.T]
    if act_g.any():
        cols.append(-Jg[act_g].T)
    if act_lo.any():
        E = np.zeros((n, int(act_lo.sum())))
        E[np.nonzero(act_lo)[0], np.arange(int(act_lo.sum()))] = -1.0
        cols.append(E)
    if act_hi.any():
        E = np.zeros((n, int(act_hi.sum())))
        E[np.nonzero(act_hi)[0], np.arange(int(act_hi.sum()))] = 1.0
        cols.append(E)
    A = np.concatenate(cols, axis=1)
    sol, *_ = np.linalg.lstsq(A, -g, rcond=None)
    lam = sol[:n_c]
    nu = np.zeros(flat.n_g)
    zl = np.zeros(n)
    zu = np.zeros(n)
    k = n_c
    if act_g.any():
        nu[act_g] = np.maximum(sol[k : k + int(act_g.sum())], 0.0)
        k += int(act_g.sum())
    if act_lo.any():
        zl[act_lo] = np.maximum(sol[k : k + int(act_lo.sum())], 0.0)
        k += int(act_lo.sum())
    if act_hi.any():
        zu[act_hi] = np.maximum(sol[k : k + int(act_hi.sum())], 0.0)

    r_stat = g + J.T @ lam - Jg.T @ nu - zl + zu
    # complementarity at μ = 0
    comp_lo = zl * np.where(np.isfinite(flat.lb), x - flat.lb, 0.0)
    comp_hi = zu * np.where(np.isfinite(flat.ub), flat.ub - x, 0.0)
    comp_g = nu * gi if flat.n_g > 0 else np.zeros(1)

    s_max = 100.0
    z_sum = np.abs(zl).sum() + np.abs(zu).sum() + np.abs(nu).sum()
    n_duals = n_c + n + flat.n_g
    s_d = max(s_max, (np.abs(lam).sum() + z_sum) / max(n_duals, 1)) / s_max
    s_c = max(s_max, z_sum / max(n + flat.n_g, 1)) / s_max

    e_stat = float(np.max(np.abs(r_stat))) / s_d
    e_feas = max(float(np.max(np.abs(c))) if n_c else 0.0, feas_g)
    e_comp = (
        float(
            max(
                np.max(np.abs(comp_lo)),
                np.max(np.abs(comp_hi)),
                np.max(np.abs(comp_g)),
            )
        )
        / s_c
        if n
        else 0.0
    )
    return {
        "E0": max(e_stat, e_feas, e_comp),
        "e_stat": e_stat,
        "e_feas": e_feas,
        "e_comp": e_comp,
        "s_d": s_d,
        "s_c": s_c,
        "objective": flat.fun(x),
        "n": n,
        "n_c": n_c,
        "n_g": flat.n_g,
    }


def trust_constr_solve(
    prob,
    *,
    x_start: Any = None,
    Z_start: Any = None,
    max_iter: int = 500,
    gtol: float = 1e-8,
    xtol: float = 1e-12,
    verbose: int = 0,
):
    """Solve the flattened NLP with scipy trust-constr (independent
    interior-point oracle).  Returns (scipy OptimizeResult, FlatNLP)."""
    from scipy.optimize import Bounds, NonlinearConstraint, minimize

    flat = flatten_nlp(prob, Z=Z_start)
    x0 = np.asarray(x_start, dtype=np.float64) if x_start is not None else flat.x0
    constraints = [
        NonlinearConstraint(flat.cons, 0.0, 0.0, jac=flat.cons_jac)
    ]
    if flat.n_g > 0:
        constraints.append(
            NonlinearConstraint(flat.ineq, 0.0, np.inf, jac=flat.ineq_jac)
        )
    bounded = np.isfinite(flat.lb).any() or np.isfinite(flat.ub).any()
    res = minimize(
        flat.fun,
        x0,
        jac=flat.grad,
        method="trust-constr",
        constraints=constraints,
        bounds=Bounds(flat.lb, flat.ub) if bounded else None,
        options={
            "maxiter": max_iter,
            "gtol": gtol,
            "xtol": xtol,
            "verbose": verbose,
        },
    )
    return res, flat
