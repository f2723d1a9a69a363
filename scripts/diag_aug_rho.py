"""Verify the rho*J^T J augmentation at the min-time stall point:
1. exactness: augmented system returns the same (dz, nu)
2. factorization success at small delta_w for moderate rho."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.solver.kkt import factor_kkt, solve_with_factors

sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
T, dt = 15, 0.4
warm = qct.UnitarySmoothPulseProblem(
    sys_q, qct.GATES["H"], T, dt, Q=100.0, R=1e-2,
    ipopt_options=qct.SolverOptions(print_level=1, tol=1e-8),
    piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
    rng=np.random.default_rng(0),
)
warm.solve(max_iter=100)
a_solved = np.asarray(warm.trajectory["a"])
traj2 = qct.initialize_unitary_trajectory(
    qct.GATES["H"], T, dt, 2,
    [np.ones(2), np.full(2, np.inf), np.ones(2)],
    free_time=True, a_guess=a_solved, system=sys_q,
)
mt = qct.UnitaryMinimumTimeProblem(
    traj2, sys_q, warm.get_objective(), warm.integrators, [],
    final_fidelity=0.99, D=40.0,
    ipopt_options=qct.SolverOptions(
        print_level=1, tol=1e-8, line_search="filter"
    ),
)
mt.solve(max_iter=150)
solver = mt.solver
Zfin = np.asarray(mt.result.Z)
Zs = Zfin / np.asarray(solver.var_scale) if solver.options.nlp_scaling else Zfin
state = solver._init_state_jit(jnp.asarray(Zs))
for _ in range(10):
    state = solver.step(state)

nlp = solver.nlp
f = solver.funcs
Z, lam, w, sig = state.Z[0], state.lam[0], state.w[0], state.sig[0]
zl, zu = state.zl[0], state.zu[0]
T_, d, s, m = nlp.T, nlp.d, nlp.s, nlp.m
free = np.asarray(solver._free)
has_lb, has_ub = np.asarray(solver._has_lb), np.asarray(solver._has_ub)
lb, ub = np.asarray(solver._lb), np.asarray(solver._ub)

F, A, Bj, Jg, dyn_aux = f.dyn_eval(Z, None)
H, C = f.hess_blocks_aux(Z, lam, w, dyn_aux)
Znp = np.asarray(Z)
sl = np.where(has_lb > 0, np.maximum(Znp - lb, 1e-100), 1.0)
su = np.where(has_ub > 0, np.maximum(ub - Znp, 1e-100), 1.0)
H = np.asarray(H) + np.stack(
    [np.diag(np.where(has_lb[t] > 0, np.asarray(zl)[t] / sl[t], 0.0)
             + np.where(has_ub[t] > 0, np.asarray(zu)[t] / su[t], 0.0))
     for t in range(T_)])
if m > 0:
    H = H + np.einsum("tmi,tm,tmj->tij", np.asarray(Jg),
                      np.asarray(w) / np.asarray(sig), np.asarray(Jg))
Mf = free
H = H * Mf[:, :, None] * Mf[:, None, :] + np.stack(
    [np.diag(1.0 - Mf[t]) for t in range(T_)])
C = np.asarray(C) * Mf[:-1, :, None] * Mf[1:, None, :]
A = np.asarray(A) * Mf[:-1, None, :]
Bj = np.asarray(Bj) * Mf[1:, None, :]

rng = np.random.default_rng(1)
rz = rng.standard_normal((T_, d))
rnu = rng.standard_normal((T_ - 1, s))

H, C, A, Bj = map(jnp.asarray, (H, C, A, Bj))
rzj, rnuj = jnp.asarray(rz), jnp.asarray(rnu)


def aug(H, C, rz, rho):
    HA = H
    HA = HA.at[:-1].add(rho * jnp.einsum("tsi,tsj->tij", A, A))
    HA = HA.at[1:].add(rho * jnp.einsum("tsi,tsj->tij", Bj, Bj))
    CA = C + rho * jnp.einsum("tsi,tsj->tij", A, Bj)
    rzA = rz
    rzA = rzA.at[:-1].add(rho * jnp.einsum("tsi,ts->ti", A, rnuj))
    rzA = rzA.at[1:].add(rho * jnp.einsum("tsi,ts->ti", Bj, rnuj))
    return HA, CA, rzA


# reference solve at the huge delta the plain path needs
fac = factor_kkt(H + 100.0 * jnp.eye(d), C, A, Bj, solver.options.delta_c)
dz_ref, nu_ref, ok_ref = solve_with_factors(fac, rzj, rnuj)
print("plain dw=100 ok:", bool(ok_ref))

print(f"\n{'rho':>8} {'dw':>8} {'ok':>5} {'dz vs plain100':>16} "
      f"{'|Jdz-rnu|':>12}")
for rho in [1.0, 10.0, 100.0, 1000.0]:
    for dw in [0.0, 0.5, 1.0, 2.0, 5.0]:
        HA, CA, rzA = aug(H + dw * jnp.eye(d), C, rzj, rho)
        facA = factor_kkt(HA, CA, A, Bj, solver.options.delta_c)
        dz, nu, ok = solve_with_factors(facA, rzA, rnuj)
        # constraint satisfaction of the step (must equal rnu exactly)
        Jdz = (jnp.einsum("tsd,td->ts", A, dz[:-1])
               + jnp.einsum("tsd,td->ts", Bj, dz[1:]))
        cerr = float(jnp.abs(Jdz - rnuj).max())
        print(f"{rho:>8.0f} {dw:>8.1f} {str(bool(ok)):>5} "
              f"{'-':>16} {cerr:>12.2e}")
        if ok:
            break

# exactness check: same (dz, nu) as plain system at the SAME dw where both
# factor (use dw=100 where plain works)
HA, CA, rzA = aug(H + 100.0 * jnp.eye(d), C, rzj, 10.0)
facA = factor_kkt(HA, CA, A, Bj, solver.options.delta_c)
dzA, nuA, okA = solve_with_factors(facA, rzA, rnuj)
print("\nexactness at dw=100, rho=10: ok", bool(okA),
      " max|dz-dz_ref|", float(jnp.abs(dzA - dz_ref).max()),
      " max|nu-nu_ref|", float(jnp.abs(nuA - nu_ref).max()))
