"""Measure the TRUE reduced-Hessian spectrum at the min-time stall point,
vs the delta_w the block factorization demands.  Decides between:
- real negative curvature O(100) -> need trust-region/negative-curvature step
- conservative factorization -> fix the condensation instead."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.solver.stage_nlp import make_nlp_functions

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

# Reconstruct the SCALED internal state the solver saw at its last iterate.
# Simplest: re-run init_state on the solver's own scaled final Z.
# solver.solve returned unscaled Z; re-scale:
Zfin = np.asarray(mt.result.Z)  # (B, T, d) unscaled
if solver.options.nlp_scaling:
    Zs = Zfin / np.asarray(solver.var_scale)
else:
    Zs = Zfin
state = solver._init_state_jit(jnp.asarray(Zs))
# run ONE step to get converged-ish multipliers? No - instead rerun a few
# steps so lam/w are the solver's (init_state re-estimates lam by LS).
for _ in range(10):
    state = solver.step(state)

nlp = solver.nlp
f = solver.funcs
Z = state.Z[0]
lam, w = state.lam[0], state.w[0]
sig = state.sig[0]
zl, zu = state.zl[0], state.zu[0]
mu = float(state.mu[0])
print("mu:", mu, "delta_w carried:", float(state.delta_w[0]),
      "reg_dw:", float(state.reg_dw[0]))

T_, d, s, m = nlp.T, nlp.d, nlp.s, nlp.m
free = np.asarray(solver._free, bool)
has_lb = np.asarray(solver._has_lb)
has_ub = np.asarray(solver._has_ub)
lb = np.asarray(solver._lb)
ub = np.asarray(solver._ub)

F, A, Bj, Jg, dyn_aux = f.dyn_eval(Z, None)
H, C = f.hess_blocks_aux(Z, lam, w, dyn_aux)
Znp = np.asarray(Z)
sl = np.where(has_lb > 0, np.maximum(Znp - lb, 1e-100), 1.0)
su = np.where(has_ub > 0, np.maximum(ub - Znp, 1e-100), 1.0)
Sig_l = np.where(has_lb > 0, np.asarray(zl) / sl, 0.0)
Sig_u = np.where(has_ub > 0, np.asarray(zu) / su, 0.0)
H = np.asarray(H) + np.stack([np.diag(Sig_l[t] + Sig_u[t])
                              for t in range(T_)])
if m > 0:
    Sig_g = np.asarray(w) / np.asarray(sig)
    H = H + np.einsum("tmi,tm,tmj->tij", np.asarray(Jg), Sig_g,
                      np.asarray(Jg))

# dense full-space W (T*d x T*d) and J ((T-1)*s x T*d)
n_full = T_ * d
W = np.zeros((n_full, n_full))
for t in range(T_):
    W[t * d:(t + 1) * d, t * d:(t + 1) * d] = H[t]
Cn = np.asarray(C)
for t in range(T_ - 1):
    W[t * d:(t + 1) * d, (t + 1) * d:(t + 2) * d] += Cn[t]
    W[(t + 1) * d:(t + 2) * d, t * d:(t + 1) * d] += Cn[t].T
J = np.zeros(((T_ - 1) * s, n_full))
An, Bn = np.asarray(A), np.asarray(Bj)
for t in range(T_ - 1):
    J[t * s:(t + 1) * s, t * d:(t + 1) * d] = An[t]
    J[t * s:(t + 1) * s, (t + 1) * d:(t + 2) * d] = Bn[t]

fm = free.reshape(-1)
Wf = W[np.ix_(fm, fm)]
Jf = J[:, fm]
# null-space basis of Jf
_, S, Vt = np.linalg.svd(Jf, full_matrices=True)
rank = int((S > 1e-9 * S[0]).sum())
Nb = Vt[rank:].T
red = Nb.T @ Wf @ Nb
ev = np.linalg.eigvalsh(red)
print("reduced Hessian dim:", red.shape, "rank J:", rank)
print("reduced eigs: min", ev[:6], "\n   max", ev[-3:])
print("#negative:", int((ev < 0).sum()))

# what delta does the block factorization demand here?
from quantumcollocation_tpu.solver.kkt import factor_kkt, solve_with_factors

rz = jnp.zeros((T_, d))
rnu = jnp.zeros((T_ - 1, s))
for dw in [0.0, 1e-4, 1e-2, 1.0, 10.0, 30.0, 100.0, 300.0, 800.0]:
    Hj = jnp.asarray(H) + dw * jnp.eye(d)
    fac = factor_kkt(Hj, jnp.asarray(Cn), jnp.asarray(An) *
                     np.asarray(free)[:-1, None, :],
                     jnp.asarray(Bn) * np.asarray(free)[1:, None, :],
                     solver.options.delta_c)
    _, _, ok = solve_with_factors(fac, rz, rnu)
    print(f"delta_w={dw:8.1e}  factorization ok: {bool(ok)}")
