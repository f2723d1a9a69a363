"""Decompose the INTERNAL dual residual at the min-time fixed point: which
variable block / multiplier carries the stuck inf_du ~ 0.2?"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct

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
mt.solve(max_iter=200)
solver = mt.solver
Zfin = np.asarray(mt.result.Z)
Zs = Zfin / np.asarray(solver.var_scale) if solver.options.nlp_scaling else Zfin
state = solver._init_state_jit(jnp.asarray(Zs))
for _ in range(30):
    state = solver.step(state)

nlp, f = solver.nlp, solver.funcs
Z, lam, w, sig = state.Z[0], state.lam[0], state.w[0], state.sig[0]
zl, zu = state.zl[0], state.zu[0]
mu = float(state.mu[0])
print("mu:", mu, "E_dual:", float(state.e_dual[0]),
      "E_pr:", float(state.e_pr[0]), "reg_dw:", float(state.reg_dw[0]))

free = np.asarray(solver._free)
has_lb, has_ub = np.asarray(solver._has_lb), np.asarray(solver._has_ub)
lb, ub = np.asarray(solver._lb), np.asarray(solver._ub)
F, A, Bj, Jg, _ = f.dyn_eval(Z, None)
gcost = np.asarray(f.grad_cost(Z))
T_, d, s, m = nlp.T, nlp.d, nlp.s, nlp.m
An, Bn, Jgn = np.asarray(A), np.asarray(Bj), np.asarray(Jg)
lamn, wn = np.asarray(lam), np.asarray(w)
JT_lam = np.zeros((T_, d))
JT_lam[:-1] += np.einsum("tsd,ts->td", An, lamn)
JT_lam[1:] += np.einsum("tsd,ts->td", Bn, lamn)
jg_w = np.einsum("tmi,tm->ti", Jgn, wn) if m > 0 else 0.0
r_dual = (gcost - JT_lam - jg_w - has_lb * np.asarray(zl)
          + has_ub * np.asarray(zu)) * free
print("max|r_dual| (internal):", np.abs(r_dual).max())

traj = mt.trajectory
for name in traj.names:
    sl_ = traj.comp_slice(name)
    blk = r_dual[:, sl_]
    print(f"  {name:>6}: max|r_dual| {np.abs(blk).max():.4e} at knot "
          f"{int(np.abs(blk).max(axis=1).argmax())}")

g = np.asarray(f.ineqs(Z))
print("\nfloor rows: g (=F-fid):", g.ravel()[:5], "...")
print("sig:", np.asarray(sig).ravel()[:5])
print("w (internal duals):", wn.ravel()[:5], " mu/sig:",
      (mu / np.asarray(sig)).ravel()[:5])

# LS-recover the best multipliers with internal Jacobians, compare
nfull = T_ * d
Jfull = np.zeros(((T_ - 1) * s, nfull))
for t in range(T_ - 1):
    Jfull[t * s:(t + 1) * s, t * d:(t + 1) * d] = An[t]
    Jfull[t * s:(t + 1) * s, (t + 1) * d:(t + 2) * d] = Bn[t]
Jgfull = np.zeros((T_ * m, nfull)) if m else np.zeros((0, nfull))
for t in range(T_):
    Jgfull[t * m:(t + 1) * m, t * d:(t + 1) * d] = Jgn[t]
gc = (gcost * free).reshape(-1)
# solve for (lam, w_active) minimizing ||gc - J^T lam - Jg^T w|| over free
fmask = free.reshape(-1) > 0
Astack = np.concatenate([Jfull[:, fmask].T, Jgfull[:, fmask].T], axis=1)
sol, *_ = np.linalg.lstsq(Astack, gc[fmask], rcond=None)
lam_ls = sol[:(T_ - 1) * s].reshape(T_ - 1, s)
w_ls = sol[(T_ - 1) * s:].reshape(T_, m) if m else None
res = gc[fmask] - Astack @ sol
print("\nLS multipliers: residual max", np.abs(res).max())
print("w_ls:", None if w_ls is None else w_ls.ravel()[:5])
print("max|lam - lam_ls|:", np.abs(lamn - lam_ls).max(),
      " |lam| scale:", np.abs(lam_ls).max())
if m:
    print("max|w - w_ls|:", np.abs(wn - w_ls).max())
