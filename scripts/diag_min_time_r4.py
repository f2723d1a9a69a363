"""Round-4 diagnostic: decompose the min-time stationarity stall.

Reproduces tests/test_ipopt_oracle.py's min-time config, then breaks the
KKT stationarity residual r_stat = g + J^T lam - Jg^T nu - zl + zu down by
trajectory component (U iso rows, a, da, dda, dt) and knot, to find WHERE
stationarity fails (E0 ~ 1-3 per docs/roadmap.md).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.utils.ipopt_oracle import (
    flatten_nlp,
    kkt_certificate,
)

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
cert = kkt_certificate(mt)
print("cert:", {k: (round(v, 6) if isinstance(v, float) else v)
                for k, v in cert.items()})

# --- residual decomposition ---------------------------------------------
Z = np.asarray(mt.result.Z[0])
flat = flatten_nlp(mt, Z=Z)
x = flat.pack(Z)
g = flat.grad(x)
c = flat.cons(x)
J = flat.cons_jac(x)
n = flat.n

scale = 1.0 + np.abs(x)
act_lo = np.isfinite(flat.lb) & (x - flat.lb <= 1e-5 * scale)
act_hi = np.isfinite(flat.ub) & (flat.ub - x <= 1e-5 * scale)
gi = flat.ineq(x)
Jg = flat.ineq_jac(x)
act_g = gi <= 1e-5 * (1.0 + np.abs(gi))
print("active ineq rows:", int(act_g.sum()), "of", len(gi),
      "min g:", gi.min())
print("active lo bounds:", int(act_lo.sum()), "hi:", int(act_hi.sum()))

cols = [J.T]
if act_g.any():
    cols.append(-Jg[act_g].T)
for act, sgn in ((act_lo, -1.0), (act_hi, 1.0)):
    if act.any():
        E = np.zeros((n, int(act.sum())))
        E[np.nonzero(act)[0], np.arange(int(act.sum()))] = sgn
        cols.append(E)
A = np.concatenate(cols, axis=1)
sol, *_ = np.linalg.lstsq(A, -g, rcond=None)
r = g + A @ sol  # unprojected residual (best case)
print("unprojected lstsq residual max:", np.abs(r).max())

# map free-coordinate index -> (component, knot)
nlp = mt.nlp
free = np.asarray(nlp.free_mask).reshape(-1)
d = nlp.d
free_idx = np.nonzero(free)[0]
traj = mt.trajectory
names = []
for name in traj.names:
    sl = traj.comp_slice(name)
    names.append((name, sl.start, sl.stop))

rfull = np.zeros(nlp.T * d)
rfull[free_idx] = np.abs(r)
rfull = rfull.reshape(nlp.T, d)
gfull = np.zeros(nlp.T * d)
gfull[free_idx] = np.abs(g)
gfull = gfull.reshape(nlp.T, d)
print(f"\n{'comp':>8} {'max|r|':>12} {'argmax_knot':>11} {'max|g|':>12}")
for name, s0, s1 in names:
    blk = rfull[:, s0:s1]
    print(f"{name:>8} {blk.max():>12.4e} {int(blk.max(axis=1).argmax()):>11}"
          f" {gfull[:, s0:s1].max():>12.4e}")

# per-knot residual for the worst component
print("\nper-knot |r| for dt (if free-time):")
for name, s0, s1 in names:
    if name in ("dt", "Δt"):
        print(np.array2string(rfull[:, s0:s1].ravel(), precision=3))
print("\nduration:", float(mt.trajectory.duration()),
      "fid:", float(qct.unitary_rollout_fidelity(mt.trajectory, sys_q)))
