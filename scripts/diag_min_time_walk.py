"""Walk along the projected steepest-descent direction from the min-time
stall point, restoring feasibility by Newton-on-defects, to see whether a
feasible descent path exists (solver stall) or the objective bounces
(landscape/nonsmoothness)."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.utils.ipopt_oracle import flatten_nlp

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
Z = np.asarray(mt.result.Z[0])
flat = flatten_nlp(mt, Z=Z)
x = flat.pack(Z)


def project_feasible(x, iters=25):
    """Newton on c(x)=0 (min-norm correction), keep inside bounds."""
    for _ in range(iters):
        c = flat.cons(x)
        if np.abs(c).max() < 1e-12:
            break
        J = flat.cons_jac(x)
        dx, *_ = np.linalg.lstsq(J, -c, rcond=None)
        x = np.clip(x + dx, flat.lb, flat.ub)
    return x


def reduced_grad(x):
    g = flat.grad(x)
    J = flat.cons_jac(x)
    lam, *_ = np.linalg.lstsq(J.T, -g, rcond=None)
    return g + J.T @ lam


x0 = project_feasible(x)
print("start: f =", flat.fun(x0), " |c| =", np.abs(flat.cons(x0)).max(),
      " min g_ineq =", flat.ineq(x0).min())
r0 = reduced_grad(x0)
print("reduced grad norm:", np.linalg.norm(r0), " max:", np.abs(r0).max())

d = -r0 / np.linalg.norm(r0)
print(f"\n{'step':>10} {'f':>14} {'df':>12} {'|c|after':>10} "
      f"{'min_g':>10} {'|rg|':>10}")
f0 = flat.fun(x0)
for s in [1e-6, 1e-5, 1e-4, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1, 3e-1]:
    xt = project_feasible(np.clip(x0 + s * d, flat.lb, flat.ub))
    ft = flat.fun(xt)
    print(f"{s:>10.1e} {ft:>14.8f} {ft - f0:>12.3e} "
          f"{np.abs(flat.cons(xt)).max():>10.2e} "
          f"{flat.ineq(xt).min():>10.2e} "
          f"{np.linalg.norm(reduced_grad(xt)):>10.3e}")

# Now: steepest-descent-with-projection loop, many small steps, to see if
# the objective can actually be driven down and where it goes
x_cur = x0
f_cur = f0
s = 1e-3
for k in range(200):
    r = reduced_grad(x_cur)
    d = -r / max(np.linalg.norm(r), 1e-300)
    for _ in range(30):
        xt = project_feasible(np.clip(x_cur + s * d, flat.lb, flat.ub))
        ft = flat.fun(xt)
        ok = ft < f_cur and flat.ineq(xt).min() > -1e-9
        if ok:
            break
        s *= 0.5
    if not ok:
        print(f"iter {k}: no descent at s={s:.1e}, |rg|="
              f"{np.linalg.norm(r):.3e}")
        break
    x_cur, f_cur = xt, ft
    s = min(s * 2.0, 0.5)
    if k % 20 == 0:
        print(f"iter {k}: f={f_cur:.8f} |rg|={np.linalg.norm(r):.3e} "
              f"s={s:.1e} min_g={flat.ineq(x_cur).min():.2e}")
print("final f:", f_cur, " |rg|:", np.linalg.norm(reduced_grad(x_cur)),
      " min_g:", flat.ineq(x_cur).min())
