"""Calibrate the Ipopt-parity oracle (VERDICT-r1 task 2) on the north-star
config: single-qubit Hadamard, T=50, dt=0.2.

Measures: our IPM's E_0 (Ipopt's scaled optimality error, f64, independent
multiplier recovery), trust-constr cross-solve objective + runtime, and the
polish-mode improvement when trust-constr starts from our optimum.
"""

import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.utils.ipopt_oracle import (
    kkt_certificate,
    trust_constr_solve,
)


def main(T=50, free_time=False, max_iter=100):
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], T, 0.2,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-8),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=free_time),
        rng=np.random.default_rng(1234),
    )
    t0 = time.time()
    prob.solve(max_iter=max_iter)
    t_ipm = time.time() - t0
    infid = 1 - float(qct.unitary_rollout_fidelity(prob.trajectory, sys))
    obj_ours = float(prob.result.objective[0])
    print(f"[ipm] t={t_ipm:.1f}s obj={obj_ours:.8e} infid={infid:.3e} "
          f"converged={bool(prob.result.converged[0])} "
          f"kkt_err={float(prob.result.kkt_err[0]):.3e}")

    cert = kkt_certificate(prob)
    print(f"[E0]  E0={cert['E0']:.3e} stat={cert['e_stat']:.3e} "
          f"feas={cert['e_feas']:.3e} comp={cert['e_comp']:.3e} "
          f"s_d={cert['s_d']:.2f} n={cert['n']} n_c={cert['n_c']}")

    # polish: trust-constr from our optimum
    t0 = time.time()
    Zsol = np.asarray(prob.result.Z[0])
    res_p, flat = trust_constr_solve(
        prob, Z_start=Zsol, max_iter=80, gtol=1e-9)
    t_pol = time.time() - t0
    print(f"[polish] t={t_pol:.1f}s status={res_p.status} nit={res_p.niter} "
          f"obj={res_p.fun:.8e} dobj={obj_ours - res_p.fun:.3e} "
          f"viol={res_p.constr_violation:.3e}")

    # cross-solve: trust-constr from the same geodesic initial point
    t0 = time.time()
    res_x, _ = trust_constr_solve(prob, max_iter=400, gtol=1e-9)
    t_x = time.time() - t0
    print(f"[cross] t={t_x:.1f}s status={res_x.status} nit={res_x.niter} "
          f"obj={res_x.fun:.8e} viol={res_x.constr_violation:.3e} "
          f"rel_dobj={(obj_ours - res_x.fun)/max(abs(res_x.fun),1e-30):.3e}")


if __name__ == "__main__":
    import sys as _s
    T = int(_s.argv[1]) if len(_s.argv) > 1 else 50
    ft = len(_s.argv) > 2 and _s.argv[2] == "free"
    main(T=T, free_time=ft)
