"""Oracle test calibration, round 2: bench-config certificate + polish at
T=50, and a T=25 cross-solve comparison."""

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


def build(T, Q, R, opts):
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    return sys, qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], T, 0.2, Q=Q, R=R,
        ipopt_options=opts,
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        rng=np.random.default_rng(1234),
    )


def main():
    # --- T=50 bench config: certificate + polish ---
    opts = qct.SolverOptions(print_level=1, tol=1e-8, recalc_y="yes",
                             recalc_y_feas_tol=1e1)
    sys_q, prob = build(50, 1e4, 1e-3, opts)
    t0 = time.time()
    prob.solve(max_iter=200)
    cert = kkt_certificate(prob)
    infid = 1 - float(qct.unitary_rollout_fidelity(prob.trajectory, sys_q))
    obj = cert["objective"]
    print(f"[T50] t={time.time()-t0:.0f}s conv={bool(prob.result.converged[0])} "
          f"E0={cert['E0']:.2e} stat={cert['e_stat']:.2e} "
          f"feas={cert['e_feas']:.2e} obj={obj:.8e} infid={infid:.2e}",
          flush=True)
    t0 = time.time()
    res_p, _ = trust_constr_solve(
        prob, Z_start=np.asarray(prob.result.Z[0]), max_iter=40, gtol=1e-9)
    print(f"[T50 polish] t={time.time()-t0:.0f}s nit={res_p.niter} "
          f"obj={res_p.fun:.8e} rel_impr={(obj-res_p.fun)/max(abs(obj),1e-30):.2e} "
          f"viol={res_p.constr_violation:.2e}", flush=True)

    # --- T=25 cross-solve ---
    sys_q, prob = build(25, 1e4, 1e-3, opts)
    t0 = time.time()
    prob.solve(max_iter=200)
    cert = kkt_certificate(prob)
    obj = cert["objective"]
    infid = 1 - float(qct.unitary_rollout_fidelity(prob.trajectory, sys_q))
    print(f"[T25] t={time.time()-t0:.0f}s E0={cert['E0']:.2e} "
          f"obj={obj:.8e} infid={infid:.2e}", flush=True)
    t0 = time.time()
    res_x, _ = trust_constr_solve(prob, max_iter=300, gtol=1e-9)
    print(f"[T25 cross] t={time.time()-t0:.0f}s nit={res_x.niter} "
          f"status={res_x.status} obj={res_x.fun:.8e} "
          f"viol={res_x.constr_violation:.2e} "
          f"rel_diff={(obj-res_x.fun)/max(abs(res_x.fun),1e-30):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
