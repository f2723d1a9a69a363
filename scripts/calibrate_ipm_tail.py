"""Probe the IPM convergence tail on the north-star config (Hadamard T=50,
Q=100 default): which options reach true stationarity (E0 small, f64)?"""

import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.utils.ipopt_oracle import kkt_certificate


def run(label, opts, iters, Q=100.0, R=1e-2):
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], 50, 0.2, Q=Q, R=R,
        ipopt_options=opts,
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        rng=np.random.default_rng(1234),
    )
    t0 = time.time()
    prob.solve(max_iter=iters)
    cert = kkt_certificate(prob)
    infid = 1 - float(qct.unitary_rollout_fidelity(prob.trajectory, sys))
    print(f"[{label}] t={time.time()-t0:.0f}s "
          f"conv={bool(prob.result.converged[0])} "
          f"n_iter={int(prob.result.n_iter[0])} "
          f"kkt_scaled={float(prob.result.kkt_err[0]):.2e} "
          f"E0={cert['E0']:.2e} stat={cert['e_stat']:.2e} "
          f"feas={cert['e_feas']:.2e} obj={cert['objective']:.8e} "
          f"infid={infid:.2e}", flush=True)


if __name__ == "__main__":
    base = dict(print_level=1)
    run("merit300", qct.SolverOptions(tol=1e-8, **base), 300)
    run("filter300", qct.SolverOptions(tol=1e-8, line_search="filter", **base), 300)
    run("recalc300", qct.SolverOptions(tol=1e-8, recalc_y="yes",
                                       recalc_y_feas_tol=1e1, **base), 300)
    run("soc300", qct.SolverOptions(tol=1e-8, soc=True, **base), 300)
    run("adaptive300", qct.SolverOptions(tol=1e-8, mu_strategy="adaptive",
                                         **base), 300)
