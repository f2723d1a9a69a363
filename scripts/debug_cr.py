"""Debug: compare cr vs xla KKT solves on real IPM iteration data."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.solver.kkt import solve_kkt
from quantumcollocation_tpu.solver.kkt_cr import solve_kkt_cr

sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
prob = qct.UnitarySmoothPulseProblem(
    sys_q, qct.GATES["H"], 21, 0.2,
    ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
    piccolo_options=qct.PiccoloOptions(verbose=False),
    rng=np.random.default_rng(0),
)
solver = prob.solver
state = solver.init_state(prob.initial_decision(1))

# run a few xla iterations, then at each iteration compare the two backends
# on the same KKT input
import quantumcollocation_tpu.solver.ipm as ipm_mod

for it in range(8):
    analytic = solver.nlp.analytic
    with jax.default_matmul_precision("highest"):
        if analytic is not None and len(analytic.groups) > 0:
            banks = analytic.banks_batched(state.Z, second_order=solver.exact_hessian)
            kkt_in, aux = jax.vmap(solver._iteration_pre)(state, banks)
        else:
            kkt_in, aux = jax.vmap(lambda st: solver._iteration_pre(st, None))(state)
        H, C, A, Bj, rz, rnu = kkt_in[:6]
        dc = solver.options.delta_c
        dz1, nu1, ok1 = jax.vmap(
            lambda h, c, a, b, z, n: solve_kkt(h, c, a, b, z, n, dc)
        )(H, C, A, Bj, rz, rnu)
        dz2, nu2, ok2 = jax.vmap(
            lambda h, c, a, b, z, n: solve_kkt_cr(h, c, a, b, z, n, dc)
        )(H, C, A, Bj, rz, rnu)
        err_dz = float(jnp.max(jnp.abs(dz1 - dz2)))
        err_nu = float(jnp.max(jnp.abs(nu1 - nu2)))
        # residual check of both solutions
        print(
            f"it={it} ok_xla={bool(ok1.all())} ok_cr={bool(ok2.all())} "
            f"max|dz_xla|={float(jnp.max(jnp.abs(dz1))):.3e} "
            f"err_dz={err_dz:.3e} err_nu={err_nu:.3e} "
            f"Hmax={float(jnp.max(jnp.abs(H))):.3e}"
        )
        state = solver.step(state)
