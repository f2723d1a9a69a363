"""Real-TPU demo: DensityOperatorSmoothPulseProblem on CatSystem(cat_levels=8).

VERDICT r4 stretch item: prove the Krylov/expv work carries a REAL
open-system solve, not just rollouts.  cat(8) x buffer(2) = 16 levels:
iso-vec density state dim 512, NLP d=518 per knot — solved on the chip
(xla KKT backend; far beyond the lanes families), then validated with the
MATRIX-FREE Krylov rollout (integrator="expv" through
OpenQuantumSystem.lindblad_action) on the host.

Writes artifacts/tpu_cat_density_r05.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def _cpu():
    return jax.default_device(jax.local_devices(backend="cpu")[0])


T, dt, iters = 8, 1.0, 60
t_all = time.perf_counter()
with _cpu():
    sys_o = qct.CatSystem(cat_levels=8, buffer_levels=2)
    N = sys_o.levels
    psi0 = np.zeros(N, complex)
    psi0[0] = 1.0
    psi_goal = np.asarray(qct.coherent_ket(1.0, 8))
    psi_goal = np.kron(psi_goal, np.eye(2)[:, 0])
    t0 = time.perf_counter()
    prob = qct.DensityOperatorSmoothPulseProblem(
        sys_o, psi0, psi_goal, T, dt, Q=2e3, a_bound=2.0,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-5, matmul_precision="highest",
            kkt_backend="xla",
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        rng=np.random.default_rng(0),
    )
    build_s = time.perf_counter() - t0
    print(f"build {build_s:.0f}s d={prob.solver.nlp.d}", file=sys.stderr,
          flush=True)
    f0 = float(qct.open_rollout_fidelity(
        prob.trajectory, sys_o, psi_goal, integrator="expv"
    ))

solver = prob.solver
t0 = time.perf_counter()
# segment_iters keeps every device call far under the relay's ~100 s
# single-call kill threshold; IPMState chains exactly across segments
prob.solve(max_iter=iters, segment_iters=2)
res = prob.result
solve_s = time.perf_counter() - t0
print(f"solve {solve_s:.0f}s", file=sys.stderr, flush=True)

with _cpu():
    f1 = float(qct.open_rollout_fidelity(
        prob.trajectory, sys_o, psi_goal, integrator="expv"
    ))

out = {
    "levels": N, "T": T, "dt": dt, "iters": iters,
    "kkt_err": float(np.asarray(res.kkt_err)[0]),
    "n_iter": int(np.asarray(res.n_iter)[0]),
    "nlp_d": solver.nlp.d, "build_s": round(build_s, 1),
    "solve_wall_s": round(solve_s, 1),
    "krylov_rollout_fidelity_before": f0,
    "krylov_rollout_fidelity_after": f1,
    "total_s": round(time.perf_counter() - t_all, 1),
}
print(json.dumps(out))
with open("artifacts/tpu_cat_density_r05.json", "w") as f:
    json.dump(out, f, indent=1)
