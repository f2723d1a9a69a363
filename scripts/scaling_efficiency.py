"""Weak-scaling efficiency of the batched solve over a device mesh.

BASELINE.md metric #3: 1->N scaling efficiency >= 80%.  The design
(parallel/mesh.py, SURVEY.md §5) shards ONLY the instance batch; each KKT
system stays device-local, so the only collective XLA inserts is the scalar
all-converged vote per while_loop trip — weak scaling should be near-ideal
as long as per-device batch is constant.

Without pod hardware this script demonstrates the measurement on a virtual
CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N); on a real
multi-host pod, initialize jax.distributed.initialize() first and use the
same code (the mesh spans all global devices; each host feeds its local
shard via jax.make_array_from_process_local_data).

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling_efficiency.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import quantumcollocation_tpu as qct
    from quantumcollocation_tpu.parallel import batched_solve, make_mesh

    sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], 25, 0.2,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-5),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )
    per_device = 8
    iters = 15
    n_all = len(jax.devices())
    results = {}
    for n_dev in [1, 2, 4, n_all]:
        if n_dev > n_all or n_dev in results:
            continue
        mesh = make_mesh(n_dev)
        B = per_device * n_dev
        Z0 = jnp.asarray(
            prob.multistart_initial_decisions(
                B, sigma=0.1, rng=np.random.default_rng(7)
            )
        )
        # warm (compile)
        res = batched_solve(prob, Z0, mesh=mesh, max_iter=iters)
        jax.block_until_ready(res.Z)
        t0 = time.perf_counter()
        res = batched_solve(prob, Z0, mesh=mesh, max_iter=iters)
        jax.block_until_ready(res.Z)
        wall = time.perf_counter() - t0
        results[n_dev] = B / wall
        print(
            json.dumps(
                {
                    "devices": n_dev,
                    "batch": B,
                    "wall_s": round(wall, 3),
                    "solves_per_s": round(B / wall, 2),
                }
            ),
            flush=True,
        )
    base = results[1]
    for n_dev, thr in sorted(results.items()):
        eff = thr / (base * n_dev)
        print(
            json.dumps(
                {"devices": n_dev, "weak_scaling_efficiency": round(eff, 3)}
            ),
            flush=True,
        )
    if jax.default_backend() == "cpu":
        print(
            "# NOTE: on a virtual CPU mesh the N 'devices' share the host's"
            " physical cores, so weak-scaling efficiency here measures core"
            " contention, not interconnect scaling. On a real pod each chip"
            " has dedicated compute and the per-device work is identical"
            " with a single scalar collective per while_loop trip — the"
            " design-level scaling bound is the all-reduce latency, not"
            " bandwidth.",
            flush=True,
        )


if __name__ == "__main__":
    main()
