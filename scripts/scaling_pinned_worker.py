"""Pinned-core weak-scaling worker (VERDICT r3 #7).

Each OS process: 1 CPU core (sched_setaffinity) + 1 XLA CPU device, joined
into one jax.distributed mesh.  Runs the SAME per-process batch (weak
scaling), times the post-compile solve over repeats, and (process 0) audits
the compiled HLO for collectives to show only O(1)-sized reductions cross
processes.

argv: <coordinator_port> <process_id> <num_processes> <batch_per_proc>
      <iters> <repeats>
Prints one JSON line.
"""

import json
import os
import sys
import time

port, pid, nproc, bpp, iters, repeats = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    int(sys.argv[5]), int(sys.argv[6]),
)
# "indep" mode: run concurrently with sibling processes but WITHOUT the
# distributed runtime — isolates pure communication overhead from shared
# memory-bandwidth/background contention
indep = len(sys.argv) > 7 and sys.argv[7] == "indep"

# pin this process to its own physical core BEFORE jax spins up threads
os.sched_setaffinity(0, {pid % os.cpu_count()})
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1"
    ).strip()
# single-threaded math inside each pinned process
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from quantumcollocation_tpu.parallel import init_distributed  # noqa: E402

if nproc > 1 and not indep and pid == 0:
    # the coordination service runs in a separate FLOATING process
    # (scripts/distributed_coordinator.py) so it cannot steal this pinned
    # core (measured: in-process service cost worker 0 ~40% wall).  Patch
    # the service constructor to a no-op so initialize() skips binding.
    from jax._src import distributed as _dist

    class _ExternalService:
        def shutdown(self):
            pass

    _dist._jax.get_distributed_runtime_service = (
        lambda *a, **k: _ExternalService()
    )

if nproc > 1 and not indep:
    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

import jax.numpy as jnp  # noqa: E402

import quantumcollocation_tpu as qct  # noqa: E402
from quantumcollocation_tpu.parallel import make_mesh, shard_batch  # noqa: E402


def main():
    sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], 25, 0.2,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-6),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        rng=np.random.default_rng(0),
    )
    solver = prob.solver
    n_dev = len(jax.devices())
    assert n_dev == (1 if indep else nproc), (n_dev, nproc, indep)
    mesh = make_mesh(n_dev)

    B_global = bpp * n_dev
    Z0_full = prob.multistart_initial_decisions(
        B_global, sigma=0.1, rng=np.random.default_rng(1)
    )

    distributed = nproc > 1 and not indep
    if distributed:
        # production multi-process path (parallel.batched_solve): shard_map
        # makes every loop condition per-shard -> ZERO cross-process
        # collectives during the solve
        from jax.sharding import PartitionSpec as P

        from jax.sharding import NamedSharding

        run = jax.jit(jax.shard_map(
            lambda st: solver._solve_loop_impl(st, iters, False),
            mesh=mesh, in_specs=P("batch"), out_specs=P("batch"),
            check_vma=False,
        ))
        init = jax.jit(
            solver.init_state,
            out_shardings=NamedSharding(mesh, P("batch")),
        )

        def solve(z):
            return run(init(z))

    else:

        def solve(z):
            return solver._solve_loop(solver._init_state_jit(z), iters)

    Zs = shard_batch(jnp.asarray(Z0_full, jnp.float32), mesh)
    jitted = jax.jit(solve)
    st = jitted(Zs)  # compile + warm
    jax.block_until_ready(st.Z)

    # HLO collective audit (process 0): every cross-device op and its size
    collectives = []
    if pid == 0:
        txt = jitted.lower(Zs).compile().as_text()
        for line in txt.splitlines():
            ls = line.strip()
            if any(
                k in ls
                for k in ("all-reduce", "all-gather", "reduce-scatter",
                          "collective-permute")
            ) and "=" in ls and not ls.startswith("//"):
                collectives.append(ls.split(" = ")[0] + " = " +
                                   ls.split(" = ")[1].split("(")[0])

    walls = []
    t_init = []
    for rep in range(repeats):
        Zr = prob.multistart_initial_decisions(
            B_global, sigma=0.1, rng=np.random.default_rng(100 + rep)
        )
        Zrs = shard_batch(jnp.asarray(Zr, jnp.float32), mesh)
        jax.block_until_ready(Zrs)
        t0 = time.perf_counter()
        st0 = solver._init_state_jit(Zrs)
        jax.block_until_ready(st0.Z)
        t1 = time.perf_counter()
        st = jitted(Zrs)
        jax.block_until_ready(st.Z)
        walls.append(time.perf_counter() - t0)
        t_init.append(t1 - t0)

    conv = float(jnp.mean(st.converged.astype(jnp.float32)))
    print(json.dumps({
        "ok": True,
        "pid": pid,
        "nproc": nproc, "indep": indep,
        "batch_per_proc": bpp,
        "iters": iters,
        "walls": [round(w, 4) for w in walls],
        "t_init": [round(w, 4) for w in t_init],
        "wall_min": round(min(walls), 4),
        "converged_frac": conv,
        "collectives": collectives,
    }))


main()
