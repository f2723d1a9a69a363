"""Single-instance (B=1) solve-latency comparison across KKT backends.

The cyclic-reduction backend (solver/kkt_cr.py) exists to cut the latency
of a single/interactive solve — the role Ipopt's multifrontal factorization
plays for the reference's one-problem-at-a-time workflow
(/root/reference/README.md:93).  This script measures it: end-to-end IPM
wall time for a fixed iteration count on the canonical Hadamard T=51
config, at B=1 and B=8, for each KKT backend.

Usage:  python scripts/tpu_b1_latency.py [--cpu] [--iters N] [--T N]
Prints one JSON line per (backend, batch) and a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--T", type=int, default=51)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument(
        "--backends", type=str, default="xla,lanes,cr",
        help="comma list of xla,lanes,cr",
    )
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import quantumcollocation_tpu as qct

    dtype = jnp.float64 if (
        jax.default_backend() == "cpu" and jax.config.jax_enable_x64
    ) else jnp.float32

    cpu0 = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu0):
        sys_q = qct.QuantumSystem(
            qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]]
        )
    results = {}
    for backend in [b.strip() for b in args.backends.split(",")]:
        for B in (1, 8):
            # build on the CPU device: each eager build op is a relay round
            # trip on the tunneled TPU runtime (CLAUDE.md / bench._build_ctx)
            with jax.default_device(cpu0):
                prob = qct.UnitarySmoothPulseProblem(
                    sys_q, qct.GATES["H"], args.T, 0.2, Q=1e4, R=1e-3,
                    ipopt_options=qct.SolverOptions(
                        print_level=1, tol=1e-5, kkt_backend=backend,
                        matmul_precision="highest",
                    ),
                    piccolo_options=qct.PiccoloOptions(verbose=False),
                    rng=np.random.default_rng(0),
                )
                solver = prob.solver
                z0 = np.asarray(prob.initial_decision(1))[0]
            a_sl = prob.trajectory.comp_slice("a")

            def seeds(seed):
                rng = np.random.default_rng(seed)
                Z0 = np.broadcast_to(z0, (B, *z0.shape)).copy()
                Z0[:, 1:-1, a_sl] += 0.05 * rng.standard_normal(
                    (B, args.T - 2, a_sl.stop - a_sl.start)
                )
                return Z0

            solve = jax.jit(
                lambda z: solver._solve_loop(solver.init_state(z), args.iters)
            )
            t0 = time.perf_counter()
            st = solve(jnp.asarray(seeds(7), dtype))
            jax.block_until_ready(st)
            compile_s = time.perf_counter() - t0
            times = []
            for rep in range(args.repeats):
                Zj = jnp.asarray(seeds(42 + rep), dtype)
                jax.block_until_ready(Zj)
                t0 = time.perf_counter()
                st = solve(Zj)
                jax.block_until_ready(st)
                _ = float(np.asarray(st.kkt_err).sum())  # force host read
                times.append(time.perf_counter() - t0)
            wall = min(times)
            rec = {
                "backend": backend,
                "B": B,
                "iters": args.iters,
                "T": args.T,
                "wall_s": round(wall, 4),
                "ms_per_iter": round(1e3 * wall / args.iters, 3),
                "compile_s": round(compile_s, 1),
                "kkt_err_min": float(np.asarray(st.kkt_err).min()),
                "converged_frac": float(np.asarray(st.converged).mean()),
                "jax_backend": jax.default_backend(),
            }
            results[f"{backend}_B{B}"] = rec
            print(json.dumps(rec), flush=True)

    if "cr_B1" in results and "xla_B1" in results:
        print(json.dumps({
            "summary": "cr_vs_xla_B1_speedup",
            "value": round(
                results["xla_B1"]["wall_s"] / results["cr_B1"]["wall_s"], 3
            ),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
