"""Benchmark: batched single-qubit Hadamard gate synthesis (BASELINE config #1).

Measures batched gate-synthesis solves/s/chip at rollout infidelity <= 1e-4:
a batch of multi-start seeds of the README Hadamard problem
(UnitarySmoothPulseProblem, PAULIS X/Y drives, T=51, dt=0.2) is solved in
lockstep by the batched IPM; throughput counts instances whose final f64
host-validated rollout infidelity meets the target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the BASELINE.json north star of 10k solves/s
on a v5e-64, i.e. 156.25 solves/s/chip.

Usage: python bench.py [--batch B] [--iters N] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _f64_rollout_fidelity(a, dts, H_drift, H_drives, U_goal):
    """Host-side f64 ground-truth rollout (scipy expm)."""
    import scipy.linalg as sla

    U = np.eye(U_goal.shape[0], dtype=complex)
    for t in range(a.shape[0] - 1):
        H = H_drift + sum(a[t, j] * H_drives[j] for j in range(a.shape[1]))
        U = sla.expm(-1j * H * dts[t]) @ U
    n = U.shape[0]
    return abs(np.trace(U_goal.conj().T @ U)) / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=512)
    # sweep-tuned (v5e-1, filter line search + analytic Pallas bank):
    # 44 iters -> frac_ok 0.986 at 576 solves/s/chip; 40 -> 0.96 at 618;
    # 48 -> 1.00 at 535
    parser.add_argument("--iters", type=int, default=44)
    parser.add_argument("--kappa-mu", dest="kappa_mu", type=float, default=0.1)
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--precision", type=str, default="highest")
    # "high" (3-pass) is enough for the residual XLA evaluation now that the
    # propagator/derivative bank runs in the Pallas kernel at true f32
    # (with the old all-XLA assembly, "high" lost converged fraction)
    parser.add_argument(
        "--eval-precision", dest="eval_precision", type=str, default="high",
    )
    # default: Pallas lanes kernels on TPU (measured ~8-16x faster than the
    # vmapped-XLA path for this KKT size), XLA path on CPU (lanes would run
    # in the slow Pallas interpreter there)
    parser.add_argument(
        "--kkt-backend", dest="kkt_backend", type=str, default=None
    )
    parser.add_argument(
        "--line-search", dest="line_search", type=str, default="filter"
    )
    parser.add_argument(
        "--mu-strategy", dest="mu_strategy", type=str, default="monotone"
    )
    args = parser.parse_args()
    if args.smoke:
        args.batch, args.iters, args.repeats = 8, 30, 1

    import jax

    if args.cpu:
        # note: the environment's sitecustomize pins jax_platforms to
        # "axon,cpu"; an explicit config update is required to override it
        jax.config.update("jax_platforms", "cpu")
    if args.kkt_backend is None:
        args.kkt_backend = "lanes" if jax.default_backend() == "tpu" else "xla"

    import jax.numpy as jnp

    import quantumcollocation_tpu as qct

    B, T, dt = args.batch, 51, 0.2
    sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    # Q/R chosen so the NLP optimum is well below the 1e-4 infidelity target
    # (the README default Q=100, R=1e-2 optimum sits at ~2.7e-4)
    prob = qct.UnitarySmoothPulseProblem(
        sys_q,
        qct.GATES["H"],
        T,
        dt,
        Q=1e4,
        R=1e-3,
        ipopt_options=qct.SolverOptions(
            print_level=1,
            tol=1e-5,
            matmul_precision=args.precision,
            eval_precision=args.eval_precision,
            kkt_backend=args.kkt_backend,
            kappa_mu=args.kappa_mu,
            line_search=args.line_search,
            mu_strategy=args.mu_strategy,
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )
    solver = prob.solver

    # multi-start seeds: perturb the control rows of the initial decision.
    # Each timing repeat gets FRESH seeds: the TPU relay caches results for
    # identical (executable, input) pairs, so repeating one input would
    # under-report wall time.
    z0 = np.asarray(prob.initial_decision(1)[0])
    a_sl = prob.trajectory.comp_slice("a")

    def seeds(seed):
        rng = np.random.default_rng(seed)
        Z0 = np.broadcast_to(z0, (B, *z0.shape)).copy()
        Z0[:, 1:-1, a_sl] += 0.1 * rng.standard_normal(
            (B, T - 2, a_sl.stop - a_sl.start)
        )
        return Z0

    dtype = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    )

    solve = jax.jit(
        lambda z: solver._solve_loop(solver.init_state(z), args.iters)
    )

    # warmup/compile
    print(f"[bench] built problem, compiling...", file=sys.stderr, flush=True)
    t_c0 = time.perf_counter()
    state = solve(jnp.asarray(seeds(7), dtype))
    jax.block_until_ready(state)
    print(
        f"[bench] compile+first solve: {time.perf_counter() - t_c0:.1f}s",
        file=sys.stderr,
        flush=True,
    )

    times = []
    for rep in range(args.repeats):
        Z0j = jnp.asarray(seeds(42 + rep), dtype)
        jax.block_until_ready(Z0j)
        t0 = time.perf_counter()
        state = solve(Z0j)
        jax.block_until_ready(state)
        # force a real host read (async-dispatch safety on the relay)
        _ = float(np.asarray(state.kkt_err).sum())
        times.append(time.perf_counter() - t0)
    wall = min(times)

    # host-side f64 validation of final rollout infidelity: prefer the
    # native C++ validator (validates the full batch), fall back to scipy
    Z = solver.unscale(np.asarray(state.Z))
    dts_sl = prob.trajectory.comp_slice("Δt")
    a_all = Z[:, :, a_sl].astype(np.float64)
    dts_all = Z[:, :, dts_sl][:, :, 0].astype(np.float64)
    try:
        from quantumcollocation_tpu.ops.native import (
            unitary_rollout_fidelity_native,
        )

        goal_iso = np.asarray(qct.operator_to_iso_operator(qct.GATES["H"]))
        fids = unitary_rollout_fidelity_native(
            np.asarray(sys_q.G_drift),
            np.asarray(sys_q.G_drives),
            a_all,
            dts_all,
            goal_iso,
        )
        frac_ok = float(np.mean(1.0 - fids <= 1e-4))
        best_infid = float(np.min(1.0 - fids))
        med_infid = float(np.median(1.0 - fids))
        n_check = B
    except Exception:
        H_drift = np.asarray(sys_q.H_drift)
        H_drives = [np.asarray(h) for h in sys_q.H_drives]
        U_goal = np.asarray(qct.GATES["H"])
        n_ok = 0
        n_check = min(B, 32)
        for b in range(n_check):
            fid = _f64_rollout_fidelity(
                a_all[b], dts_all[b], H_drift, H_drives, U_goal
            )
            if 1.0 - fid <= 1e-4:
                n_ok += 1
        frac_ok = n_ok / n_check

    solves_per_s = B * frac_ok / wall
    baseline_per_chip = 10000.0 / 64.0
    print(
        json.dumps(
            {
                "metric": "hadamard_solves_per_s_per_chip_at_infid_1e-4",
                "value": round(solves_per_s, 3),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_s / baseline_per_chip, 4),
                "detail": {
                    "batch": B,
                    "ipm_iters": args.iters,
                    "wall_s": round(wall, 3),
                    "converged_frac": frac_ok,
                    "best_infid": locals().get("best_infid"),
                    "median_infid": locals().get("med_infid"),
                    "backend": jax.default_backend(),
                    "precision": args.precision,
                    "kkt_backend": args.kkt_backend,
                    "kkt_iters_per_s": round(args.iters * B / wall, 1),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
