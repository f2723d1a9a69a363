"""TPU A/B measurement: lanes vs xla KKT backends + component timings,
with host-validated rollout infidelity (the bench.py success metric).

Run on the real chip (one process, patient with the grant):
    timeout 3500 python -u scripts/tpu_ab.py > /tmp/tpu_ab.log 2>&1
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

T, dt = 51, 0.2
sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])


def build(backend):
    return qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-5, matmul_precision="highest",
            kkt_backend=backend,
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / reps, out


def frac_converged(prob, solver, state, B):
    """Host-validated f64 rollout infidelity <= 1e-4 fraction."""
    from quantumcollocation_tpu.ops.native import unitary_rollout_fidelity_native

    Z = solver.unscale(np.asarray(state.Z))
    a_sl = prob.trajectory.comp_slice("a")
    dts_sl = prob.trajectory.comp_slice("Δt")
    a_all = Z[:, :, a_sl].astype(np.float64)
    dts_all = Z[:, :, dts_sl][:, :, 0].astype(np.float64)
    goal_iso = np.asarray(qct.operator_to_iso_operator(qct.GATES["H"]))
    fids = unitary_rollout_fidelity_native(
        np.asarray(sys_q.G_drift), np.asarray(sys_q.G_drives),
        a_all, dts_all, goal_iso,
    )
    return float(np.mean(1.0 - fids <= 1e-4)), float(np.median(1.0 - fids))


def main():
    for backend in ["xla", "lanes"]:
        prob = build(backend)
        solver = prob.solver
        for B in [256, 512]:
            Z0 = prob.multistart_initial_decisions(
                B, sigma=0.1, rng=np.random.default_rng(42)
            )
            Z0j = jnp.asarray(Z0, jnp.float32)
            for iters in [60, 100]:
                solve = jax.jit(
                    lambda z, it=iters: solver._solve_loop(
                        solver.init_state(z), it
                    )
                )
                t0 = time.perf_counter()
                st = solve(Z0j)
                jax.block_until_ready(st)
                compile_s = time.perf_counter() - t0
                wall, st = timed(solve, Z0j, reps=1)
                frac, med = frac_converged(prob, solver, st, B)
                print(
                    json.dumps(
                        {
                            "what": "solve", "backend": backend, "B": B,
                            "iters": iters, "wall": round(wall, 3),
                            "compile": round(compile_s, 1),
                            "frac_ok": frac, "median_infid": med,
                            "good_solves_per_s": round(B * frac / wall, 1),
                        }
                    ),
                    flush=True,
                )

        # component timings at B=256
        B = 256
        Z0 = prob.multistart_initial_decisions(
            B, sigma=0.1, rng=np.random.default_rng(1)
        )
        state = jax.jit(solver.init_state)(jnp.asarray(Z0, jnp.float32))
        jax.block_until_ready(state)
        with jax.default_matmul_precision("highest"):
            pre = jax.jit(lambda s: jax.vmap(solver._iteration_pre)(s))
            t_pre, (kkt_in, aux) = timed(pre, state)
            kb = jax.jit(lambda ki, dw: solver._solve_kkt_batched(ki, dw))
            t_kkt, _ = timed(kb, kkt_in, state.delta_w)
            stp = jax.jit(solver._step_impl)
            t_step, _ = timed(stp, state)
        print(
            json.dumps(
                {
                    "what": "components", "backend": backend, "B": B,
                    "pre_ms": round(t_pre * 1e3, 1),
                    "kkt_ms": round(t_kkt * 1e3, 1),
                    "step_ms": round(t_step * 1e3, 1),
                }
            ),
            flush=True,
        )
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
