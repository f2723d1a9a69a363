"""Lanes-backend iteration/batch sweep: find the throughput-optimal bench
operating point (iters where frac_ok(rollout infid <= 1e-4) stays high).

Inputs are re-perturbed per timing repeat to defeat the axon relay's
identical-input result caching (see memory: axon-tpu-measurement-gotchas).
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
from quantumcollocation_tpu.ops.native import unitary_rollout_fidelity_native

T, dt = 51, 0.2
sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])

goal_iso = np.asarray(qct.operator_to_iso_operator(qct.GATES["H"]))


def build(kmu):
    return qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-5, matmul_precision="highest",
            kkt_backend="lanes", kappa_mu=kmu,
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )


def frac_ok(prob, solver, state):
    Z = solver.unscale(np.asarray(state.Z))
    a_sl = prob.trajectory.comp_slice("a")
    dts_sl = prob.trajectory.comp_slice("Δt")
    a_all = Z[:, :, a_sl].astype(np.float64)
    dts_all = Z[:, :, dts_sl][:, :, 0].astype(np.float64)
    fids = unitary_rollout_fidelity_native(
        np.asarray(sys_q.G_drift), np.asarray(sys_q.G_drives),
        a_all, dts_all, goal_iso,
    )
    infid = 1.0 - fids
    return float(np.mean(infid <= 1e-4)), float(np.median(infid))


def main():
    for kmu in [0.1, 0.2]:
        prob = build(kmu)
        solver = prob.solver
        for B, iters_list in [(512, [30, 40]), (1024, [40])]:
            for iters in iters_list:
                solve = jax.jit(
                    lambda z, it=iters: solver._solve_loop(
                        solver.init_state(z), it
                    )
                )
                z_warm = jnp.asarray(
                    prob.multistart_initial_decisions(
                        B, sigma=0.1, rng=np.random.default_rng(1)
                    ),
                    jnp.float32,
                )
                st = solve(z_warm)  # compile + warm
                jax.block_until_ready(st)
                walls, fracs, meds = [], [], []
                for rep in range(2):
                    z = jnp.asarray(
                        prob.multistart_initial_decisions(
                            B, sigma=0.1,
                            rng=np.random.default_rng(rep * 7 + iters),
                        ),
                        jnp.float32,
                    )
                    jax.block_until_ready(z)
                    t0 = time.perf_counter()
                    st = solve(z)
                    jax.block_until_ready(st)
                    _ = float(np.asarray(st.kkt_err).sum())
                    walls.append(time.perf_counter() - t0)
                    fr, md = frac_ok(prob, solver, st)
                    fracs.append(fr)
                    meds.append(md)
                wall = min(walls)
                fr = float(np.mean(fracs))
                print(
                    json.dumps(
                        {
                            "kappa_mu": kmu, "B": B, "iters": iters,
                            "wall": round(wall, 3), "frac_ok": fr,
                            "median_infid": float(np.median(meds)),
                            "good_solves_per_s": round(B * fr / wall, 1),
                        }
                    ),
                    flush=True,
                )
    print("SWEEP DONE", flush=True)


if __name__ == "__main__":
    main()
