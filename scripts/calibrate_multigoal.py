"""Calibrate multigoal test config: iters/T needed for random SU(2) goals."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.problems import (
    UnitaryMultiGoalProblem,
    multigoal_initial_decisions,
    multigoal_rollout_fidelities,
    random_su,
)


def run(T, iters, n_seeds, sigma):
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = UnitaryMultiGoalProblem(
        sys, T, 0.2,
        Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
    )
    rng = np.random.default_rng(42)
    goals = [np.asarray(qct.GATES["H"]), random_su(2, rng), random_su(2, rng)]
    Z0 = multigoal_initial_decisions(
        prob, goals, n_seeds_per_goal=n_seeds, sigma=sigma, rng=rng
    )
    res = prob.solve_batched(np.asarray(Z0), max_iter=iters)
    fids = multigoal_rollout_fidelities(
        prob, np.asarray(res.Z), goals, n_seeds_per_goal=n_seeds
    )
    per_goal = fids.reshape(len(goals), n_seeds)
    print(f"T={T} iters={iters} seeds={n_seeds} sigma={sigma}: "
          f"best={per_goal.max(axis=1)} conv={np.asarray(res.converged)}")
    # direct comparison solve for goal 0
    direct = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], T, 0.2, Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
    )
    direct.solve(max_iter=iters)
    print(f"  direct hadamard fid="
          f"{float(qct.unitary_rollout_fidelity(direct.trajectory, sys)):.8f}")


if __name__ == "__main__":
    run(T=40, iters=120, n_seeds=2, sigma=0.2)
    run(T=50, iters=120, n_seeds=2, sigma=0.2)
