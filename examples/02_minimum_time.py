"""Minimum-time gate synthesis: solve smooth pulse, then minimize duration
under a fidelity floor — the reference's core problem-chaining workflow
(/root/reference/src/problem_templates/unitary_minimum_time_problem.jl:151-171).
"""

import numpy as np

import quantumcollocation_tpu as qct


def main():
    system = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    T, dt = 51, 0.2

    # stage 1: fixed-time smooth pulse
    prob = qct.UnitarySmoothPulseProblem(
        system, qct.GATES["H"], T, dt,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
    )
    prob.solve(max_iter=60)
    print("smooth fidelity:",
          float(qct.unitary_rollout_fidelity(prob.trajectory, system)))

    # stage 2: free-time warm start from the solved trajectory, minimum time
    traj2 = qct.resample_free_time(prob.trajectory)
    print("duration before:", float(traj2.duration()))
    mt = qct.UnitaryMinimumTimeProblem(
        traj2, system, prob.get_objective(), prob.integrators, [],
        final_fidelity=0.99, D=10.0,
        ipopt_options=qct.SolverOptions(print_level=3, tol=1e-6),
    )
    mt.solve(max_iter=60)
    print("duration after:", float(mt.trajectory.duration()))
    print("fidelity after:",
          float(qct.unitary_rollout_fidelity(mt.trajectory, system)))


if __name__ == "__main__":
    main()
