"""Single-qubit Hadamard gate synthesis — the README/BASELINE flagship config.

Mirrors the reference's README example (/root/reference/README.md:105-116).
Run: python examples/01_hadamard_gate.py
"""

import numpy as np

import quantumcollocation_tpu as qct


def main():
    system = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    U_goal = qct.GATES["H"]
    T, dt = 51, 0.2

    prob = qct.UnitarySmoothPulseProblem(
        system, U_goal, T, dt,
        ipopt_options=qct.SolverOptions(print_level=3, tol=1e-7),
        piccolo_options=qct.PiccoloOptions(verbose=False),
    )

    f0 = float(qct.unitary_rollout_fidelity(prob.trajectory, system))
    prob.solve(max_iter=60)
    f1 = float(qct.unitary_rollout_fidelity(prob.trajectory, system))

    print(f"rollout fidelity: {f0:.6f} -> {f1:.6f}")
    print(f"duration: {float(prob.trajectory.duration()):.3f}")
    print(f"controls shape: {np.asarray(prob.trajectory['a']).shape}")


if __name__ == "__main__":
    main()
