"""Ket state transfer and open-system (Lindblad) pulse design."""

import numpy as np

import quantumcollocation_tpu as qct


def main():
    # closed-system ket transfer |0> -> |1>
    sys = qct.QuantumSystem(
        0.1 * qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]]
    )
    prob = qct.QuantumStateSmoothPulseProblem(
        sys, np.array([1, 0]), np.array([0, 1]), 50, 0.2,
        ipopt_options=qct.SolverOptions(print_level=3, tol=1e-6),
        piccolo_options=qct.PiccoloOptions(verbose=False),
    )
    prob.solve(max_iter=40)
    print("ket transfer fidelity:", float(qct.fidelity(prob)))

    # open-system transfer with dissipation
    a_op = qct.annihilate(2)
    open_sys = qct.OpenQuantumSystem(
        qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]], [0.05 * a_op]
    )
    rho0 = np.array([[1, 0], [0, 0]], dtype=complex)
    psi_goal = np.array([0, 1], dtype=complex)
    dprob = qct.DensityOperatorSmoothPulseProblem(
        open_sys, rho0, psi_goal, 30, 0.2,
        ipopt_options=qct.SolverOptions(print_level=3, tol=1e-6),
        piccolo_options=qct.PiccoloOptions(verbose=False),
    )
    dprob.solve(max_iter=40)
    print(
        "open-system fidelity:",
        float(qct.open_rollout_fidelity(dprob.trajectory, open_sys, psi_goal)),
    )


if __name__ == "__main__":
    main()
