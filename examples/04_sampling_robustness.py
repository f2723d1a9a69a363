"""Robust pulse design by sampling systems with parameter uncertainty.

One control pulse must realize the gate on several drift-perturbed systems
simultaneously (shared controls, per-system dynamics defects) — the
reference's UnitarySamplingProblem workflow.
"""

import numpy as np

import quantumcollocation_tpu as qct


def main():
    def sys_with_drift(zeta):
        return qct.QuantumSystem(
            zeta * qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]]
        )

    prob = qct.UnitarySamplingProblem(
        [sys_with_drift(0.0), sys_with_drift(0.05), sys_with_drift(-0.05)],
        qct.GATES["H"], 50, 0.2,
        ipopt_options=qct.SolverOptions(print_level=3, tol=1e-6),
        piccolo_options=qct.PiccoloOptions(verbose=False),
    )
    prob.solve(max_iter=40)

    # sweep the drift perturbation and report fidelities of the shared pulse
    v0 = qct.operator_to_iso_vec(np.eye(2, dtype=complex))
    goal = qct.operator_to_iso_vec(qct.GATES["H"])
    a = prob.trajectory["a"]
    dts = prob.trajectory.get_timesteps()
    for zeta in np.arange(-0.05, 0.051, 0.025):
        Us = qct.unitary_rollout(v0, a, dts, sys_with_drift(zeta))
        f = float(qct.iso_vec_unitary_fidelity(Us[-1], goal))
        print(f"zeta={zeta:+.3f}: fidelity {f:.5f}")


if __name__ == "__main__":
    main()
