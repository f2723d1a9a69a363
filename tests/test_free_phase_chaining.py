"""Free-phase minimum-time chaining: the FreePhase fidelity constraint's
global-slice injection must compile and solve."""

import numpy as np

import quantumcollocation_tpu as qct


def test_free_phase_min_time_compiles_and_steps():
    phase_operators = [qct.PAULIS["Z"]]
    sys = qct.QuantumSystem([qct.PAULIS["X"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["Y"], 31, 0.2,
        phase_operators=phase_operators,
        phase_name="ϕ",
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-6),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(1234),
    )
    prob.solve(max_iter=30)

    mt = qct.UnitaryMinimumTimeProblem(
        prob, sys,
        phase_operators=phase_operators,
        phase_name="ϕ",
        D=5.0,
    )
    # the free-phase fidelity constraint reads phases from the global tail
    assert mt.global_slices["ϕ"][1] - mt.global_slices["ϕ"][0] == 1
    dur0 = float(mt.trajectory.duration())
    mt.solve(max_iter=20)
    assert np.isfinite(np.asarray(mt.trajectory.data)).all()
    # phases survived the round trip
    assert "ϕ" in mt.trajectory.global_data
