"""Free-phase fidelity behavior + minimum-time chaining.

Reference: UnitaryFreePhaseFidelityConstraint / free-phase objectives
(/root/reference/src/problem_templates/unitary_minimum_time_problem.jl:113-127);
behavioral bar mirrors the reference's rollout-validated style — the
collocation state is never trusted without a rollout check.

Calibrated (CPU f64): X-drive-only system cannot reach GATES["Y"] exactly
(plain rollout fidelity ~0.0) but reaches it up to a global Z-phase
(free-phase rollout fidelity 0.9999997, phase ~ -3π/2); min-time chaining
shortens 7.65 -> 3.0 time units while holding free-phase fidelity 0.999998.
"""

import numpy as np

import quantumcollocation_tpu as qct


def test_free_phase_solves_what_plain_fidelity_cannot():
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
    prob.solve(max_iter=60)
    phases = np.asarray(prob.trajectory.global_data["ϕ"])
    f_plain = float(qct.unitary_rollout_fidelity(prob.trajectory, sys))
    f_phase = float(
        qct.unitary_rollout_fidelity(
            prob.trajectory, sys,
            phases=phases, phase_operators=phase_operators,
        )
    )
    # an X-only drive cannot produce Y exactly — only up to a Z-phase
    assert f_plain < 0.5
    assert f_phase > 0.999


def test_free_phase_min_time_shortens_and_holds_fidelity():
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
    prob.solve(max_iter=60)

    mt = qct.UnitaryMinimumTimeProblem(
        prob, sys,
        phase_operators=phase_operators,
        phase_name="ϕ",
        D=50.0,
        final_fidelity=0.98,
    )
    # the free-phase fidelity constraint reads phases from the global tail
    assert mt.global_slices["ϕ"][1] - mt.global_slices["ϕ"][0] == 1
    dur0 = float(mt.trajectory.duration())
    mt.solve(max_iter=100)
    assert np.isfinite(np.asarray(mt.trajectory.data)).all()
    assert "ϕ" in mt.trajectory.global_data

    # behavior: duration strictly shortens AND the free-phase rollout
    # fidelity stays above the floor (calibrated 7.65 -> 3.0 at 0.999998)
    dur1 = float(mt.trajectory.duration())
    assert dur1 < 0.9 * dur0, (dur0, dur1)
    phases = np.asarray(mt.trajectory.global_data["ϕ"])
    f_mt = float(
        qct.unitary_rollout_fidelity(
            mt.trajectory, sys,
            phases=phases, phase_operators=phase_operators,
        )
    )
    assert f_mt >= 0.98 - 1e-4, f_mt
