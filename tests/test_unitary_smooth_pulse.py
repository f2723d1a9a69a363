"""UnitarySmoothPulseProblem behavior tests.

Mirrors the reference's inline test items
(/root/reference/src/problem_templates/unitary_smooth_pulse_problem.jl:205-373):
rollout-fidelity improvement, exponential integrator, bounded states +
control norm constraint, embedded operators + leakage suppression,
objective additivity, free phases.
"""

import numpy as np
import pytest

import quantumcollocation_tpu as qct

TOL = qct.SolverOptions(print_level=1, tol=1e-6)


def _hadamard_system():
    return qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])


class TestHadamard:
    def test_pade_rollout_improves(self):
        sys = _hadamard_system()
        prob = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 51, 0.2,
            da_bound=1.0,
            ipopt_options=TOL,
            piccolo_options=qct.PiccoloOptions(verbose=False),
        )
        initial = qct.unitary_rollout_fidelity(prob.trajectory, sys)
        prob.solve(max_iter=20)
        final = qct.unitary_rollout_fidelity(prob.trajectory, sys)
        assert float(final) > float(initial)

    def test_exponential_integrator(self):
        sys = _hadamard_system()
        prob = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 51, 0.2,
            ipopt_options=TOL,
            piccolo_options=qct.PiccoloOptions(
                verbose=False, integrator="exponential"
            ),
        )
        initial = qct.unitary_rollout_fidelity(prob.trajectory, sys)
        prob.solve(max_iter=20)
        final = qct.unitary_rollout_fidelity(prob.trajectory, sys)
        assert float(final) > float(initial)

    def test_high_fidelity_convergence(self):
        # the full solve reaches the NLP optimum (>=0.999 rollout fidelity)
        sys = _hadamard_system()
        prob = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 51, 0.2,
            ipopt_options=qct.SolverOptions(print_level=1, tol=1e-8),
            piccolo_options=qct.PiccoloOptions(verbose=False),
        )
        prob.solve(max_iter=60)
        assert bool(prob.result.converged[0])
        final = qct.unitary_rollout_fidelity(prob.trajectory, sys)
        assert float(final) > 0.999

    def test_bounded_state_and_control_norm(self):
        sys = _hadamard_system()
        prob = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 51, 0.2,
            ipopt_options=TOL,
            piccolo_options=qct.PiccoloOptions(
                verbose=False,
                integrator="exponential",
                bound_state=True,
                complex_control_norm_constraint_name="a",
            ),
        )
        initial = qct.unitary_rollout_fidelity(prob.trajectory, sys)
        prob.solve(max_iter=20)
        final = qct.unitary_rollout_fidelity(prob.trajectory, sys)
        assert float(final) > float(initial)
        # norm constraint holds: |a_re + i a_im| <= 1 at every knot
        a = np.asarray(prob.trajectory["a"])
        norms = np.sqrt(a[:, 0] ** 2 + a[:, 1] ** 2)
        assert np.all(norms <= 1.0 + 1e-6)


class TestQuasiNewton:
    def test_lbfgs_beats_gauss_newton(self):
        # eval_hessian=False (the reference's quasi-Newton knob): the compact
        # L-BFGS mode should reach markedly better rollout fidelity than the
        # Gauss-Newton fallback within the same iteration budget
        sys = _hadamard_system()
        fids = {}
        for qn in ("lbfgs", "gauss-newton"):
            prob = qct.UnitarySmoothPulseProblem(
                sys, qct.GATES["H"], 31, 0.2,
                ipopt_options=qct.SolverOptions(
                    print_level=1, tol=1e-6, quasi_newton=qn
                ),
                piccolo_options=qct.PiccoloOptions(
                    verbose=False, eval_hessian=False, free_time=False
                ),
                rng=np.random.default_rng(0),
            )
            initial = float(qct.unitary_rollout_fidelity(prob.trajectory, sys))
            prob.solve(max_iter=120)
            fids[qn] = float(qct.unitary_rollout_fidelity(prob.trajectory, sys))
            assert fids[qn] > initial
        assert fids["lbfgs"] > fids["gauss-newton"]
        assert fids["lbfgs"] > 0.99


class TestEmbeddedOperator:
    def test_embedded_hadamard(self):
        a_op = qct.annihilate(3)
        sys = qct.QuantumSystem(
            [(a_op + a_op.conj().T) / 2, (a_op - a_op.conj().T) / 2j]
        )
        U_goal = qct.EmbeddedOperator(qct.GATES["H"], sys)
        prob = qct.UnitarySmoothPulseProblem(
            sys, U_goal, 51, 0.2,
            ipopt_options=TOL,
            piccolo_options=qct.PiccoloOptions(verbose=False),
        )
        initial = qct.unitary_rollout_fidelity(
            prob.trajectory, sys, subspace=U_goal.subspace
        )
        prob.solve(max_iter=20)
        final = qct.unitary_rollout_fidelity(
            prob.trajectory, sys, subspace=U_goal.subspace
        )
        assert float(final) > float(initial)

    def test_leakage_suppression(self):
        a_op = qct.annihilate(4)
        sys = qct.QuantumSystem(
            [(a_op + a_op.conj().T) / 2, (a_op - a_op.conj().T) / 2j]
        )
        U_goal = qct.EmbeddedOperator(qct.GATES["H"], sys)
        prob = qct.UnitarySmoothPulseProblem(
            sys, U_goal, 50, 0.2,
            ipopt_options=TOL,
            piccolo_options=qct.PiccoloOptions(
                verbose=False, leakage_suppression=True, R_leakage=1e-1
            ),
        )
        # slack component exists
        assert any("l1_slack" in n for n in prob.trajectory.names)
        initial = qct.unitary_rollout_fidelity(
            prob.trajectory, sys, subspace=U_goal.subspace
        )
        prob.solve(max_iter=20)
        final = qct.unitary_rollout_fidelity(
            prob.trajectory, sys, subspace=U_goal.subspace
        )
        assert float(final) > float(initial)


class TestObjectiveAdditivity:
    def test_additional_objective(self):
        sys = _hadamard_system()
        kwargs = dict(
            ipopt_options=TOL,
            piccolo_options=qct.PiccoloOptions(verbose=False),
            rng=np.random.default_rng(0),
        )
        prob_vanilla = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 50, 0.2, **kwargs
        )
        J_extra = qct.QuadraticSmoothnessRegularizer(
            "dda", prob_vanilla.trajectory, 10.0
        )
        prob_additional = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 50, 0.2,
            additional_objective=J_extra,
            **kwargs,
        )
        J_vanilla = prob_vanilla.get_objective()
        J_total = prob_additional.get_objective()
        traj = prob_vanilla.trajectory
        np.testing.assert_allclose(
            float(J_vanilla.L(traj)) + float(J_extra.L(traj)),
            float(J_total.L(traj)),
            rtol=1e-10,
        )


class TestFreePhase:
    def test_free_phase_y_gate_using_x(self):
        phase_operators = [qct.PAULIS["Z"]]
        sys = qct.QuantumSystem([qct.PAULIS["X"]])
        prob = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["Y"], 51, 0.2,
            phase_operators=phase_operators,
            phase_name="ϕ",
            ipopt_options=TOL,
            piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
            rng=np.random.default_rng(1234),
        )
        before = np.asarray(prob.trajectory.global_data["ϕ"]).copy()
        prob.solve(max_iter=50)
        after = np.asarray(prob.trajectory.global_data["ϕ"])
        assert not np.allclose(before, after)

        f_with_phase = qct.unitary_rollout_fidelity(
            prob.trajectory, sys,
            phases=prob.trajectory.global_data["ϕ"],
            phase_operators=phase_operators,
        )
        f_without = qct.unitary_rollout_fidelity(prob.trajectory, sys)
        assert float(f_with_phase) > 0.9
        assert float(f_without) < 0.9

    def test_matrix_pair_overload(self):
        prob = qct.UnitarySmoothPulseProblem(
            qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]],
            qct.GATES["H"], 30, 0.2,
            ipopt_options=TOL,
            piccolo_options=qct.PiccoloOptions(verbose=False),
        )
        assert prob.system.n_drives == 2
