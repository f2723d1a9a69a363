"""Behavior tests for the remaining problem templates.

Mirrors the reference's inline test items: min-time duration decreases under
a fidelity floor (unitary_minimum_time_problem.jl:169-171), bang-bang
solutions sparser in da (unitary_bang_bang_problem.jl:228-232), sampling
robustness sweeps (unitary_sampling_problem.jl:233-244), state transfer
fidelity improvement, density-operator and direct-sum construction.
"""

import numpy as np
import pytest

import quantumcollocation_tpu as qct

TOL = qct.SolverOptions(print_level=1, tol=1e-6)
QUIET = qct.PiccoloOptions(verbose=False)


def _hadamard_system():
    return qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])


class TestUnitaryMinimumTime:
    def test_duration_decreases_under_fidelity_floor(self):
        sys = _hadamard_system()
        # stage 1: fixed-time smooth solve (the reference's chaining workflow)
        prob = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 51, 0.2,
            ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
            piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        )
        prob.solve(max_iter=60)
        fid_before = float(qct.unitary_rollout_fidelity(prob.trajectory, sys))
        assert fid_before > 0.99

        # stage 2: re-grid to a free-time trajectory seeded with the solved
        # controls, then minimize duration under a fidelity floor
        a_solved = np.asarray(prob.trajectory["a"])
        traj2 = qct.initialize_unitary_trajectory(
            qct.GATES["H"], 51, 0.2, 2,
            [np.ones(2), np.full(2, np.inf), np.ones(2)],
            free_time=True, a_guess=a_solved, system=sys,
        )
        dur_before = float(traj2.duration())
        mt = qct.UnitaryMinimumTimeProblem(
            traj2, sys, prob.get_objective(), prob.integrators, [],
            final_fidelity=0.99, D=10.0,
            ipopt_options=qct.SolverOptions(print_level=1, tol=1e-6),
        )
        mt.solve(max_iter=60)
        dur_after = float(mt.trajectory.duration())
        fid_after = float(qct.unitary_rollout_fidelity(mt.trajectory, sys))

        assert dur_after < dur_before
        # reference asserts fidelity stays >= fid - 10%
        assert fid_after >= 0.99 - 0.1


class TestQuantumStateProblems:
    def test_state_transfer_improves(self):
        sys = qct.QuantumSystem(
            0.1 * qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]]
        )
        prob = qct.QuantumStateSmoothPulseProblem(
            sys, np.array([1, 0]), np.array([0, 1]), 50, 0.2,
            ipopt_options=TOL, piccolo_options=QUIET,
        )
        initial = float(qct.rollout_fidelity(prob.trajectory, sys))
        prob.solve(max_iter=30)
        final = float(qct.rollout_fidelity(prob.trajectory, sys))
        assert final > initial
        assert final > 0.9

    def test_multiple_states_shared_controls(self):
        sys = qct.QuantumSystem(
            0.1 * qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]]
        )
        prob = qct.QuantumStateSmoothPulseProblem(
            sys,
            [np.array([1, 0]), np.array([0, 1])],
            [np.array([0, 1]), np.array([1, 0])],
            40, 0.2,
            ipopt_options=TOL, piccolo_options=QUIET,
        )
        assert "ψ̃1" in prob.trajectory.names
        assert "ψ̃2" in prob.trajectory.names
        prob.solve(max_iter=30)
        f1 = float(
            qct.rollout_fidelity(prob.trajectory, sys, state_name="ψ̃1")
        )
        assert f1 > 0.5

    def test_state_minimum_time_warm_start(self):
        sys = qct.QuantumSystem(
            0.1 * qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]]
        )
        prob = qct.QuantumStateSmoothPulseProblem(
            sys, np.array([1, 0]), np.array([0, 1]), 40, 0.2,
            ipopt_options=TOL, piccolo_options=QUIET,
        )
        prob.solve(max_iter=40)
        dur_before = float(prob.trajectory.duration())
        mt = qct.QuantumStateMinimumTimeProblem(prob, D=10.0)
        mt.solve(max_iter=40)
        assert float(mt.trajectory.duration()) < dur_before


class TestUnitarySampling:
    def test_sampling_robustness_beats_nonrobust(self):
        # systems with drift perturbations; shared controls must work for all
        def sys_with_zeta(z):
            return qct.QuantumSystem(
                z * qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]]
            )

        T, dt = 50, 0.2
        sampled = qct.UnitarySamplingProblem(
            [sys_with_zeta(-0.05), sys_with_zeta(0.0), sys_with_zeta(0.05)],
            qct.GATES["H"], T, dt,
            ipopt_options=TOL, piccolo_options=QUIET,
            rng=np.random.default_rng(1234),
        )
        assert "Ũ⃗_system_1" in sampled.trajectory.names
        assert "Ũ⃗_system_2" in sampled.trajectory.names
        sampled.solve(max_iter=30)

        plain = qct.UnitarySmoothPulseProblem(
            sys_with_zeta(0.0), qct.GATES["H"], T, dt,
            ipopt_options=TOL, piccolo_options=QUIET,
            rng=np.random.default_rng(1234),
        )
        plain.solve(max_iter=30)

        # sweep drift perturbations ζ ∈ -0.05:0.01:0.05 and assert the
        # sampled solve BEATS the non-robust one summed over the sweep —
        # the reference's assertion (unitary_sampling_problem.jl:233-244).
        # Measured margin at this config: 1.14% (scripts/
        # calibrate_behavior_tests.py).
        goal = qct.operator_to_iso_vec(qct.GATES["H"])
        v0 = qct.operator_to_iso_vec(np.eye(2, dtype=complex))
        f_sampled = 0.0
        f_plain = 0.0
        for z in np.arange(-0.05, 0.0501, 0.01):
            sysz = sys_with_zeta(z)
            Us = qct.unitary_rollout(
                v0, sampled.trajectory["a"],
                sampled.trajectory.get_timesteps(), sysz,
            )
            f_sampled += float(qct.iso_vec_unitary_fidelity(Us[-1], goal))
            Us2 = qct.unitary_rollout(
                v0, plain.trajectory["a"],
                plain.trajectory.get_timesteps(), sysz,
            )
            f_plain += float(qct.iso_vec_unitary_fidelity(Us2[-1], goal))
        assert f_sampled > f_plain

    def test_distribution_overload(self):
        def sys_fn(z):
            return qct.QuantumSystem(
                z * qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]]
            )

        prob = qct.UnitarySamplingProblemFromDistribution(
            sys_fn, (-0.05, 0.05), 3, qct.GATES["H"], 30, 0.2,
            ipopt_options=TOL, piccolo_options=QUIET,
        )
        assert "Ũ⃗_system_3" in prob.trajectory.names


class TestUnitaryBangBang:
    def test_bang_bang_sparser_than_smooth(self):
        sys = _hadamard_system()
        rng = np.random.default_rng(1234)
        bb = qct.UnitaryBangBangProblem(
            sys, qct.GATES["H"], 51, 0.2,
            R_bang_bang=0.5, da_bound=1.0,
            ipopt_options=TOL, piccolo_options=QUIET, rng=rng,
        )
        assert any("l1_slack" in n for n in bb.trajectory.names)
        f0 = float(qct.unitary_rollout_fidelity(bb.trajectory, sys))
        bb.solve(max_iter=40)
        f1 = float(qct.unitary_rollout_fidelity(bb.trajectory, sys))
        assert f1 > f0

        smooth = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 51, 0.2,
            ipopt_options=TOL, piccolo_options=QUIET,
            rng=np.random.default_rng(1234),
        )
        smooth.solve(max_iter=40)

        # bang-bang: fewer |da| entries above threshold (reference
        # unitary_bang_bang_problem.jl:228-232)
        da_bb = np.abs(np.asarray(bb.trajectory["da"]))
        da_smooth = np.abs(np.asarray(smooth.trajectory["da"]))
        assert (da_bb > 5e-2).sum() <= (da_smooth > 5e-2).sum()


def _magnus_cost(traj, H_error, unitary_name="Ũ⃗"):
    """First-order Magnus sensitivity ||Σ_t Δt_t U_t† H_e U_t||_F² normalized
    by (N·T_total)² — the quantity UnitaryRobustnessProblem minimizes (same
    normalization as the terminal cost in problems/unitary_robustness.py)."""
    U = np.asarray(traj[unitary_name])
    dts = np.asarray(traj.get_timesteps())
    T = U.shape[0]
    N = int(round((U.shape[1] / 2) ** 0.5))
    M = np.zeros((N, N), dtype=complex)
    for t in range(T - 1):
        Ut = np.asarray(qct.iso_vec_to_operator(U[t]))
        M += dts[t] * (Ut.conj().T @ np.asarray(H_error) @ Ut)
    T_total = float(dts[: T - 1].sum())
    return float(np.linalg.norm(M) ** 2) / (N * T_total) ** 2


class TestUnitaryRobustness:
    def test_robustness_warm_start(self):
        # GUARANTEED-non-robust warm start (no escape hatch): a constant
        # X-drive pi-rotation on a drift-free system — its first-order
        # Z-error Magnus integral int U^† Z U dt is provably nonzero (Z
        # precesses in the (Z, Y) plane over a half turn; measured cost
        # 0.2027).  The robust solve must then actually reduce it — the
        # reference's decrease assertion without its already-small-start
        # hatch (/root/reference/src/problem_templates/
        # unitary_robustness_problem.jl:166-207).
        T, dt = 51, 0.2
        sys = qct.QuantumSystem(None, [qct.PAULIS["X"], qct.PAULIS["Y"]])
        a_guess = np.zeros((T, 2))
        a_guess[:, 0] = (np.pi / 2) / ((T - 1) * dt)
        prob = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["X"], T, dt, a_guess=a_guess,
            ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
            piccolo_options=QUIET,
        )
        fid0 = float(qct.unitary_rollout_fidelity(prob.trajectory, sys))
        assert fid0 > 0.99, "constant-pulse start must hit the X gate"
        before = _magnus_cost(prob.trajectory, qct.PAULIS["Z"])
        assert before > 0.1, "warm start must be measurably non-robust"
        rob = qct.UnitaryRobustnessProblem(
            qct.PAULIS["Z"], prob, sys, final_fidelity=0.99,
        )
        assert "m_rob" in rob.trajectory.names
        rob.solve(max_iter=60)
        fid = float(
            qct.unitary_rollout_fidelity(rob.trajectory, sys)
        )
        # strong decrease: measured ratio 0.152 (6.6x) at 60 iters
        after = _magnus_cost(rob.trajectory, qct.PAULIS["Z"])
        assert after < 0.5 * before, (before, after)
        assert fid > 0.99 - 1e-3  # fidelity floor maintained


class TestDirectSum:
    def test_direct_sum_merges_and_solves(self):
        sys = _hadamard_system()
        kwargs = dict(ipopt_options=TOL, piccolo_options=QUIET)
        p1 = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 31, 0.2,
            rng=np.random.default_rng(0), **kwargs,
        )
        p2 = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["X"], 31, 0.2,
            rng=np.random.default_rng(1), **kwargs,
        )
        p1.solve(max_iter=30)
        p2.solve(max_iter=30)
        ds = qct.UnitaryDirectSumProblem(
            [p1, p2], 0.99, drive_reset_ratio=0.25,
            rng=np.random.default_rng(2),
        )
        assert "Ũ⃗1" in ds.trajectory.names
        assert "Ũ⃗2" in ds.trajectory.names
        assert "a1" in ds.trajectory.names and "a2" in ds.trajectory.names

        # per-subproblem rollout fidelity must improve from the noise-reset
        # start (measured at this config: 0.38->0.52 and 0.63->0.99,
        # scripts/calibrate_behavior_tests.py)
        def fids(traj):
            return tuple(
                float(qct.unitary_rollout_fidelity(
                    traj, sys, state_name=f"Ũ⃗{i}", drive_name=f"a{i}"))
                for i in (1, 2)
            )

        f1_0, f2_0 = fids(ds.trajectory)
        ds.solve(max_iter=20)
        f1_1, f2_1 = fids(ds.trajectory)
        assert np.all(np.isfinite(np.asarray(ds.trajectory.data)))
        assert f1_1 > f1_0
        assert f2_1 > f2_0


class TestDensityOperator:
    def test_density_pulse_design(self):
        a_op = qct.annihilate(2)
        sys = qct.OpenQuantumSystem(
            qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]],
            [0.05 * a_op],
        )
        rho0 = np.array([[1, 0], [0, 0]], dtype=complex)
        psi_goal = np.array([0, 1], dtype=complex)
        prob = qct.DensityOperatorSmoothPulseProblem(
            sys, rho0, psi_goal, 30, 0.2,
            ipopt_options=TOL, piccolo_options=QUIET,
        )
        initial = float(
            qct.open_rollout_fidelity(prob.trajectory, sys, psi_goal)
        )
        prob.solve(max_iter=30)
        final = float(
            qct.open_rollout_fidelity(prob.trajectory, sys, psi_goal)
        )
        assert final > initial
