"""Tests for fidelity accessor, expv, and flat-index utilities."""

import numpy as np
import scipy.linalg as sla

import quantumcollocation_tpu as qct


class TestFidelityAccessor:
    def test_unitary_problem(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        prob = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 11, 0.2,
            ipopt_options=qct.SolverOptions(print_level=1),
            piccolo_options=qct.PiccoloOptions(verbose=False),
        )
        f = float(qct.fidelity(prob))
        f2 = float(qct.unitary_rollout_fidelity(prob.trajectory, sys))
        assert abs(f - f2) < 1e-12

    def test_ket_trajectory(self):
        sys = qct.QuantumSystem(0.1 * qct.PAULIS["Z"], [qct.PAULIS["X"]])
        traj = qct.initialize_state_trajectory(
            [np.array([0, 1])], [np.array([1, 0])], 8, 0.2, 1,
            [np.ones(1), np.ones(1), np.ones(1)],
        )
        f = float(qct.fidelity(traj, sys))
        assert 0.0 <= f <= 1.0 + 1e-9


class TestExpv:
    def test_matches_dense(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(6, 6)) * 0.5
        b = rng.normal(size=6)
        out = np.asarray(qct.expv(0.7, A, b))
        np.testing.assert_allclose(out, sla.expm(0.7 * A) @ b, atol=1e-9)


class TestIndexing:
    def test_flat_index(self):
        assert qct.index(3, 2, 10) == 32
        sl = qct.slice_at(2, 5)
        assert (sl.start, sl.stop) == (10, 15)

    def test_comp_slice_at(self):
        traj = qct.NamedTrajectory(
            {"x": np.zeros((4, 2)), "y": np.zeros((4, 3))}, timestep=0.1
        )
        sl = qct.comp_slice_at(traj, "y", 1)
        assert (sl.start, sl.stop) == (1 * 5 + 2, 1 * 5 + 5)
        flat = np.asarray(traj.flatten())
        assert flat.shape == (20,)
