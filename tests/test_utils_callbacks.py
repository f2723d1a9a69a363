"""Tests for callbacks and serialization utilities."""

import os
import tempfile

import numpy as np

import quantumcollocation_tpu as qct


def _small_prob():
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    return sys, qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], 21, 0.2,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-6),
        piccolo_options=qct.PiccoloOptions(verbose=False),
    )


class TestCallbacks:
    def test_trajectory_history(self):
        sys, prob = _small_prob()
        cb, history = qct.trajectory_history_callback(prob)
        prob.solve(max_iter=5, callback=cb)
        assert 1 <= len(history) <= 5
        assert history[0].T == 21

    def test_best_rollout_fidelity(self):
        sys, prob = _small_prob()
        cb, best = qct.best_rollout_fidelity_callback(prob)
        prob.solve(max_iter=10, callback=cb)
        assert best["trajectory"] is not None
        assert best["fidelity"] > 0
        # best iterate is at least as good as the final one
        final_fid = float(qct.unitary_rollout_fidelity(prob.trajectory, sys))
        assert best["fidelity"] >= final_fid - 1e-9

    def test_kkt_history(self):
        sys, prob = _small_prob()
        cb, hist = qct.kkt_history_callback()
        prob.solve(max_iter=5, callback=cb)
        assert len(hist["kkt_err"]) >= 1
        assert len(hist["mu"]) == len(hist["kkt_err"])


class TestSerialization:
    def test_roundtrip(self):
        sys, prob = _small_prob()
        traj = prob.trajectory
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "traj.npz")
            qct.save_trajectory(path, traj)
            traj2 = qct.load_trajectory(path)
        assert traj2.names == traj.names
        assert traj2.T == traj.T
        assert traj2.controls == traj.controls
        np.testing.assert_allclose(
            np.asarray(traj2.data), np.asarray(traj.data)
        )
        np.testing.assert_allclose(
            traj2.goal["Ũ⃗"], traj.goal["Ũ⃗"]
        )
        for name in traj.bounds:
            np.testing.assert_allclose(
                traj2.bounds[name][0], traj.bounds[name][0]
            )

    def test_roundtrip_with_globals(self):
        traj = qct.NamedTrajectory(
            {"x": np.zeros((4, 2)), "Δt": np.full((4, 1), 0.1)},
            timestep="Δt",
            bounds={"x": 1.0},
            global_data={"ϕ": np.array([0.3])},
        )
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "t.npz")
            qct.save_trajectory(path, traj)
            traj2 = qct.load_trajectory(path)
        np.testing.assert_allclose(traj2.global_data["ϕ"], [0.3])
        assert traj2.timestep == "Δt"


class TestIpoptParity:
    def test_ipopt_callback_adapter_fields(self):
        # the adapter delivers the reference's 11-field intermediate-callback
        # tuple (/root/reference/docs/literate/man/ipopt_callbacks.jl:17-31)
        sys, prob = _small_prob()
        rows = []

        def user_cb(
            alg_mod, iter_count, obj_value, inf_pr, inf_du, mu, d_norm,
            regularization_size, alpha_du, alpha_pr, ls_trials,
        ):
            rows.append(
                (alg_mod, iter_count, obj_value, inf_pr, inf_du, mu, d_norm,
                 regularization_size, alpha_du, alpha_pr, ls_trials)
            )
            return True

        cb = qct.ipopt_callback_adapter(prob, user_cb)
        prob.solve(max_iter=5, callback=cb)
        assert 1 <= len(rows) <= 5
        for row in rows:
            assert len(row) == 11
            assert np.isfinite(row[2])  # objective
            assert row[3] >= 0 and row[4] >= 0  # inf_pr, inf_du
            assert 0 < row[5] <= 1.0  # mu
            assert 0 <= row[9] <= 1.0 + 1e-12  # alpha_pr
        # objective is reported in problem units: positive and O(1..1e4)
        assert 0 < rows[-1][2] < 1e6

    def test_ipopt_callback_adapter_early_stop(self):
        sys, prob = _small_prob()
        calls = []

        def user_cb(*fields):
            calls.append(fields[1])
            return False

        cb = qct.ipopt_callback_adapter(prob, user_cb)
        prob.solve(max_iter=10, callback=cb)
        assert len(calls) == 1

    def test_live_iteration_table(self, capsys):
        # print_level >= 5 prints the Ipopt-style live iteration table
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        prob = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 11, 0.2,
            ipopt_options=qct.SolverOptions(print_level=5, tol=1e-6),
            piccolo_options=qct.PiccoloOptions(verbose=False),
        )
        prob.solve(max_iter=3)
        out = capsys.readouterr().out
        assert "inf_pr" in out and "alpha_pr" in out and "lg(mu)" in out
        # at least one data row with the iteration counter
        assert any(line.strip().startswith("0 ") for line in out.splitlines())
