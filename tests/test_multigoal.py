"""Multi-goal batched synthesis (BASELINE config #5 machinery): one compiled
solve advances instances with DIFFERENT target gates carried in their pinned
initial conditions (W = U G† change of variables, problems/multigoal.py)."""

import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.problems import (
    UnitaryMultiGoalProblem,
    multigoal_initial_decisions,
    multigoal_rollout_fidelities,
    random_su,
)


def _system():
    return qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])


class TestMultiGoal:
    def test_random_su_is_special_unitary(self):
        rng = np.random.default_rng(0)
        for n in (2, 4):
            G = random_su(n, rng)
            assert np.allclose(G @ G.conj().T, np.eye(n), atol=1e-12)
            assert np.isclose(np.linalg.det(G), 1.0, atol=1e-12)

    def test_distinct_goals_solved_in_one_batch(self):
        sys = _system()
        prob = UnitaryMultiGoalProblem(
            sys, 50, 0.2,
            Q=1e4, R=1e-3,
            ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
            piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        )
        rng = np.random.default_rng(42)
        goals = [np.asarray(qct.GATES["H"]), random_su(2, rng), random_su(2, rng)]
        Z0 = multigoal_initial_decisions(
            prob, goals, n_seeds_per_goal=2, sigma=0.2, rng=rng
        )
        assert Z0.shape[0] == 6
        # rows carry distinct pinned initial conditions
        u_sl = prob.trajectory.comp_slice("Ũ⃗")
        assert not np.allclose(Z0[0, 0, u_sl], Z0[2, 0, u_sl])

        res = prob.solve_batched(np.asarray(Z0), max_iter=120)
        fids = multigoal_rollout_fidelities(
            prob, np.asarray(res.Z), goals, n_seeds_per_goal=2
        )
        per_goal_best = fids.reshape(3, 2).max(axis=1)
        # every distinct goal reaches near the north-star infidelity target
        # (measured: 5.4e-5 / 1.6e-5 / 1.1e-4 at this config,
        # scripts/calibrate_multigoal.py)
        assert np.all(1.0 - per_goal_best <= 2e-4), per_goal_best

    def test_matches_direct_single_goal_solve(self):
        sys = _system()
        kwargs = dict(
            Q=1e4, R=1e-3,
            ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
            piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        )
        mg = UnitaryMultiGoalProblem(sys, 50, 0.2, **kwargs)
        Z0 = multigoal_initial_decisions(mg, [np.asarray(qct.GATES["H"])])
        res = mg.solve_batched(np.asarray(Z0), max_iter=120)
        fid_mg = multigoal_rollout_fidelities(
            mg, np.asarray(res.Z), [np.asarray(qct.GATES["H"])]
        )[0]

        direct = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 50, 0.2, **kwargs
        )
        direct.solve(max_iter=120)
        fid_direct = float(qct.unitary_rollout_fidelity(direct.trajectory, sys))
        assert 1.0 - fid_mg <= 1e-4
        assert abs(fid_mg - fid_direct) < 5e-4
