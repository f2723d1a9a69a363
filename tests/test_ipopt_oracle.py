"""f64 optimality-oracle tests on inequality-constrained problems.

The round-2 oracle (utils/ipopt_oracle.py) lowers stage inequalities into
both the E_0 certificate (WB06 eq. 5 active-set multiplier recovery) and
the scipy trust-constr cross-solver.  These tests exercise that path on the
two template families the reference solves through Ipopt's slack lowering:
bang-bang (L1 slack inequalities, unitary_bang_bang_problem.jl:207) and
minimum-time (final-fidelity floor, unitary_minimum_time_problem.jl:80-84).

Calibration notes (CPU f64, T=15 Hadamard):
- bang-bang converges to full stationarity: measured E0 = 3.1e-8 with 60
  active inequality rows.
- minimum-time USED to stall at E0 ~ 3.4 (rounds 2-3): the stage-wise
  Riccati factorization demanded delta_w ~ 100-800 against a true reduced
  negative curvature of only -0.46, crippling Newton.  The rho*J^T J
  inertia lift (SolverOptions.kkt_aug, round 4) fixed it: measured
  convergence in 37 iterations to E0 = 1.7e-8 with the fidelity floor
  exactly active and the objective 10% below the old stall (153.6 ->
  138.57).  The test now pins full Ipopt-grade stationarity.
"""

import jax
import numpy as np
import pytest

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.utils.ipopt_oracle import (
    kkt_certificate,
    trust_constr_solve,
)


@pytest.fixture(scope="module")
def f64():
    jax.config.update("jax_enable_x64", True)
    yield


@pytest.fixture(scope="module")
def single_qubit():
    return qct.QuantumSystem(
        qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]]
    )


def test_bang_bang_solution_certifies(f64, single_qubit):
    # L1 bang-bang regularization lowers to slack inequalities; the oracle
    # must recover their active-set multipliers and certify E0 <= tol —
    # the literal acceptance test Ipopt applies to its own iterates
    prob = qct.UnitaryBangBangProblem(
        single_qubit, qct.GATES["H"], 15, 0.4, R_bang_bang=1.0,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-8),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        rng=np.random.default_rng(0),
    )
    prob.solve(max_iter=150)
    assert bool(prob.result.converged[0])
    cert = kkt_certificate(prob)
    assert cert["n_g"] > 0  # inequality rows actually present
    assert cert["E0"] <= 1e-6, cert
    assert cert["e_feas"] <= 1e-8, cert


def test_min_time_reaches_certified_stationarity(f64, single_qubit):
    T, dt = 15, 0.4
    warm = qct.UnitarySmoothPulseProblem(
        single_qubit, qct.GATES["H"], T, dt, Q=100.0, R=1e-2,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-8),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        rng=np.random.default_rng(0),
    )
    warm.solve(max_iter=100)
    a_solved = np.asarray(warm.trajectory["a"])
    traj2 = qct.initialize_unitary_trajectory(
        qct.GATES["H"], T, dt, 2,
        [np.ones(2), np.full(2, np.inf), np.ones(2)],
        free_time=True, a_guess=a_solved, system=single_qubit,
    )
    dur0 = float(traj2.duration())
    mt = qct.UnitaryMinimumTimeProblem(
        traj2, single_qubit, warm.get_objective(), warm.integrators, [],
        final_fidelity=0.99, D=40.0,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-8, line_search="filter"
        ),
    )
    mt.solve(max_iter=150)

    # the free-dt min-time NLP must now reach a CERTIFIED KKT point (the
    # rho*J^T J lift, SolverOptions.kkt_aug; measured: 37 iters, E0 1.7e-8)
    assert bool(mt.result.converged[0]), float(mt.result.kkt_err[0])
    cert = kkt_certificate(mt)
    assert cert["n_g"] == T  # one floor row per knot
    assert cert["E0"] <= 1e-4, cert  # Ipopt-grade stationarity
    assert cert["e_feas"] <= 1e-6, cert  # defects + floor feasible in f64

    # reference CI bar (unitary_minimum_time_problem.jl:163-171): duration
    # decreases while the fidelity floor holds — and the floor is ACTIVE at
    # the optimum (the min-time objective pushes against it)
    fid = float(qct.unitary_rollout_fidelity(mt.trajectory, single_qubit))
    assert fid >= 0.99 - 1e-6
    assert fid <= 0.99 + 1e-3  # floor active: no fidelity left on the table
    assert float(mt.trajectory.duration()) < dur0

    # cross-solver check: scipy trust-constr polished from OUR certified
    # point cannot meaningfully improve the objective
    res, flat = trust_constr_solve(
        mt, Z_start=np.asarray(mt.result.Z[0]), max_iter=100
    )
    ours = cert["objective"]
    assert res.fun >= ours * 0.999, (ours, res.fun)
