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
- minimum-time is a hard nonconvex NLP: our IPM reaches f64 feasibility
  (e_feas ~ 7e-7) with the fidelity floor held and the duration shortened,
  but stationarity stalls at E0 ~ 3.4 — and the INDEPENDENT scipy
  trust-constr solver, polished from our point for 200 more iterations,
  still reports E0 ~ 2.3 and only a ~6% objective gain.  The test pins
  that cross-solver envelope rather than pretending either solver
  certifies stationarity here.
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


def test_min_time_feasibility_certified_and_cross_solver_envelope(
    f64, single_qubit
):
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

    # the oracle handles the fidelity-floor inequality rows in f64
    cert = kkt_certificate(mt)
    assert cert["n_g"] == T  # one floor row per knot
    assert np.isfinite(cert["E0"])
    assert cert["e_feas"] <= 1e-5, cert  # defects + floor feasible in f64

    # reference CI bar (unitary_minimum_time_problem.jl:163-171): duration
    # decreases while the fidelity floor holds
    fid = float(qct.unitary_rollout_fidelity(mt.trajectory, single_qubit))
    assert fid >= 0.99 - 1e-6
    assert float(mt.trajectory.duration()) < dur0

    # cross-solver envelope: an independent interior-point method
    # (trust-constr) polished from OUR solution for 200 iterations gains
    # < 10% objective (measured ~6%) and does NOT reach stationarity
    # either — the stall is problem-intrinsic, not a solver defect
    res, flat = trust_constr_solve(
        mt, Z_start=np.asarray(mt.result.Z[0]), max_iter=200
    )
    ours = cert["objective"]
    assert res.fun >= ours * 0.90, (ours, res.fun)
    cert_pol = kkt_certificate(mt, Z=flat.unpack(res.x))
    assert np.isfinite(cert_pol["E0"])
