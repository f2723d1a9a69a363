"""UnitaryDirectSumProblem — merge solved problems into one coupled problem.

Re-implements /root/reference/src/problem_templates/unitary_direct_sum_problem.jl:
merges N solved problems into one trajectory with suffixed names, couples them
with a PairwiseQuadraticRegularizer over a graph of edges (default 1-D chain
over the Q_symb components), adds boundary-value regularizers, per-problem
control regularizers, optional per-problem fidelity costs, per-problem
final-fidelity constraints, and partial noise re-initialization of the
controls (drive_reset_ratio) to avoid the solver's restoration regime.
"""

from __future__ import annotations

import copy

import numpy as np

from ..objectives.constraints import FinalUnitaryFidelityConstraint
from ..objectives.objectives import (
    PairwiseQuadraticRegularizer,
    QuadraticRegularizer,
    UnitaryInfidelityObjective,
)
from ..solver.options import PiccoloOptions, SolverOptions
from ..trajectory.directsums import add_suffix, merge as merge_trajs
from ..trajectory.initialization import initialize_control_trajectory
from .problem import QuantumControlProblem

__all__ = ["UnitaryDirectSumProblem"]


def UnitaryDirectSumProblem(
    probs,
    final_fidelity: float,
    *,
    prob_labels=None,
    graph=None,
    boundary_values=None,
    control_name: str = "a",
    Q=100.0,
    Q_symb: str = "dda",
    R: float = 1e-2,
    R_a=None,
    R_da=None,
    R_dda=None,
    R_b=None,
    drive_derivative_sigma: float = 0.01,
    drive_reset_ratio: float = 0.50,
    fidelity_cost: bool = False,
    subspace=None,
    ipopt_options: SolverOptions | None = None,
    piccolo_options: PiccoloOptions | None = None,
    rng=None,
    **kwargs,
) -> QuantumControlProblem:
    N = len(probs)
    assert N >= 2, "At least two problems are required"
    prob_labels = prob_labels or [str(i + 1) for i in range(N)]
    assert len(prob_labels) == N
    assert 0 <= drive_reset_ratio <= 1
    boundary_values = dict(boundary_values or {})
    assert not (set(boundary_values) & set(prob_labels))
    for p in probs:
        assert "dda" in p.trajectory.names, (
            "Only smooth pulse problems are supported."
        )
    R_a = R if R_a is None else R_a
    R_da = R if R_da is None else R_da
    R_dda = R if R_dda is None else R_dda
    R_b = R if R_b is None else R_b
    ipopt_options = ipopt_options or copy.deepcopy(probs[0].ipopt_options)
    piccolo_options = piccolo_options or copy.deepcopy(probs[0].piccolo_options)
    rng = rng or np.random.default_rng(0)

    # default chain graph over suffixed Q_symb components + boundary edges
    boundary = []
    if graph is None:
        graph = [
            (Q_symb + prob_labels[i], Q_symb + prob_labels[i + 1])
            for i in range(N - 1)
        ]
    else:
        graph_resolved = []
        for e1, e2 in graph:
            if e1 in prob_labels and e2 in prob_labels:
                graph_resolved.append((Q_symb + e1, Q_symb + e2))
            elif e1 in boundary_values and e2 in prob_labels:
                boundary.append((Q_symb + e2, boundary_values[e1]))
            elif e1 in prob_labels and e2 in boundary_values:
                boundary.append((Q_symb + e1, boundary_values[e2]))
            else:
                raise ValueError(
                    "Edge labels must be in prob_labels or boundary_values"
                )
        graph = graph_resolved

    # merge suffixed trajectories
    traj = merge_trajs(
        [add_suffix(p.trajectory, l) for p, l in zip(probs, prob_labels)]
    )

    # partial noise re-init of controls (avoid restoration-phase analogs)
    if drive_reset_ratio > 0:
        for label in prob_labels:
            a_name = "a" + label
            n_drives = traj.comp_size(a_name)
            a, da, dda = initialize_control_trajectory(
                n_drives,
                2,
                traj.T,
                traj.bounds[a_name],
                drive_derivative_sigma,
                rng=rng,
            )
            for name, fresh in [
                (a_name, a),
                ("da" + label, da),
                ("dda" + label, dda),
            ]:
                mixed = (1 - drive_reset_ratio) * np.asarray(
                    traj[name]
                ) + drive_reset_ratio * fresh
                traj = traj.update(name, mixed)

    # rebuild integrators with suffixed component names
    integrators = []
    for p, label in zip(probs, prob_labels):
        for ig in p.integrators:
            integrators.append(add_suffix(ig, label))

    # per-problem final-fidelity constraints
    constraints = []
    for p, label in zip(probs, prob_labels):
        goal_name = next(iter(p.trajectory.goal))
        constraints.append(
            FinalUnitaryFidelityConstraint(
                goal_name + label, final_fidelity, subspace=subspace
            )
        )

    # objective
    J = PairwiseQuadraticRegularizer(traj, Q, graph)
    for name, val in boundary:
        J = J + QuadraticRegularizer(name, traj, R_b, baseline=val)
    for label in prob_labels:
        J = J + QuadraticRegularizer("a" + label, traj, R_a)
        J = J + QuadraticRegularizer("da" + label, traj, R_da)
        J = J + QuadraticRegularizer("dda" + label, traj, R_dda)
    if fidelity_cost:
        for label in prob_labels:
            Q_fid = Q if np.isscalar(Q) else Q[0]
            J = J + UnitaryInfidelityObjective(
                "Ũ⃗" + label, traj, Q_fid, subspace=subspace
            )

    return QuantumControlProblem(
        traj,
        J,
        integrators,
        constraints=constraints,
        ipopt_options=ipopt_options,
        piccolo_options=piccolo_options,
        control_name=control_name,
        system=probs[0].system,
        **kwargs,
    )
