"""UnitaryMinimumTimeProblem — minimize duration under a fidelity floor.

Re-implements /root/reference/src/problem_templates/unitary_minimum_time_problem.jl:
adds D*sum(dt) to the objective and a FinalUnitaryFidelityConstraint at
`final_fidelity` (defaulting to the trajectory's CURRENT fidelity), with a
warm-start overload from a solved problem.

Note on build_trajectory_constraints: in the reference, warm starts disable
trajectory-constraint rebuilding because bounds live in the constraint list
(:121-124); here bounds/pins are trajectory metadata enforced natively by the
IPM, so warm starts keep them without duplication.
"""

from __future__ import annotations

import copy

import numpy as np

from ..objectives.constraints import (
    FinalUnitaryFidelityConstraint,
    FinalUnitaryFreePhaseFidelityConstraint,
)
from ..objectives.objectives import MinimumTimeObjective
from ..quantum.fidelities import (
    iso_vec_unitary_fidelity,
    iso_vec_unitary_free_phase_fidelity,
)
from ..solver.options import PiccoloOptions, SolverOptions
from ..trajectory.named_trajectory import NamedTrajectory
from .problem import QuantumControlProblem

__all__ = ["UnitaryMinimumTimeProblem"]


def UnitaryMinimumTimeProblem(
    trajectory,
    system=None,
    objective=None,
    integrators=None,
    constraints=None,
    *,
    unitary_name: str = "Ũ⃗",
    control_name: str = "a",
    final_fidelity: float | None = None,
    D: float = 1.0,
    ipopt_options: SolverOptions | None = None,
    piccolo_options: PiccoloOptions | None = None,
    phase_name: str = "ϕ",
    phase_operators=None,
    subspace=None,
    **kwargs,
) -> QuantumControlProblem:
    """Two call forms (mirroring the reference):

    UnitaryMinimumTimeProblem(traj, system, objective, integrators, constraints; ...)
    UnitaryMinimumTimeProblem(prob[, system]; ...)   # warm start
    """
    # warm-start overload from a solved QuantumControlProblem
    if isinstance(trajectory, QuantumControlProblem):
        prob = trajectory
        system = system or prob.system
        objective = objective if objective is not None else prob.get_objective()
        integrators = integrators if integrators is not None else prob.integrators
        constraints = (
            list(constraints)
            if constraints is not None
            else prob.get_constraints()
        )
        ipopt_options = ipopt_options or copy.deepcopy(prob.ipopt_options)
        piccolo_options = piccolo_options or copy.deepcopy(prob.piccolo_options)
        trajectory = prob.trajectory.copy()

    assert isinstance(trajectory, NamedTrajectory)
    assert unitary_name in trajectory.names
    constraints = list(constraints or [])
    ipopt_options = ipopt_options or SolverOptions()
    piccolo_options = piccolo_options or PiccoloOptions()

    objective = objective + MinimumTimeObjective(
        trajectory, D=D, eval_hessian=piccolo_options.eval_hessian
    )

    U_T = trajectory[unitary_name][-1]
    U_G = np.asarray(trajectory.goal[unitary_name])

    if phase_operators is None:
        if final_fidelity is None:
            final_fidelity = float(
                iso_vec_unitary_fidelity(U_T, U_G, subspace=subspace)
            )
        fidelity_constraint = FinalUnitaryFidelityConstraint(
            unitary_name, final_fidelity, subspace=subspace
        )
    else:
        if final_fidelity is None:
            phases = trajectory.global_data[phase_name]
            final_fidelity = float(
                iso_vec_unitary_free_phase_fidelity(
                    U_T, U_G, phases, phase_operators, subspace=subspace
                )
            )
        fidelity_constraint = FinalUnitaryFreePhaseFidelityConstraint(
            unitary_name,
            phase_name,
            phase_operators,
            final_fidelity,
            subspace=subspace,
        )
    constraints.append(fidelity_constraint)

    return QuantumControlProblem(
        trajectory,
        objective,
        integrators,
        constraints=constraints,
        ipopt_options=ipopt_options,
        piccolo_options=piccolo_options,
        control_name=control_name,
        system=system,
        **kwargs,
    )
