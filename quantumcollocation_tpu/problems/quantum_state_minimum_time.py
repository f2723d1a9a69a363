"""QuantumStateMinimumTimeProblem.

Re-implements /root/reference/src/problem_templates/quantum_state_minimum_time_problem.jl:
MinimumTimeObjective + FinalQuantumStateFidelityConstraint per state; the
default fidelity floor is the MEAN of the current state fidelities (:49-52);
warm-start overload from a solved problem (:77-97).
"""

from __future__ import annotations

import copy

import numpy as np

from ..objectives.constraints import FinalQuantumStateFidelityConstraint
from ..objectives.objectives import MinimumTimeObjective
from ..quantum.fidelities import iso_fidelity
from ..solver.options import PiccoloOptions, SolverOptions
from ..trajectory.named_trajectory import NamedTrajectory
from .problem import QuantumControlProblem

__all__ = ["QuantumStateMinimumTimeProblem"]


def QuantumStateMinimumTimeProblem(
    trajectory,
    system=None,
    objective=None,
    integrators=None,
    constraints=None,
    *,
    state_name: str = "ψ̃",
    control_name: str = "a",
    final_fidelity: float | None = None,
    D: float = 1.0,
    ipopt_options: SolverOptions | None = None,
    piccolo_options: PiccoloOptions | None = None,
    **kwargs,
) -> QuantumControlProblem:
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
    constraints = list(constraints or [])
    ipopt_options = ipopt_options or SolverOptions()
    piccolo_options = piccolo_options or PiccoloOptions()

    state_names = [n for n in trajectory.names if n.startswith(state_name)]
    assert state_names, f"no components starting with {state_name!r}"

    objective = objective + MinimumTimeObjective(
        trajectory, D=D, eval_hessian=piccolo_options.eval_hessian
    )

    if final_fidelity is None:
        fids = [
            float(
                iso_fidelity(
                    trajectory[name][-1], np.asarray(trajectory.goal[name])
                )
            )
            for name in state_names
        ]
        final_fidelity = float(np.mean(fids))

    for name in state_names:
        constraints.append(
            FinalQuantumStateFidelityConstraint(name, final_fidelity)
        )

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
