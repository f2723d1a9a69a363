"""UnitaryBangBangProblem — L1-regularized control derivative drives
bang-bang (piecewise-constant) pulse solutions.

Re-implements /root/reference/src/problem_templates/unitary_bang_bang_problem.jl:
one derivative level only (a, da), L1Regularizer on da with slack variables
(R_bang_bang, default 1e-1), quadratic R_da defaults to 0 because L1 replaces
it (:91,:144).
"""

from __future__ import annotations

import numpy as np

from ..dynamics.integrators import (
    DerivativeIntegrator,
    UnitaryExponentialIntegrator,
    UnitaryPadeIntegrator,
)
from ..objectives.objectives import (
    L1Regularizer,
    QuadraticRegularizer,
    UnitaryFreePhaseInfidelityObjective,
    UnitaryInfidelityObjective,
)
from ..quantum.embedded import EmbeddedOperator, get_iso_vec_leakage_indices
from ..quantum.systems import QuantumSystem
from ..solver.options import PiccoloOptions, SolverOptions
from ..trajectory.initialization import initialize_unitary_trajectory
from ._options import apply_piccolo_options
from .problem import QuantumControlProblem

__all__ = ["UnitaryBangBangProblem"]


def _fan_out(value, n):
    return np.broadcast_to(np.asarray(value, dtype=float), (n,)).copy()


def UnitaryBangBangProblem(
    system,
    operator=None,
    T=None,
    dt=None,
    *args,
    ipopt_options: SolverOptions | None = None,
    piccolo_options: PiccoloOptions | None = None,
    state_name: str = "Ũ⃗",
    control_name: str = "a",
    timestep_name: str = "Δt",
    init_trajectory=None,
    a_bound: float = 1.0,
    a_bounds=None,
    a_guess=None,
    da_bound: float = 1.0,
    da_bounds=None,
    dt_min: float | None = None,
    dt_max: float | None = None,
    Q: float = 100.0,
    R: float = 1e-2,
    R_a=None,
    R_da=0.0,
    R_bang_bang=1e-1,
    phase_name: str = "ϕ",
    phase_operators=None,
    constraints=None,
    rng=None,
    **kwargs,
) -> QuantumControlProblem:
    if not isinstance(system, QuantumSystem):
        H_drift, H_drives = system, operator
        system = QuantumSystem(H_drift, list(H_drives))
        operator, T, dt = T, dt, args[0]
        args = args[1:]

    ipopt_options = ipopt_options or SolverOptions()
    piccolo_options = piccolo_options or PiccoloOptions()
    constraints = list(constraints or [])

    n_drives = system.n_drives
    a_bounds = _fan_out(a_bound if a_bounds is None else a_bounds, n_drives)
    da_bounds = _fan_out(da_bound if da_bounds is None else da_bounds, n_drives)
    dt_mean = float(np.mean(dt))
    dt_min = 0.5 * dt_mean if dt_min is None else dt_min
    dt_max = 1.5 * dt_mean if dt_max is None else dt_max
    R_a = R if R_a is None else R_a

    if init_trajectory is not None:
        traj = init_trajectory
    else:
        traj = initialize_unitary_trajectory(
            operator,
            T,
            dt,
            n_drives,
            (a_bounds, da_bounds),
            state_name=state_name,
            control_name=control_name,
            timestep_name=timestep_name,
            free_time=piccolo_options.free_time,
            dt_bounds=(dt_min, dt_max),
            geodesic=piccolo_options.geodesic,
            rollout_integrator=piccolo_options.rollout_integrator,
            bound_state=piccolo_options.bound_state,
            a_guess=a_guess,
            system=system,
            phase_name=phase_name,
            phase_operators=phase_operators,
            rng=rng,
        )

    subspace = (
        operator.subspace_indices
        if isinstance(operator, EmbeddedOperator)
        else None
    )
    if phase_operators is None:
        J = UnitaryInfidelityObjective(state_name, traj, Q, subspace=subspace)
    else:
        J = UnitaryFreePhaseInfidelityObjective(
            state_name, phase_name, phase_operators, traj, Q,
            subspace=subspace,
            eval_hessian=piccolo_options.eval_hessian,
        )

    control_names = [n for n in traj.names if n.endswith(control_name)]
    J = J + QuadraticRegularizer(control_names[0], traj, R_a)
    # R_da defaults to 0: the L1 term below replaces quadratic smoothing
    J = J + QuadraticRegularizer(control_names[1], traj, R_da)

    R_bb = _fan_out(R_bang_bang, n_drives)
    J_l1, traj = L1Regularizer(
        constraints,
        control_names[1],
        traj,
        R=R_bb,
        eval_hessian=piccolo_options.eval_hessian,
    )
    J = J + J_l1

    iso_leakage = (
        get_iso_vec_leakage_indices(operator)
        if isinstance(operator, EmbeddedOperator)
        else None
    )
    J, traj = apply_piccolo_options(
        J,
        constraints,
        piccolo_options,
        traj,
        state_name,
        timestep_name,
        state_leakage_indices=iso_leakage,
    )

    if piccolo_options.integrator == "pade":
        unitary_integrator = UnitaryPadeIntegrator(
            state_name,
            control_names[0],
            system,
            order=piccolo_options.pade_order,
            timestep_name=timestep_name,
        )
    elif piccolo_options.integrator == "exponential":
        unitary_integrator = UnitaryExponentialIntegrator(
            state_name,
            control_names[0],
            system,
            drive_bounds=a_bounds,
            dt_max=dt_max if piccolo_options.free_time else dt_mean,
            timestep_name=timestep_name,
        )
    else:
        raise ValueError("integrator must be 'pade' or 'exponential'")

    integrators = [
        unitary_integrator,
        DerivativeIntegrator(control_names[0], control_names[1], timestep_name=timestep_name),
    ]

    return QuantumControlProblem(
        traj,
        J,
        integrators,
        constraints=constraints,
        ipopt_options=ipopt_options,
        piccolo_options=piccolo_options,
        control_name=control_name,
        system=system,
        **kwargs,
    )
