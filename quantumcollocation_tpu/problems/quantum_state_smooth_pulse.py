"""QuantumStateSmoothPulseProblem — ket-transfer analog of the smooth-pulse
template.

Re-implements /root/reference/src/problem_templates/quantum_state_smooth_pulse_problem.jl:
supports multiple (init, goal) ket pairs sharing one control pulse — one
QuantumStateObjective and one state integrator per pair; state names are
auto-numbered ψ̃1, ψ̃2, ... for multiple pairs.
"""

from __future__ import annotations

import numpy as np

from ..dynamics.integrators import (
    DerivativeIntegrator,
    QuantumStateExponentialIntegrator,
    QuantumStatePadeIntegrator,
)
from ..objectives.objectives import QuadraticRegularizer, QuantumStateObjective
from ..quantum.systems import QuantumSystem
from ..solver.options import PiccoloOptions, SolverOptions
from ..trajectory.initialization import initialize_state_trajectory
from ._options import apply_piccolo_options
from .problem import QuantumControlProblem

__all__ = ["QuantumStateSmoothPulseProblem"]


def _fan_out(value, n):
    return np.broadcast_to(np.asarray(value, dtype=float), (n,)).copy()


def QuantumStateSmoothPulseProblem(
    system,
    psi_inits=None,
    psi_goals=None,
    T=None,
    dt=None,
    *args,
    ipopt_options: SolverOptions | None = None,
    piccolo_options: PiccoloOptions | None = None,
    state_name: str = "ψ̃",
    control_name: str = "a",
    timestep_name: str = "Δt",
    init_trajectory=None,
    a_bound: float = 1.0,
    a_bounds=None,
    a_guess=None,
    da_bound: float = np.inf,
    da_bounds=None,
    dda_bound: float = 1.0,
    dda_bounds=None,
    dt_min: float | None = None,
    dt_max: float | None = None,
    drive_derivative_sigma: float = 0.01,
    Q: float = 100.0,
    R: float = 1e-2,
    R_a=None,
    R_da=None,
    R_dda=None,
    constraints=None,
    state_leakage_indices=None,
    rng=None,
    **kwargs,
) -> QuantumControlProblem:
    """Build a ket state-transfer problem.

    Accepts (system, psi_init, psi_goal, T, dt) with single kets or lists of
    kets sharing controls, or the matrix-pair overload
    (H_drift, H_drives, psi_init, psi_goal, T, dt).
    """
    if not isinstance(system, QuantumSystem):
        H_drift, H_drives = system, psi_inits
        system = QuantumSystem(H_drift, list(H_drives))
        psi_inits, psi_goals, T, dt = psi_goals, T, dt, args[0]
        args = args[1:]

    ipopt_options = ipopt_options or SolverOptions()
    piccolo_options = piccolo_options or PiccoloOptions()
    constraints = list(constraints or [])

    # normalize to lists of kets
    def _as_list(x):
        x = np.asarray(x)
        return [x] if x.ndim == 1 else [np.asarray(v) for v in x]

    psi_inits = _as_list(psi_inits)
    psi_goals = _as_list(psi_goals)
    assert len(psi_inits) == len(psi_goals)

    n_drives = system.n_drives
    a_bounds = _fan_out(a_bound if a_bounds is None else a_bounds, n_drives)
    da_bounds = _fan_out(da_bound if da_bounds is None else da_bounds, n_drives)
    dda_bounds = _fan_out(
        dda_bound if dda_bounds is None else dda_bounds, n_drives
    )
    dt_mean = float(np.mean(dt))
    dt_min = 0.5 * dt_mean if dt_min is None else dt_min
    dt_max = 1.5 * dt_mean if dt_max is None else dt_max
    R_a = R if R_a is None else R_a
    R_da = R if R_da is None else R_da
    R_dda = R if R_dda is None else R_dda

    if init_trajectory is not None:
        traj = init_trajectory
    else:
        traj = initialize_state_trajectory(
            psi_goals,
            psi_inits,
            T,
            dt,
            n_drives,
            (a_bounds, da_bounds, dda_bounds),
            state_name=state_name,
            free_time=piccolo_options.free_time,
            rollout_integrator=piccolo_options.rollout_integrator,
            dt_bounds=(dt_min, dt_max),
            bound_state=piccolo_options.bound_state,
            drive_derivative_sigma=drive_derivative_sigma,
            a_guess=a_guess,
            system=system,
            control_name=control_name,
            timestep_name=timestep_name,
            rng=rng,
        )

    state_names = [n for n in traj.names if n.startswith(state_name)]

    J = None
    for name in state_names:
        term = QuantumStateObjective(name, traj, Q)
        J = term if J is None else J + term

    control_names = [name for name in traj.names if name.endswith(control_name)]
    J = J + QuadraticRegularizer(control_names[0], traj, R_a)
    J = J + QuadraticRegularizer(control_names[1], traj, R_da)
    J = J + QuadraticRegularizer(control_names[2], traj, R_dda)

    J, traj = apply_piccolo_options(
        J,
        constraints,
        piccolo_options,
        traj,
        state_names,
        timestep_name,
        state_leakage_indices=state_leakage_indices,
    )

    integrators = []
    for name in state_names:
        if piccolo_options.integrator == "pade":
            integrators.append(
                QuantumStatePadeIntegrator(
                    name,
                    control_name,
                    system,
                    order=piccolo_options.pade_order,
                    timestep_name=timestep_name,
                )
            )
        elif piccolo_options.integrator == "exponential":
            integrators.append(
                QuantumStateExponentialIntegrator(
                    name,
                    control_name,
                    system,
                    drive_bounds=a_bounds,
                    dt_max=dt_max if piccolo_options.free_time else dt_mean,
                        timestep_name=timestep_name,
                )
            )
        else:
            raise ValueError("integrator must be 'pade' or 'exponential'")
    integrators.append(DerivativeIntegrator(control_names[0], control_names[1], timestep_name=timestep_name))
    integrators.append(DerivativeIntegrator(control_names[1], control_names[2], timestep_name=timestep_name))

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
