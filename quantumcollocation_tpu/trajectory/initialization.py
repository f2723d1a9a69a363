"""Initial-guess construction for trajectories.

Re-implements the reference's TrajectoryInitialization surface
(/root/reference/src/trajectory_initialization.jl): unitary geodesics, linear
interpolations, random bounded control guesses, derivative-consistent control
chains, and the generic `initialize_trajectory` builders for unitary / ket /
density problems.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from ..dynamics.rollouts import open_rollout, rollout, unitary_rollout
from ..quantum.embedded import EmbeddedOperator, embed, unembed
from ..quantum.isomorphisms import (
    density_to_iso_vec,
    ket_to_iso,
    operator_to_iso_vec,
)
from .named_trajectory import NamedTrajectory, derivative

__all__ = [
    "unitary_geodesic",
    "unitary_linear_interpolation",
    "linear_interpolation",
    "initialize_control_trajectory",
    "initialize_trajectory",
    "initialize_unitary_trajectory",
    "initialize_state_trajectory",
    "initialize_density_trajectory",
]


# --------------------------------------------------------------------------- #
# geodesics & interpolation (host-side numpy; build-time only)
# --------------------------------------------------------------------------- #


def linear_interpolation(x, y, samples: int):
    """(samples, k) linear interpolation between two vectors (time-major)."""
    x = np.asarray(x)
    y = np.asarray(y)
    ts = np.linspace(0.0, 1.0, samples)[:, None]
    return (1 - ts) * x[None, :] + ts * y[None, :]


def unitary_linear_interpolation(U_init, U_goal, samples: int):
    """(samples, 2N^2) linear interpolation between iso-vecs of two unitaries.

    Mirrors /root/reference/src/trajectory_initialization.jl:35-45.
    """
    if isinstance(U_goal, EmbeddedOperator):
        U_goal = U_goal.operator
    v0 = np.asarray(operator_to_iso_vec(np.asarray(U_init)))
    v1 = np.asarray(operator_to_iso_vec(np.asarray(U_goal)))
    return linear_interpolation(v0, v1, samples)


def unitary_geodesic(
    U_init,
    U_goal=None,
    times=None,
    *,
    samples: int | None = None,
    return_unitary_isos: bool = True,
    return_generator: bool = False,
):
    """Geodesic connecting two unitaries: H = i log(U_goal U_init^†)/T,
    samples exp(-i H t) U_init.

    Mirrors /root/reference/src/trajectory_initialization.jl:140-166, with the
    same calling conveniences: unitary_geodesic(U_goal, samples) starts from
    identity; times may be an arbitrary vector (unequal, offset).

    Returns (samples, 2N^2) iso-vec rows (time-major) by default.
    """
    # convenience: unitary_geodesic(U_goal, samples)
    if U_goal is None or isinstance(U_goal, (int, np.integer)):
        if isinstance(U_goal, (int, np.integer)):
            samples = int(U_goal)
        U_goal = U_init
        n = (
            U_goal.operator.shape[0]
            if isinstance(U_goal, EmbeddedOperator)
            else np.asarray(U_goal).shape[0]
        )
        U_init = np.eye(n, dtype=complex)

    if isinstance(U_goal, EmbeddedOperator):
        # unembed -> geodesic in the subspace -> embed back
        emb = U_goal
        U0 = np.asarray(unembed(np.asarray(U_init), emb))
        U1 = np.asarray(unembed(np.asarray(emb.operator), emb))
        if times is None:
            times = np.linspace(0.0, 1.0, samples)
        out = unitary_geodesic(
            U0,
            U1,
            times,
            return_unitary_isos=False,
            return_generator=return_generator,
        )
        Us = out[0] if return_generator else out
        rows = np.stack(
            [
                np.asarray(operator_to_iso_vec(embed(U, emb)))
                for U in Us
            ]
        )
        return (rows, out[1]) if return_generator else rows

    if times is None:
        times = np.linspace(0.0, 1.0, samples)
    times = np.asarray(times, dtype=float)
    t0 = times[0]
    T = times[-1] - t0
    U_init = np.asarray(U_init, dtype=complex)
    U_goal = np.asarray(U_goal, dtype=complex)
    H = 1j * sla.logm(U_goal @ U_init.conj().T) / T
    H = (H + H.conj().T) / 2  # clean numerical anti-Hermitian residue
    Us = [sla.expm(-1j * H * (t - t0)) @ U_init for t in times]
    if not return_unitary_isos:
        return (Us, H) if return_generator else Us
    rows = np.stack([np.asarray(operator_to_iso_vec(U)) for U in Us])
    return (rows, H) if return_generator else rows


# --------------------------------------------------------------------------- #
# control guesses
# --------------------------------------------------------------------------- #


def initialize_control_trajectory(
    n_drives_or_a,
    n_derivatives: int,
    T_or_dt=None,
    bounds=None,
    drive_derivative_sigma: float = 0.1,
    *,
    rng=None,
):
    """Random control guess OR derivative-consistent chain from a given guess.

    Form 1 (random; reference trajectory_initialization.jl:194-223):
        initialize_control_trajectory(n_drives, n_derivatives, T, bounds, sigma)
        -> [a, da, ..., d^n a], a zero at endpoints, uniform-in-bounds interior,
        Gaussian sigma-scaled derivatives.  Arrays are (T, n_drives).

    Form 2 (from guess; reference :225-243):
        initialize_control_trajectory(a_guess, dts, n_derivatives)
        with a_guess (T, n_drives) -> derivative-consistent chain with endpoint
        fixup to avoid initial defect violation.
    """
    if isinstance(n_drives_or_a, (int, np.integer)):
        n_drives = int(n_drives_or_a)
        T = int(T_or_dt)
        rng = rng or np.random.default_rng(0)
        if isinstance(bounds, tuple) and len(bounds) == 2 and not np.isscalar(bounds[0]):
            lo = np.asarray(bounds[0], dtype=float)
            hi = np.asarray(bounds[1], dtype=float)
        else:
            hi = np.broadcast_to(np.asarray(bounds, dtype=float), (n_drives,))
            lo = -hi
        a = np.zeros((T, n_drives))
        finite_lo = np.where(np.isfinite(lo), lo, -1.0)
        finite_hi = np.where(np.isfinite(hi), hi, 1.0)
        a[1:-1] = rng.uniform(finite_lo, finite_hi, size=(T - 2, n_drives))
        controls = [a]
        for _ in range(n_derivatives):
            controls.append(
                rng.normal(size=(T, n_drives)) * drive_derivative_sigma
            )
        return controls
    else:
        a = np.asarray(n_drives_or_a, dtype=float)
        dts = T_or_dt if T_or_dt is not None else bounds
        n_derivatives = int(n_derivatives)
        T = a.shape[0]
        if np.isscalar(dts):
            dts = np.full((T,), float(dts))
        dts = np.asarray(dts, dtype=float)
        controls = [np.array(a)]
        for n in range(1, n_derivatives + 1):
            controls.append(np.array(derivative(controls[-1], dts)))
            if n > 1:
                # endpoint fixup: x[T-1] = x[T-2] + dt[T-2]*dx[T-2] keeps the
                # last derivative-chain defect satisfied at iteration 0
                controls[-2][-1] = (
                    controls[-2][-2] + dts[-2] * controls[-1][-2]
                )
        return controls


# --------------------------------------------------------------------------- #
# generic trajectory assembly
# --------------------------------------------------------------------------- #


def initialize_trajectory(
    state_data: Sequence[np.ndarray],
    state_inits: Sequence[np.ndarray],
    state_goals: Sequence[np.ndarray],
    state_names: Sequence[str],
    T: int,
    dt,
    n_drives: int,
    control_bounds,
    *,
    bound_state: bool = False,
    free_time: bool = False,
    control_name: str = "a",
    n_control_derivatives: int | None = None,
    zero_initial_and_final_derivative: bool = False,
    timestep_name: str = "Δt",
    dt_bounds=None,
    drive_derivative_sigma: float = 0.1,
    a_guess=None,
    phase_name: str = "ϕ",
    phase_data=None,
    rng=None,
) -> NamedTrajectory:
    """Assemble a NamedTrajectory from state data + control guesses + metadata.

    Mirrors the generic initialize_trajectory
    (/root/reference/src/trajectory_initialization.jl:260-382): state
    components first, control + derivatives next, timestep component last when
    free_time; initial pins (state inits, a=0), final pins (a=0), goal on
    states, unit box on states if bound_state.
    """
    if n_control_derivatives is None:
        n_control_derivatives = len(control_bounds) - 1
    deriv_names = [
        "d" * i + control_name for i in range(1, n_control_derivatives + 1)
    ]
    control_names = [control_name] + deriv_names

    # timesteps
    if np.isscalar(dt):
        dts = np.full((T,), float(dt))
    else:
        dts = np.asarray(dt, dtype=float).reshape(-1)
    if dt_bounds is None:
        dt_bounds = (0.5 * float(np.mean(dts)), 1.5 * float(np.mean(dts)))

    # controls
    if a_guess is None:
        a_values = initialize_control_trajectory(
            n_drives,
            n_control_derivatives,
            T,
            control_bounds[0],
            drive_derivative_sigma,
            rng=rng,
        )
    else:
        a_values = initialize_control_trajectory(
            np.asarray(a_guess), n_control_derivatives, dts
        )

    components = {}
    for name, data in zip(state_names, state_data):
        components[name] = np.asarray(data)
    for name, data in zip(control_names, a_values):
        components[name] = np.asarray(data)

    bounds = {}
    for name, b in zip(control_names, control_bounds):
        bounds[name] = b
    if bound_state:
        for name in state_names:
            bounds[name] = 1.0

    initial = {name: init for name, init in zip(state_names, state_inits)}
    initial[control_name] = np.zeros(n_drives)
    final = {control_name: np.zeros(n_drives)}
    if zero_initial_and_final_derivative and deriv_names:
        initial[deriv_names[0]] = np.zeros(n_drives)
        final[deriv_names[0]] = np.zeros(n_drives)
    goal = {name: g for name, g in zip(state_names, state_goals)}

    if free_time:
        components[timestep_name] = dts[:, None]
        bounds[timestep_name] = dt_bounds
        controls = (control_names[-1], timestep_name)
        timestep = timestep_name
    else:
        controls = (control_names[-1],)
        timestep = float(dts[0])

    global_data = {} if phase_data is None else {phase_name: np.asarray(phase_data)}

    return NamedTrajectory(
        components,
        controls=controls,
        timestep=timestep,
        bounds=bounds,
        initial=initial,
        final=final,
        goal=goal,
        global_data=global_data,
    )


def initialize_unitary_trajectory(
    U_goal,
    T: int,
    dt,
    n_drives: int,
    control_bounds,
    *,
    state_name: str = "Ũ⃗",
    U_init=None,
    a_guess=None,
    system=None,
    geodesic: bool = True,
    phase_name: str = "ϕ",
    phase_operators=None,
    rollout_integrator: str = "expm",
    rng=None,
    **kwargs,
) -> NamedTrajectory:
    """Unitary-problem trajectory init (reference :389-444): geodesic (or
    linear) state guess, or rollout-consistent states from a_guess; random
    phase data when phase_operators are given."""
    emb = U_goal if isinstance(U_goal, EmbeddedOperator) else None
    n = (
        emb.levels
        if emb is not None
        else np.asarray(U_goal).shape[0]
    )
    if U_init is None:
        U_init = np.eye(n, dtype=complex)

    v_init = np.asarray(operator_to_iso_vec(np.asarray(U_init)))
    goal_op = emb.operator if emb is not None else np.asarray(U_goal)
    v_goal = np.asarray(operator_to_iso_vec(goal_op))

    dts = (
        np.full((T,), float(dt)) if np.isscalar(dt) else np.asarray(dt).reshape(-1)
    )

    if a_guess is None:
        if geodesic:
            U_traj = unitary_geodesic(U_init, U_goal, samples=T)
        else:
            U_traj = unitary_linear_interpolation(U_init, goal_op, T)
    else:
        assert system is not None, "system required with a_guess"
        U_traj = np.asarray(
            unitary_rollout(
                v_init, np.asarray(a_guess), dts, system,
                integrator=rollout_integrator,
            )
        )

    phase_data = None
    if phase_operators is not None:
        rng_ = rng or np.random.default_rng(0)
        phase_data = np.pi * rng_.standard_normal(len(phase_operators))

    return initialize_trajectory(
        [U_traj],
        [v_init],
        [v_goal],
        [state_name],
        T,
        dt,
        n_drives,
        control_bounds,
        a_guess=a_guess,
        phase_name=phase_name,
        phase_data=phase_data,
        rng=rng,
        **kwargs,
    )


def initialize_state_trajectory(
    psi_goals,
    psi_inits,
    T: int,
    dt,
    n_drives: int,
    control_bounds,
    *,
    state_name: str = "ψ̃",
    state_names=None,
    a_guess=None,
    system=None,
    rollout_integrator: str = "expm",
    rng=None,
    **kwargs,
) -> NamedTrajectory:
    """Ket-problem trajectory init with auto-numbered state names ψ̃1, ψ̃2, ...
    (reference :451-509)."""
    if state_names is None:
        state_names = (
            [state_name]
            if len(psi_goals) == 1
            else [f"{state_name}{i + 1}" for i in range(len(psi_goals))]
        )
    iso_inits = [np.asarray(ket_to_iso(np.asarray(p, dtype=complex))) for p in psi_inits]
    iso_goals = [np.asarray(ket_to_iso(np.asarray(p, dtype=complex))) for p in psi_goals]
    dts = (
        np.full((T,), float(dt)) if np.isscalar(dt) else np.asarray(dt).reshape(-1)
    )
    trajs = []
    for i0, g0 in zip(iso_inits, iso_goals):
        if a_guess is None:
            trajs.append(linear_interpolation(i0, g0, T))
        else:
            assert system is not None
            trajs.append(
                np.asarray(
                    rollout(
                        i0, np.asarray(a_guess), dts, system,
                        integrator=rollout_integrator,
                    )
                )
            )
    return initialize_trajectory(
        trajs,
        iso_inits,
        iso_goals,
        state_names,
        T,
        dt,
        n_drives,
        control_bounds,
        a_guess=a_guess,
        rng=rng,
        **kwargs,
    )


def initialize_density_trajectory(
    rho_init,
    rho_goal,
    T: int,
    dt,
    n_drives: int,
    control_bounds,
    *,
    state_name: str = "ρ⃗̃",
    a_guess=None,
    system=None,
    rollout_integrator: str = "expm",
    rng=None,
    **kwargs,
) -> NamedTrajectory:
    """Density-matrix trajectory init (reference :516-567)."""
    v_init = np.asarray(density_to_iso_vec(np.asarray(rho_init, dtype=complex)))
    v_goal = np.asarray(density_to_iso_vec(np.asarray(rho_goal, dtype=complex)))
    dts = (
        np.full((T,), float(dt)) if np.isscalar(dt) else np.asarray(dt).reshape(-1)
    )
    if a_guess is None:
        traj_data = linear_interpolation(v_init, v_goal, T)
    else:
        assert system is not None
        traj_data = np.asarray(
            open_rollout(
                v_init, np.asarray(a_guess), dts, system,
                integrator=rollout_integrator,
            )
        )
    return initialize_trajectory(
        [traj_data],
        [v_init],
        [v_goal],
        [state_name],
        T,
        dt,
        n_drives,
        control_bounds,
        a_guess=a_guess,
        rng=rng,
        **kwargs,
    )
