"""Trajectory interpolation / resampling.

Re-implements the reference's DataInterpolation
(/root/reference/src/trajectory_interpolations.jl:18-72): per-component
linear (or previous-value) interpolants over a trajectory's time grid,
callable at arbitrary times or resampled to a new knot count.  Timestep
components are recomputed from time differences, not interpolated.
"""

from __future__ import annotations

import numpy as np

from .named_trajectory import NamedTrajectory

__all__ = ["DataInterpolation", "resample_free_time"]


class DataInterpolation:
    """Interpolates a NamedTrajectory's components over time.

    interp = DataInterpolation(traj)
    interp(ts)      -> new NamedTrajectory sampled at times ts
    interp(T=120)   -> resampled to 120 evenly spaced knots over the duration
    """

    def __init__(self, traj: NamedTrajectory, *, kind: str = "linear"):
        self.traj = traj
        self.kind = kind
        self.times = np.asarray(traj.get_times())

    def __call__(self, times=None, *, T: int | None = None) -> NamedTrajectory:
        if times is None:
            assert T is not None, "provide times or T"
            times = np.linspace(self.times[0], self.times[-1], T)
        times = np.asarray(times, dtype=float)
        T_new = times.shape[0]

        traj = self.traj
        data_old = np.asarray(traj.data)
        comps = {}
        for name in traj.names:
            sl = traj.comp_slice(name)
            block = data_old[:, sl]
            if isinstance(traj.timestep, str) and name == traj.timestep:
                # recompute timesteps from the new time grid
                dts = np.diff(times)
                dts = np.append(dts, dts[-1] if len(dts) else 1.0)
                comps[name] = dts[:, None]
                continue
            if self.kind == "previous":
                idx = np.clip(
                    np.searchsorted(self.times, times, side="right") - 1,
                    0,
                    len(self.times) - 1,
                )
                comps[name] = block[idx]
            else:
                comps[name] = np.stack(
                    [
                        np.interp(times, self.times, block[:, j])
                        for j in range(block.shape[1])
                    ],
                    axis=1,
                )

        new = NamedTrajectory(
            comps,
            controls=tuple(
                c for c in traj.controls
                if not (isinstance(traj.timestep, str) and c == traj.timestep)
            ),
            timestep=traj.timestep
            if isinstance(traj.timestep, str)
            else float(np.diff(times).mean() if T_new > 1 else traj.timestep),
            bounds=dict(traj.bounds),
            initial=dict(traj.initial),
            final=dict(traj.final),
            goal=dict(traj.goal),
            global_data=dict(traj.global_data),
        )
        return new


def resample_free_time(
    traj: NamedTrajectory,
    *,
    T: int | None = None,
    timestep_name: str = "Δt",
    dt_bounds=None,
) -> NamedTrajectory:
    """Warm-start helper for minimum-time chains: resample a solved
    trajectory to ``T`` knots and promote the timestep to a decision
    component (the reference's re-grid-then-minimize workflow,
    /root/reference/src/problem_templates/unitary_minimum_time_problem.jl:151-171
    with DataInterpolation, /root/reference/src/trajectory_interpolations.jl:69-72).

    Works from either a fixed-time trajectory (adds the ``Δt`` component with
    bounds, default (0.5, 1.5)×mean dt) or an already-free-time one (resamples
    and keeps it).
    """
    new = DataInterpolation(traj)(T=T or traj.T)
    if isinstance(new.timestep, str):
        if new.timestep != timestep_name:
            raise ValueError(
                f"trajectory already has free timestep {new.timestep!r}"
            )
        return new

    dt = float(new.timestep)
    if dt_bounds is None:
        dt_bounds = (0.5 * dt, 1.5 * dt)
    comps = {name: np.asarray(new[name]) for name in new.names}
    comps[timestep_name] = np.full((new.T, 1), dt)
    bounds = dict(new.bounds)
    bounds[timestep_name] = dt_bounds
    return NamedTrajectory(
        comps,
        controls=new.controls,
        timestep=timestep_name,
        bounds=bounds,
        initial=dict(new.initial),
        final=dict(new.final),
        goal=dict(new.goal),
        global_data=dict(new.global_data),
    )
