"""Direct-sum utilities: suffixing and merging trajectories.

Re-implements the reference's DirectSums module surface (call sites:
/root/reference/src/problem_templates/unitary_direct_sum_problem.jl:104,125-128,
unitary_sampling_problem.jl:103-107): `add_suffix` renames components, and
`merge` concatenates trajectories into one, keeping a single copy of
components listed in `merge_names`.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Mapping, Sequence

import numpy as np

from .named_trajectory import NamedTrajectory

__all__ = ["add_suffix", "merge", "get_suffix", "remove_suffix"]


def add_suffix(obj, suffix: str):
    """Suffix a name, list of names, or all component names of a trajectory."""
    if isinstance(obj, str):
        return obj + suffix
    if isinstance(obj, (list, tuple)):
        return type(obj)(add_suffix(o, suffix) for o in obj)
    if isinstance(obj, NamedTrajectory):
        traj = obj
        comps = {
            name + suffix: np.asarray(traj[name]) for name in traj.names
        }
        rename = lambda d: {k + suffix: v for k, v in d.items()}
        return NamedTrajectory(
            comps,
            controls=tuple(c + suffix for c in traj.controls),
            timestep=(
                traj.timestep + suffix
                if isinstance(traj.timestep, str)
                else traj.timestep
            ),
            bounds=rename(traj.bounds),
            initial=rename(traj.initial),
            final=rename(traj.final),
            goal=rename(traj.goal),
            global_data=rename(traj.global_data),
        )
    # integrators provide their own add_suffix
    if hasattr(obj, "add_suffix"):
        return obj.add_suffix(suffix)
    raise TypeError(f"cannot suffix {type(obj)}")


def get_suffix(name: str, base: str) -> str:
    assert name.startswith(base)
    return name[len(base):]


def remove_suffix(name: str, suffix: str) -> str:
    assert name.endswith(suffix)
    return name[: -len(suffix)] if suffix else name


def merge(
    trajs: Sequence[NamedTrajectory],
    *,
    merge_names: Mapping[str, int] | None = None,
    free_time: bool | None = None,
    timestep_name: str = "Δt",
) -> NamedTrajectory:
    """Merge trajectories into one with concatenated components.

    merge_names maps a BASE component name -> 1-based index of the trajectory
    whose copy is kept (reference convention: merge(trajs,
    merge_names=(;a=1, da=1, dda=1, Δt=1)) at
    /root/reference/src/problem_templates/unitary_sampling_problem.jl:103-107).
    Components named `name` in trajs[i] are assumed pre-suffixed EXCEPT those
    being merged, which must carry the same base name in every trajectory.
    """
    merge_names = dict(merge_names or {})
    T = trajs[0].T
    assert all(t.T == T for t in trajs), "all trajectories must share T"

    comps = OrderedDict()
    bounds, initial, final, goal, global_data = {}, {}, {}, {}, {}
    controls = []
    timestep = None

    def take(traj, name, into_name):
        comps[into_name] = np.asarray(traj[name])
        if name in traj.bounds:
            bounds[into_name] = traj.bounds[name]
        if name in traj.initial:
            initial[into_name] = traj.initial[name]
        if name in traj.final:
            final[into_name] = traj.final[name]
        if name in traj.goal:
            goal[into_name] = traj.goal[name]

    merged_done = set()
    for i, traj in enumerate(trajs):
        for name in traj.names:
            base = name
            if base in merge_names:
                if base in merged_done:
                    continue
                keeper = merge_names[base] - 1
                take(trajs[keeper], base, base)
                merged_done.add(base)
                if base in trajs[keeper].controls:
                    controls.append(base)
            else:
                take(traj, name, name)
                if name in traj.controls:
                    controls.append(name)
        for gname, gval in traj.global_data.items():
            global_data.setdefault(gname, gval)
        if timestep is None:
            timestep = traj.timestep

    if free_time is None:
        free_time = isinstance(timestep, str)
    if free_time and not isinstance(timestep, str):
        timestep = timestep_name

    return NamedTrajectory(
        comps,
        controls=tuple(dict.fromkeys(controls)),
        timestep=timestep,
        bounds=bounds,
        initial=initial,
        final=final,
        goal=goal,
        global_data=global_data,
    )
