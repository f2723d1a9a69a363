"""Flat-index helpers: knot-point <-> flat decision-vector mapping.

Re-implements the reference's TrajectoryIndexingUtils surface (`index`,
`slice`; dependency table /root/reference/Project.toml and call sites in
test/scripts/integrator_test_script.jl).  All indices 0-based.

The flat decision vector is Z = [z_0; z_1; ...; z_{T-1}; globals] with each
knot row of length dim (time-major, matching NamedTrajectory.flatten()).
"""

from __future__ import annotations

__all__ = ["index", "slice_at", "comp_slice_at"]


def index(t: int, pos: int, dim: int) -> int:
    """Flat index of coordinate `pos` at knot `t` (rows of length `dim`)."""
    return t * dim + pos


def slice_at(t: int, dim: int, *, start: int = 0, stop: int | None = None) -> slice:
    """Flat slice of knot t's row (optionally a sub-range [start, stop))."""
    stop = dim if stop is None else stop
    return slice(t * dim + start, t * dim + stop)


def comp_slice_at(traj, name: str, t: int) -> slice:
    """Flat slice of component `name` at knot `t` of a NamedTrajectory."""
    start, stop = traj.components[name]
    return slice(t * traj.dim + start, t * traj.dim + stop)
