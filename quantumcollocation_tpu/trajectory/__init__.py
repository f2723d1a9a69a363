"""Trajectory containers, initialization, interpolation, and direct sums."""

from .named_trajectory import NamedTrajectory, derivative
from .initialization import (
    initialize_control_trajectory,
    initialize_density_trajectory,
    initialize_state_trajectory,
    initialize_trajectory,
    initialize_unitary_trajectory,
    linear_interpolation,
    unitary_geodesic,
    unitary_linear_interpolation,
)
from .interpolation import DataInterpolation, resample_free_time
from .directsums import add_suffix, get_suffix, merge, remove_suffix
from .indexing import comp_slice_at, index, slice_at

__all__ = [name for name in dir() if not name.startswith("_")]
