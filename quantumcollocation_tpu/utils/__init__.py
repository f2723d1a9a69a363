"""Callbacks, serialization, and observability utilities."""

from .callbacks import (
    best_rollout_fidelity_callback,
    ipopt_callback_adapter,
    kkt_history_callback,
    trajectory_history_callback,
)
from .serialization import load_trajectory, save_trajectory
from .losses import expv, fidelity
from .plotting import plot_trajectory

__all__ = [
    "best_rollout_fidelity_callback",
    "ipopt_callback_adapter",
    "kkt_history_callback",
    "trajectory_history_callback",
    "load_trajectory",
    "save_trajectory",
    "expv",
    "fidelity",
    "plot_trajectory",
]
