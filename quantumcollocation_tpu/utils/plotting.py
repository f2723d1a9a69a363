"""Trajectory plotting.

The reference gets `plot(traj)` from NamedTrajectories.jl (used in its docs,
/root/reference/docs/literate/man/ipopt_callbacks.jl:61-64).  Equivalent
here: per-component subplots over the trajectory's time grid.  matplotlib is
imported lazily so headless/compute-only installs never pay for it.
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_trajectory"]


def plot_trajectory(
    traj,
    names=None,
    *,
    path: str | None = None,
    fig_kwargs: dict | None = None,
):
    """Plot trajectory components over time (one subplot per component).

    names: component names to plot (default: all but the timestep row).
    path: if given, save the figure there (PNG/PDF by extension).
    Returns the matplotlib Figure.
    """
    import matplotlib

    if path is not None:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if names is None:
        names = [
            n
            for n in traj.names
            if not (isinstance(traj.timestep, str) and n == traj.timestep)
        ]
    names = [n for n in names if n in traj.names]
    times = np.asarray(traj.get_times())

    fig, axes = plt.subplots(
        len(names),
        1,
        sharex=True,
        figsize=(8, 2.2 * len(names)),
        squeeze=False,
        **(fig_kwargs or {}),
    )
    for ax, name in zip(axes[:, 0], names):
        block = np.asarray(traj[name])
        for j in range(block.shape[1]):
            ax.plot(times, block[:, j], lw=1.2, label=f"{name}[{j}]")
        ax.set_ylabel(name)
        if block.shape[1] <= 4:
            ax.legend(loc="upper right", fontsize=7)
        ax.grid(True, alpha=0.3)
    axes[-1, 0].set_xlabel("time")
    fig.tight_layout()
    if path is not None:
        fig.savefig(path, dpi=120)
    return fig
