"""Convenience fidelity accessors (the reference's Losses.fidelity surface,
/root/reference/docs/literate/man/ipopt_callbacks.jl:85-88)."""

from __future__ import annotations

import jax.numpy as jnp

from ..dynamics.rollouts import (
    rollout_fidelity,
    unitary_rollout_fidelity,
)

__all__ = ["fidelity", "expv"]


def fidelity(prob_or_traj, system=None, **kwargs):
    """Rollout fidelity of a problem or trajectory.

    fidelity(prob)            -> uses prob.trajectory and prob.system
    fidelity(traj, system)    -> explicit system
    Dispatches on the trajectory's state component: unitary (Ũ⃗*) or ket (ψ̃*).
    """
    if hasattr(prob_or_traj, "trajectory"):
        traj = prob_or_traj.trajectory
        system = system or prob_or_traj.system
    else:
        traj = prob_or_traj
    assert system is not None, "system required"

    unitary_names = [n for n in traj.names if n.startswith("Ũ⃗")]
    if unitary_names:
        return unitary_rollout_fidelity(
            traj, system, state_name=unitary_names[0], **kwargs
        )
    ket_names = [n for n in traj.names if n.startswith("ψ̃")]
    if ket_names:
        return rollout_fidelity(
            traj, system, state_name=ket_names[0], **kwargs
        )
    raise ValueError("no unitary or ket state component found")


def expv(t, A, b, *, m: int = 24, substeps: int = 2, matvec=None):
    """exp(t*A) @ b — the ExponentialAction.jl `expv` analog
    (/root/reference/src/trajectory_initialization.jl:398).

    Krylov (Arnoldi) action: never forms exp(t*A), so it scales to the
    cat/composite Hilbert spaces where dense scaling-and-squaring is
    prohibitive.  `A` may be a matrix or a matvec callable (pass
    matvec=... for operators too large to materialize, e.g.
    OpenQuantumSystem.lindblad_action)."""
    from ..dynamics.expv import expv_krylov

    return expv_krylov(t, A, b, m=m, substeps=substeps, matvec=matvec)
