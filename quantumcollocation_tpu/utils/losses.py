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


def expv(t, A, b, *, order: int = 12, num_squarings: int = 8):
    """exp(t*A) @ b — the ExponentialAction.jl `expv` analog.

    Dense scaling-and-squaring (dimensions in this framework are small); the
    signature matches the reference's rollout_integrator hook
    (/root/reference/src/trajectory_initialization.jl:398).
    """
    from ..dynamics.expm import expm_squaring

    A = jnp.asarray(A)
    b = jnp.asarray(b)
    return expm_squaring(
        A * t, order=order, num_squarings=num_squarings
    ) @ b
