"""Fidelity functions in iso coordinates.

Mirrors the reference surface: iso_fidelity, iso_vec_unitary_fidelity,
iso_vec_unitary_free_phase_fidelity (call sites:
/root/reference/src/problem_templates/unitary_minimum_time_problem.jl:77,88-90,
quantum_state_minimum_time_problem.jl:50).

All functions are pure jax and differentiable; subspace restriction is a
static index gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import expm as _expm

from .isomorphisms import iso_to_ket, iso_vec_to_operator

__all__ = [
    "fidelity",
    "iso_fidelity",
    "unitary_fidelity",
    "iso_vec_unitary_fidelity",
    "iso_vec_unitary_free_phase_fidelity",
    "density_pure_state_fidelity",
]


def fidelity(psi, psi_goal):
    """|<psi_goal|psi>|^2 for complex kets."""
    psi = jnp.asarray(psi)
    psi_goal = jnp.asarray(psi_goal)
    return jnp.abs(jnp.vdot(psi_goal, psi)) ** 2


def iso_fidelity(psi_iso, psi_goal_iso):
    """|<goal|psi>|^2 for iso (real [Re; Im]) kets."""
    return fidelity(iso_to_ket(psi_iso), iso_to_ket(psi_goal_iso))


def _maybe_subspace(U, subspace):
    if subspace is None:
        return U
    idx = np.asarray(subspace)
    return U[..., idx[:, None], idx[None, :]]


def unitary_fidelity(U, U_goal, subspace=None):
    """F = |tr(U_goal^† U)| / n, optionally restricted to a subspace block."""
    U = _maybe_subspace(jnp.asarray(U), subspace)
    U_goal = _maybe_subspace(jnp.asarray(U_goal), subspace)
    n = U.shape[-1]
    tr = jnp.trace(U_goal.conj().swapaxes(-1, -2) @ U, axis1=-2, axis2=-1)
    return jnp.abs(tr) / n


def iso_vec_unitary_fidelity(U_iso_vec, U_goal_iso_vec, subspace=None):
    """Unitary fidelity on iso-vec representations."""
    U = iso_vec_to_operator(U_iso_vec)
    U_goal = iso_vec_to_operator(U_goal_iso_vec)
    return unitary_fidelity(U, U_goal, subspace=subspace)


def free_phase_rotation(phases, phase_operators):
    """R(phi) = exp(i sum_k phi_k G_k) as a complex matrix.

    Real and imaginary parts are transferred separately so no complex
    host<->device copies occur (some TPU runtimes only support real
    transfers; complex arithmetic on device is fine).
    """
    ops = np.stack(
        [np.asarray(op) for op in phase_operators]
    ) if isinstance(phase_operators, (list, tuple)) else np.asarray(
        phase_operators
    )
    phases = jnp.asarray(phases)
    gen_re = jnp.tensordot(phases, jnp.asarray(ops.real, phases.dtype), axes=1)
    gen_im = jnp.tensordot(phases, jnp.asarray(ops.imag, phases.dtype), axes=1)
    return _expm(1j * gen_re - gen_im)


def iso_vec_unitary_free_phase_fidelity(
    U_iso_vec, U_goal_iso_vec, phases, phase_operators, subspace=None
):
    """Fidelity up to optimizable global phases exp(i phi_k G_k).

    The achieved unitary is rotated by R(phi) before comparison:
    F = |tr(U_goal^† R(phi) U)| / n.
    """
    U = iso_vec_to_operator(U_iso_vec)
    U_goal = iso_vec_to_operator(U_goal_iso_vec)
    R = free_phase_rotation(phases, phase_operators)
    return unitary_fidelity(R @ U, U_goal, subspace=subspace)


def density_pure_state_fidelity(rho, psi_goal):
    """<psi|rho|psi> for a density matrix against a pure goal state."""
    rho = jnp.asarray(rho)
    psi = jnp.asarray(psi_goal)
    return jnp.real(psi.conj() @ rho @ psi)
