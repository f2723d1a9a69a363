"""Forward simulation (rollouts) for initialization and ground-truth validation.

The collocation solver's fidelity is always VALIDATED by rollout, never by
trusting the collocation state — mirroring the reference's test pattern
(/root/reference/src/problem_templates/unitary_smooth_pulse_problem.jl:218-221,
docs/literate/man/rollouts.jl:10-15).

Rollouts are sequential in t (lax.scan) and vmapped over batch instances.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..quantum.fidelities import (
    iso_fidelity,
    iso_vec_unitary_fidelity,
    iso_vec_unitary_free_phase_fidelity,
)
from .expm import expm_squaring

__all__ = [
    "rollout",
    "unitary_rollout",
    "open_rollout",
    "expv_action",
    "rollout_fidelity",
    "unitary_rollout_fidelity",
    "open_rollout_fidelity",
]


def _propagators(generators, dts, order=12, num_squarings=8):
    """Batched propagators exp(G_t dt_t) for all knots at once (parallel-in-t)."""
    X = generators * dts[:, None, None]
    return jax.vmap(
        partial(expm_squaring, order=order, num_squarings=num_squarings)
    )(X)


def _scan_apply(Ps, x0_mat):
    """Sequentially apply propagators: x_{t+1} = P_t x_t, return all knots."""

    def step(x, P):
        x_next = P @ x
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0_mat, Ps)
    return jnp.concatenate([x0_mat[None], xs], axis=0)


def expv_action(X, v, *, order: int = 12, substeps: int = 8):
    """exp(X) @ v WITHOUT forming exp(X): `substeps` Taylor applications of
    exp(X/substeps), each a Horner chain of matvecs — the ExponentialAction.jl
    `expv` analog (the reference's default rollout integrator,
    /root/reference/src/trajectory_initialization.jl:398).  Static iteration
    counts keep the whole chain jit/scan friendly."""
    Xs = X / substeps

    def substep(y, _):
        acc = y
        term = y
        for k in range(1, order + 1):
            term = (Xs @ term) / k
            acc = acc + term
        return acc, None

    y, _ = jax.lax.scan(substep, v, None, length=substeps)
    return y


def _scan_apply_expv(Xs, x0_mat, order=12, substeps=8):
    """Sequential expv rollout: x_{t+1} = exp(X_t) x_t via Taylor action."""

    def step(x, X):
        x_next = expv_action(X, x, order=order, substeps=substeps)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0_mat, Xs)
    return jnp.concatenate([x0_mat[None], xs], axis=0)


def _rollout_states(Gs, dts, x0_mat, integrator, order, num_squarings):
    """Dispatch on the rollout integrator hook (PiccoloOptions.rollout_integrator).

    Always runs at "highest" matmul precision: rollouts are GROUND-TRUTH
    validators (and initializers), and the TPU default bf16 matmul passes
    accumulate visible error over T sequential propagator applications
    (measured: a T=51 unitary rollout at default precision reported
    fidelity 1.13 — 13% off a value that cannot exceed 1)."""
    with jax.default_matmul_precision("highest"):
        if integrator == "expv":
            X = Gs * dts[:, None, None]
            return _scan_apply_expv(
                X, x0_mat, order=order, substeps=max(1, num_squarings)
            )
        if integrator == "krylov":
            from .expv import expv_krylov

            X = Gs * dts[:, None, None]

            def step(x, Xt):
                x_next = jax.vmap(
                    lambda col: expv_krylov(
                        1.0, Xt, col, m=min(24, Xt.shape[0]),
                        substeps=max(1, num_squarings // 4),
                    ),
                    in_axes=1,
                    out_axes=1,
                )(x)
                return x_next, x_next

            _, xs = jax.lax.scan(step, x0_mat, X)
            return jnp.concatenate([x0_mat[None], xs], axis=0)
        if integrator != "expm":
            raise ValueError(
                f"rollout integrator {integrator!r} not in "
                f"('expm', 'expv', 'krylov')"
            )
        Ps = _propagators(Gs, dts, order, num_squarings)
        return _scan_apply(Ps, x0_mat)


def rollout(
    psi_iso_init, controls, dts, system, *,
    integrator="expm", order=12, num_squarings=8,
):
    """Ket rollout.  controls: (T, n_drives); dts: (T,).  Returns (T, 2N).

    Uses the T-1 leading controls/timesteps (knot t propagates t -> t+1).
    """
    psi0 = jnp.asarray(psi_iso_init)
    Gs = jax.vmap(system.generator)(jnp.asarray(controls)[:-1])
    return _rollout_states(
        Gs, jnp.asarray(dts)[:-1], psi0[:, None],
        integrator, order, num_squarings,
    )[..., 0]


def unitary_rollout(
    U_iso_vec_init, controls, dts, system, *,
    integrator="expm", order=12, num_squarings=8,
):
    """Unitary rollout on iso-vec states.  Returns (T, 2N^2)."""
    v0 = jnp.asarray(U_iso_vec_init)
    n2 = v0.shape[-1]
    N = int(round((n2 / 2) ** 0.5))
    U0 = v0.reshape(N, 2 * N).T  # (2N, N) iso operator
    Gs = jax.vmap(system.generator)(jnp.asarray(controls)[:-1])
    Us = _rollout_states(
        Gs, jnp.asarray(dts)[:-1], U0, integrator, order, num_squarings
    )  # (T, 2N, N)
    return jnp.swapaxes(Us, -1, -2).reshape(Us.shape[0], -1)


def open_rollout(
    rho_iso_vec_init, controls, dts, system, *,
    integrator="expm", order=8, num_squarings=8, krylov_dim=24,
):
    """Density-matrix (Lindblad) rollout on iso-vec states. Returns (T, 2N^2).

    integrator="expv" uses the matrix-free Krylov action
    (dynamics/expv.py) through OpenQuantumSystem.lindblad_action — O(k N^3)
    complex matmuls per matvec instead of a dense (2N^2, 2N^2)
    superoperator, the only tractable path for large cat/composite Hilbert
    spaces (/root/reference/src/quantum_system_templates/cats.jl:9-53).
    Systems above OpenQuantumSystem.SUPEROP_MAX_LEVELS (no materialized
    superoperators) take this path automatically.
    """
    from .expv import expv_krylov

    r0 = jnp.asarray(rho_iso_vec_init)
    a = jnp.asarray(controls)[:-1]
    dt = jnp.asarray(dts)[:-1]
    if integrator == "expv" or system.D_drift is None:
        if integrator != "expv":
            # an explicit dense-integrator request cannot be honored on a
            # system above SUPEROP_MAX_LEVELS: warn instead of silently
            # substituting a method with different accuracy knobs (ADVICE r4)
            import warnings

            warnings.warn(
                "open_rollout: superoperators are unmaterialized for this "
                f"system (levels > SUPEROP_MAX_LEVELS); integrator="
                f"{integrator!r} is rerouted to the Krylov matvec path "
                "(accuracy set by krylov_dim/substeps, not order)",
                stacklevel=2,
            )
        with jax.default_matmul_precision("highest"):

            def step(rho, inp):
                a_t, dt_t = inp
                rho1 = expv_krylov(
                    dt_t,
                    None,
                    rho,
                    m=krylov_dim,
                    substeps=max(1, num_squarings),
                    matvec=lambda v: system.lindblad_action(a_t, v),
                )
                return rho1, rho1

            _, rhos = jax.lax.scan(step, r0, (a, dt))
        return jnp.concatenate([r0[None], rhos], axis=0)
    Ds = jax.vmap(system.lindblad_generator)(a)
    return _rollout_states(
        Ds, dt, r0[:, None], integrator, order, num_squarings,
    )[..., 0]


# --------------------------------------------------------------------------- #
# trajectory-level fidelity validation
# --------------------------------------------------------------------------- #


def _traj_controls(traj, drive_name="a"):
    return traj[drive_name], traj.get_timesteps()


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=None)
def _ket_fid_jit(integrator):
    @jax.jit
    def f(psi0, a, dts, goal, system):
        with jax.default_matmul_precision("highest"):
            psis = rollout(psi0, a, dts, system, integrator=integrator)
            return iso_fidelity(psis[-1], goal)

    return f


@lru_cache(maxsize=None)
def _unitary_fid_jit(integrator, subspace):
    @jax.jit
    def f(v0, a, dts, goal, system):
        with jax.default_matmul_precision("highest"):
            Us = unitary_rollout(v0, a, dts, system, integrator=integrator)
            return iso_vec_unitary_fidelity(
                Us[-1], goal, subspace=subspace
            )

    return f


@lru_cache(maxsize=None)
def _unitary_fid_phase_jit(integrator, subspace):
    @jax.jit
    def f(v0, a, dts, goal, phases, A, B, system):
        with jax.default_matmul_precision("highest"):
            return _f(v0, a, dts, goal, phases, A, B, system)

    def _f(v0, a, dts, goal, phases, A, B, system):
        Us = unitary_rollout(v0, a, dts, system, integrator=integrator)
        dtype = phases.dtype
        Abar = jnp.tensordot(phases, A.astype(dtype), axes=1)
        Bbar = jnp.tensordot(phases, B.astype(dtype), axes=1)
        K = jnp.concatenate(
            [
                jnp.concatenate([-Bbar, -Abar], axis=-1),
                jnp.concatenate([Abar, -Bbar], axis=-1),
            ],
            axis=-2,
        )
        from jax.scipy.linalg import expm as _expm

        from ..quantum.isomorphisms import iso_vec_to_iso_operator

        R_iso = _expm(K)
        Uo = iso_vec_to_iso_operator(Us[-1])
        RU = R_iso @ Uo
        n = Uo.shape[-1]
        Ure, Uim = RU[:n, :], RU[n:, :]
        Go = iso_vec_to_iso_operator(goal)
        Gre, Gim = Go[:n, :], Go[n:, :]
        if subspace is not None:
            import numpy as _np

            idx = _np.asarray(subspace)
            Ure = Ure[idx[:, None], idx[None, :]]
            Uim = Uim[idx[:, None], idx[None, :]]
            Gre = Gre[idx[:, None], idx[None, :]]
            Gim = Gim[idx[:, None], idx[None, :]]
            n = len(idx)
        from ..quantum.fidelities import _safe_abs

        re = jnp.sum(Gre * Ure + Gim * Uim)
        im = jnp.sum(Gre * Uim - Gim * Ure)
        return _safe_abs(re, im, jnp) / n

    return f


def rollout_fidelity(
    traj, system, *, state_name="ψ̃", drive_name="a", integrator="expm"
):
    """Ground-truth ket fidelity: roll initial state forward under the
    trajectory's controls and compare with the goal.

    The whole computation runs as ONE jitted call (cached per integrator/
    shape): eager per-op dispatch would pay a relay round trip per op on
    remote TPU runtimes, and no complex array ever exists device-side."""
    a, dts = _traj_controls(traj, drive_name)
    psi0 = jnp.asarray(traj.initial[state_name])
    goal = jnp.asarray(traj.goal[state_name])
    return _ket_fid_jit(integrator)(
        psi0, jnp.asarray(a), jnp.asarray(dts), goal, system
    )


def unitary_rollout_fidelity(
    traj,
    system,
    *,
    state_name="Ũ⃗",
    drive_name="a",
    subspace=None,
    phases=None,
    phase_operators=None,
    integrator="expm",
):
    """Ground-truth unitary fidelity by rollout (the reference's
    `unitary_rollout_fidelity`, call sites unitary_smooth_pulse_problem.jl:218-221).

    One jitted call per (integrator, subspace, shape) — see rollout_fidelity.
    """
    import numpy as np

    a, dts = _traj_controls(traj, drive_name)
    v0 = jnp.asarray(traj.initial[state_name])
    goal = jnp.asarray(traj.goal[state_name])
    sub = None if subspace is None else tuple(int(i) for i in subspace)
    if phases is not None:
        ops = (
            np.stack([np.asarray(op) for op in phase_operators])
            if isinstance(phase_operators, (list, tuple))
            else np.asarray(phase_operators)
        )
        A = jnp.asarray(np.ascontiguousarray(ops.real))
        B = jnp.asarray(np.ascontiguousarray(ops.imag))
        return _unitary_fid_phase_jit(integrator, sub)(
            v0, jnp.asarray(a), jnp.asarray(dts), goal,
            jnp.asarray(phases), A, B, system,
        )
    return _unitary_fid_jit(integrator, sub)(
        v0, jnp.asarray(a), jnp.asarray(dts), goal, system
    )


def open_rollout_fidelity(
    traj, system, psi_goal, *, state_name="ρ⃗̃", drive_name="a",
    integrator="expm",
):
    """Rollout fidelity <psi|rho_T|psi> for open-system pulse design."""
    from ..quantum.fidelities import iso_vec_density_pure_state_fidelity

    a, dts = _traj_controls(traj, drive_name)
    r0 = jnp.asarray(traj.initial[state_name])
    rhos = open_rollout(r0, a, dts, system, integrator=integrator)
    return iso_vec_density_pure_state_fidelity(rhos[-1], psi_goal)
