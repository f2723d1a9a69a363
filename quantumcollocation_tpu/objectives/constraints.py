"""Constraint objects.

Mirrors the reference's constraint surface (SURVEY.md §2b):
FinalUnitaryFidelityConstraint / FinalUnitaryFreePhaseFidelityConstraint /
FinalQuantumStateFidelityConstraint (nonlinear terminal inequalities),
TimeStepsAllEqualConstraint (linear equality, lowered to defect rows to keep
the KKT block-tridiagonal), ComplexModulusConstraint (per-knot inequality),
and the L1 slack inequalities.

Inequality constraints expose `ineq_dim(traj)` and `ineq(z, t, traj)` which
returns g >= 0 rows; rows inactive at knot t must return a positive constant
(the compiler relies on `jnp.where(active, g, 1.0)` having zero gradient for
inactive rows).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

from ..quantum.fidelities import (
    iso_fidelity,
    iso_vec_unitary_fidelity,
    iso_vec_unitary_free_phase_fidelity,
)

__all__ = [
    "AbstractConstraint",
    "FinalUnitaryFidelityConstraint",
    "FinalUnitaryFreePhaseFidelityConstraint",
    "FinalQuantumStateFidelityConstraint",
    "TimeStepsAllEqualConstraint",
    "ComplexModulusConstraint",
    "ComplexModulusContraint",
    "L1SlackConstraint",
    "BoundsConstraint",
]


class AbstractConstraint:
    """Base class for constraints attached to a QuantumControlProblem."""

    def ineq_dim(self, traj) -> int:
        return 0

    def ineq(self, z, t, traj):
        return jnp.zeros((0,))


@dataclasses.dataclass
class FinalUnitaryFidelityConstraint(AbstractConstraint):
    """F(U_T, U_goal) >= final_fidelity (reference:
    unitary_minimum_time_problem.jl:80-84)."""

    state_name: str
    final_fidelity: float
    subspace: Any = None

    def ineq_dim(self, traj) -> int:
        return 1

    def ineq(self, z, t, traj):
        start, stop = traj.components[self.state_name]
        goal = jnp.asarray(traj.goal[self.state_name])
        sub = None if self.subspace is None else tuple(self.subspace)
        F = iso_vec_unitary_fidelity(z[start:stop], goal, subspace=sub)
        val = F - self.final_fidelity
        return jnp.where(t == traj.T - 1, val, 1.0)[None]


@dataclasses.dataclass
class FinalUnitaryFreePhaseFidelityConstraint(AbstractConstraint):
    """Free-phase variant (reference: unitary_minimum_time_problem.jl:93-97).

    The phases live in the global tail of z_{T-1}; `global_slices` is filled
    in by the problem compiler.
    """

    state_name: str
    phase_name: str
    phase_operators: Any
    final_fidelity: float
    subspace: Any = None
    global_slices: Any = None  # injected by compiler: {name: (start, stop)}

    def ineq_dim(self, traj) -> int:
        return 1

    def ineq(self, z, t, traj):
        start, stop = traj.components[self.state_name]
        goal = jnp.asarray(traj.goal[self.state_name])
        sub = None if self.subspace is None else tuple(self.subspace)
        gs, ge = self.global_slices[self.phase_name]
        phases = z[gs:ge]
        ops = np.stack([np.asarray(op) for op in self.phase_operators])
        F = iso_vec_unitary_free_phase_fidelity(
            z[start:stop], goal, phases, ops, subspace=sub
        )
        return jnp.where(t == traj.T - 1, F - self.final_fidelity, 1.0)[None]


@dataclasses.dataclass
class FinalQuantumStateFidelityConstraint(AbstractConstraint):
    """|<goal|psi_T>|^2 >= final_fidelity (reference:
    quantum_state_minimum_time_problem.jl:55-60)."""

    state_name: str
    final_fidelity: float

    def ineq_dim(self, traj) -> int:
        return 1

    def ineq(self, z, t, traj):
        start, stop = traj.components[self.state_name]
        goal = jnp.asarray(traj.goal[self.state_name])
        F = iso_fidelity(z[start:stop], goal)
        return jnp.where(t == traj.T - 1, F - self.final_fidelity, 1.0)[None]


@dataclasses.dataclass
class TimeStepsAllEqualConstraint(AbstractConstraint):
    """dt_t = dt_{t+1} for all t — lowered by the compiler into defect rows
    (TimeStepEqualityIntegrator) to preserve the banded KKT structure
    (reference: _problem_templates.jl:59-63)."""

    timestep_name: str = "Δt"

    def as_integrator(self):
        from ..dynamics.integrators import TimeStepEqualityIntegrator

        return TimeStepEqualityIntegrator(self.timestep_name)


@dataclasses.dataclass
class ComplexModulusConstraint(AbstractConstraint):
    """|v_re + i v_im| <= R per knot: rows R^2 - v_re^2 - v_im^2 >= 0.

    Component pairs default to (i, i + k/2) (first half real, second half
    imaginary), or pass explicit `pairs`.  Reference (exported with the
    upstream typo 'ComplexModulusContraint'): _problem_templates.jl:66-73.
    """

    name: str
    radius: float
    pairs: Any = None

    def _pairs(self, traj):
        start, stop = traj.components[self.name]
        k = stop - start
        if self.pairs is not None:
            return [(start + i, start + j) for i, j in self.pairs]
        assert k % 2 == 0, "complex modulus needs an even component"
        return [(start + i, start + k // 2 + i) for i in range(k // 2)]

    def ineq_dim(self, traj) -> int:
        return len(self._pairs(traj))

    def ineq(self, z, t, traj):
        rows = [
            self.radius**2 - z[i] ** 2 - z[j] ** 2
            for i, j in self._pairs(traj)
        ]
        return jnp.stack(rows)


# reference-parity alias (the upstream export carries this typo)
ComplexModulusContraint = ComplexModulusConstraint


@dataclasses.dataclass
class L1SlackConstraint(AbstractConstraint):
    """Slack inequalities for L1 regularization: s - v >= 0 and s + v >= 0."""

    name: str
    slack_name: str
    indices: Sequence[int]

    def ineq_dim(self, traj) -> int:
        return 2 * len(self.indices)

    def ineq(self, z, t, traj):
        start, _ = traj.components[self.name]
        s_start, _ = traj.components[self.slack_name]
        idx = jnp.asarray(list(self.indices))
        v = z[start + idx]
        s = z[s_start + jnp.arange(len(self.indices))]
        return jnp.concatenate([s - v, s + v])


@dataclasses.dataclass
class BoundsConstraint(AbstractConstraint):
    """Marker object: box bounds come from trajectory metadata and are
    enforced natively by the IPM barrier; kept for API parity."""

    name: str = ""
