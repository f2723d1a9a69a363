"""Dynamics: matrix exponentials, collocation integrators, rollouts."""

from .expm import (
    default_num_squarings,
    expm_pade,
    expm_squaring,
    pade_coefficients,
    pade_numerator_denominator,
)
from .integrators import (
    AbstractIntegrator,
    RobustnessAccumulatorIntegrator,
    DensityOperatorExponentialIntegrator,
    DerivativeIntegrator,
    QuantumStateExponentialIntegrator,
    QuantumStatePadeIntegrator,
    TimeStepEqualityIntegrator,
    UnitaryExponentialIntegrator,
    UnitaryPadeIntegrator,
)
from .rollouts import (
    open_rollout,
    open_rollout_fidelity,
    rollout,
    rollout_fidelity,
    unitary_rollout,
    unitary_rollout_fidelity,
)

__all__ = [name for name in dir() if not name.startswith("_")]
