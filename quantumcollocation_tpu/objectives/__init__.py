"""Objectives, regularizers, and constraints."""

from .objectives import (
    DensityOperatorPureStateInfidelityObjective,
    L1Regularizer,
    MinimumTimeObjective,
    NullObjective,
    Objective,
    ObjectiveTerm,
    PairwiseQuadraticRegularizer,
    QuadraticRegularizer,
    QuadraticSmoothnessRegularizer,
    QuantumStateObjective,
    UnitaryFreePhaseInfidelityObjective,
    UnitaryInfidelityObjective,
    UnitaryRobustnessObjective,
)
from .constraints import (
    AbstractConstraint,
    BoundsConstraint,
    ComplexModulusConstraint,
    ComplexModulusContraint,
    FinalQuantumStateFidelityConstraint,
    FinalUnitaryFidelityConstraint,
    FinalUnitaryFreePhaseFidelityConstraint,
    L1SlackConstraint,
    TimeStepsAllEqualConstraint,
)

__all__ = [name for name in dir() if not name.startswith("_")]
