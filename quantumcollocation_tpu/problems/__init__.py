"""Problem templates: pure-functional builders over batched trajectories."""

from .problem import QuantumControlProblem
from .unitary_smooth_pulse import UnitarySmoothPulseProblem

__all__ = ["QuantumControlProblem", "UnitarySmoothPulseProblem"]
