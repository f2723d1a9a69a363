"""Problem templates: pure-functional builders over batched trajectories.

The 10 templates mirror the reference's L5 surface (SURVEY.md §2a):
unitary smooth-pulse / minimum-time / robustness / direct-sum / sampling /
bang-bang, quantum-state smooth-pulse / minimum-time / sampling, and
density-operator smooth-pulse.
"""

from .problem import QuantumControlProblem
from .unitary_smooth_pulse import UnitarySmoothPulseProblem
from .unitary_minimum_time import UnitaryMinimumTimeProblem
from .unitary_robustness import UnitaryRobustnessProblem
from .unitary_direct_sum import UnitaryDirectSumProblem
from .unitary_sampling import (
    UnitarySamplingProblem,
    UnitarySamplingProblemFromDistribution,
)
from .unitary_bang_bang import UnitaryBangBangProblem
from .quantum_state_smooth_pulse import QuantumStateSmoothPulseProblem
from .quantum_state_minimum_time import QuantumStateMinimumTimeProblem
from .quantum_state_sampling import QuantumStateSamplingProblem
from .density_operator_smooth_pulse import DensityOperatorSmoothPulseProblem
from .multigoal import (
    UnitaryMultiGoalProblem,
    multigoal_initial_decisions,
    multigoal_rollout_fidelities,
    random_su,
)

__all__ = [
    "UnitaryMultiGoalProblem",
    "multigoal_initial_decisions",
    "multigoal_rollout_fidelities",
    "random_su",
    "QuantumControlProblem",
    "UnitarySmoothPulseProblem",
    "UnitaryMinimumTimeProblem",
    "UnitaryRobustnessProblem",
    "UnitaryDirectSumProblem",
    "UnitarySamplingProblem",
    "UnitarySamplingProblemFromDistribution",
    "UnitaryBangBangProblem",
    "QuantumStateSmoothPulseProblem",
    "QuantumStateMinimumTimeProblem",
    "QuantumStateSamplingProblem",
    "DensityOperatorSmoothPulseProblem",
]
