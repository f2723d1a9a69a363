"""quantumcollocation_tpu — TPU-native direct collocation for quantum optimal control.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
QuantumCollocation.jl stack (see SURVEY.md): quantum control problems are
nonlinear programs over knot-point trajectories (U_t, a_t, Δt_t) with dynamics
enforced as collocation defects, solved by an in-house batched primal-dual
interior-point method whose block-tridiagonal KKT system is factorized
stage-wise — all knots, all batch instances, and all multi-start seeds in
parallel on TPU.
"""

from .quantum import *  # noqa: F401,F403
from .quantum import __all__ as _quantum_all
from .trajectory import *  # noqa: F401,F403
from .trajectory import __all__ as _trajectory_all
from .dynamics import *  # noqa: F401,F403
from .dynamics import __all__ as _dynamics_all

__version__ = "0.1.0"

__all__ = list(_quantum_all) + list(_trajectory_all) + list(_dynamics_all)
