"""The in-house batched interior-point solver over stage-structured NLPs."""

from .options import IpoptOptions, PiccoloOptions, SolverOptions
from .stage_nlp import (
    NLPFunctions,
    StageNLP,
    make_nlp_functions,
    scale_stage_nlp,
)

# reference-parity alias: the reference's QuantumDynamics compiles integrators
# into defect/Jacobian/Hessian evaluators — here that role is played by the
# StageNLP IR + make_nlp_functions
QuantumDynamics = NLPFunctions
from .kkt import solve_kkt
from .ipm import InteriorPointSolver, IPMResult, IPMState

__all__ = [
    "IpoptOptions",
    "PiccoloOptions",
    "SolverOptions",
    "NLPFunctions",
    "StageNLP",
    "make_nlp_functions",
    "scale_stage_nlp",
    "QuantumDynamics",
    "solve_kkt",
    "InteriorPointSolver",
    "IPMResult",
    "IPMState",
]
