"""The in-house batched interior-point solver over stage-structured NLPs."""

from .options import IpoptOptions, PiccoloOptions, SolverOptions
from .stage_nlp import NLPFunctions, StageNLP, make_nlp_functions
from .kkt import solve_kkt
from .ipm import InteriorPointSolver, IPMResult, IPMState

__all__ = [
    "IpoptOptions",
    "PiccoloOptions",
    "SolverOptions",
    "NLPFunctions",
    "StageNLP",
    "make_nlp_functions",
    "solve_kkt",
    "InteriorPointSolver",
    "IPMResult",
    "IPMState",
]
