from .solve import fwd_pass_init, prepare_problem, solve
from .state import PreparedProblem, SolverState, SolveResult, init_state

__all__ = [
    "solve",
    "prepare_problem",
    "fwd_pass_init",
    "SolverState",
    "SolveResult",
    "PreparedProblem",
    "init_state",
]
