from .solve import fwd_pass_init, prepare_problem, solve
from .state import PreparedProblem, SolverState, SolveResult, init_state
from .diff import solve_unrolled
from .stream import StreamResult, solve_stream
from .clik import ClikResult, solve_clik

__all__ = [
    "solve",
    "solve_stream",
    "solve_clik",
    "ClikResult",
    "solve_unrolled",
    "prepare_problem",
    "fwd_pass_init",
    "SolverState",
    "SolveResult",
    "StreamResult",
    "PreparedProblem",
    "init_state",
]
