from . import distributed
from .mixed import (MixedPadded, prepare_mixed_padded, solve_mixed,
                    solve_mixed_padded)
from .multistart import MultistartResult, solve_multistart, task_error
from .sharding import (
    convergence_metrics,
    make_mesh,
    shard_problem_batch,
    solve_sharded,
)

__all__ = [
    "make_mesh",
    "shard_problem_batch",
    "solve_sharded",
    "convergence_metrics",
    "MultistartResult",
    "solve_multistart",
    "task_error",
    "solve_mixed",
    "solve_mixed_padded",
    "prepare_mixed_padded",
    "MixedPadded",
    "distributed",
]
