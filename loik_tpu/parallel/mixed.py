"""Mixed-topology batches (e.g. "UR5 + Panda mixed batch", BASELINE.json
configs[1]).

Different kinematic trees compile to different programs (topology is static
by design), so a mixed batch is solved as one jitted solve per distinct
topology group — each group still batched and shardable.  This mirrors how a
fleet controller with heterogeneous robots would organize work; there is no
reference analog (the C++ solver binds one Model per instance).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..params import SolverParams
from ..problem import IkProblem
from ..solver import solve
from ..solver.state import SolveResult


def solve_mixed(
    groups: Sequence[Tuple[object, object, IkProblem]],
    params: SolverParams,
) -> List[SolveResult]:
    """Solve [(tree, q_batch, problem), ...] — one compiled program per
    topology, dispatched back-to-back (XLA overlaps dispatch with device
    work).  Returns results in group order."""
    results = []
    for tree, q, problem in groups:
        results.append(solve(tree, params, q, problem))
    return results
