"""Two-stage mixed-precision solve: f32 bulk + f64 warm refinement.

Single precision cannot certify tol 1e-6 on this problem class: the
augmented-Lagrangian penalty mu_eq (default 1e4 * mu) amplifies the Riccati
operands to ||H|| ~ 1e2, so the computed iterates stall at ~eps_f32 * ||H||
~ 1e-5 absolute — measured: only ~70% of the f64-convergent problems pass
tol 1e-6 in pure f32, and the stalled ones burn max_iter (SURVEY.md §7 hard
part 3 anticipated this).

The fix exploits ADMM's warm-startability (the same property the reference
uses across control ticks): run the solver in f32 at a tolerance safely
above the f32 floor, then continue the unconverged-at-1e-6 problems in f64
from the f32 state for a handful of iterations.  Stage 2 pays the TPU f64
emulation cost only on the short tail, not the bulk of the work.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..params import SolverParams
from ..problem import IkProblem
from .solve import solve
from .state import SolveResult, SolverState


def _cast_state(st: SolverState, dtype) -> SolverState:
    def cast(x):
        if x is None:
            return None
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, st)


def _cast_problem(p: IkProblem, dtype) -> IkProblem:
    return IkProblem(
        H_ref=jnp.asarray(p.H_ref, dtype),
        v_ref=jnp.asarray(p.v_ref, dtype),
        A=jnp.asarray(p.A, dtype),
        b=jnp.asarray(p.b, dtype),
        lb=jnp.asarray(p.lb, dtype),
        ub=jnp.asarray(p.ub, dtype),
        constraint_links=p.constraint_links,
    )


def solve_two_stage(
    tree,
    params: SolverParams,
    q,
    problem: IkProblem,
    stage1_tol: float = 2e-5,
    stage2_max_iter: Optional[int] = None,
    warm_state: Optional[SolverState] = None,
) -> SolveResult:
    """Solve at params.tol_abs/tol_rel accuracy using f32 for the bulk and a
    warm f64 tail.  `tree`/`q`/`problem` may be f32 or f64; outputs are f64.

    Requires jax x64 to be enabled for stage 2."""
    tol1 = max(stage1_tol, params.tol_abs)
    p1 = params.replace(tol_abs=tol1, tol_rel=max(stage1_tol, params.tol_rel))
    tree32 = tree.astype(jnp.float32)
    res1 = solve(tree32, p1, jnp.asarray(q, jnp.float32),
                 _cast_problem(problem, jnp.float32),
                 _cast_state(warm_state, jnp.float32) if warm_state is not None else None)

    # stage 2: continue EVERY problem in f64 from the f32 state at the target
    # tolerance (already-converged ones terminate in one or two cheap
    # iterations; stalled ones refine; infeasible ones re-certify).
    p2 = params.replace(
        warm_start=True,
        max_iter=stage2_max_iter or max(20, params.max_iter // 4),
    )
    tree64 = tree.astype(jnp.float64)
    res2 = solve(tree64, p2, jnp.asarray(q, jnp.float64),
                 _cast_problem(problem, jnp.float64),
                 _cast_state(res1.state, jnp.float64))
    # report combined iteration counts
    total_iters = res1.iterations + res2.iterations
    return dataclasses.replace(res2, iterations=total_iters)
