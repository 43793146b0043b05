"""Multi-start global IK: the pod-scale demo workload (BASELINE.json
configs[4] — "100k random seeds across pod slice feeding sampling-based
motion planning").

Differential IK is local; global IK restarts it from many random
configurations and takes the best converged solution.  Here one diff-IK
solve per seed scores how well the commanded end-effector velocity can be
realized from that configuration; downstream planners integrate `q + dt nu`.
The argmin reduction over the sharded seed axis is the only collective."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..params import SolverParams
from ..problem import IkProblem
from .sharding import make_mesh, solve_sharded


def task_error(res, problem: IkProblem):
    """Pure task-constraint violation per problem: max_c ||A_c v_c - b_c||_inf
    at the solution — unlike `primal_residual`, which also folds in the box
    slack block and so is not a task-error score."""
    vis = res.vis                                    # (B, N, 6)
    cl = jnp.asarray(problem.constraint_links)
    vc = vis[:, cl, :]                               # (B, NC, 6)
    A = jnp.asarray(problem.A)
    b = jnp.asarray(problem.b)
    if A.ndim == 3:
        A = A[None]
    if b.ndim == 2:
        b = b[None]
    r = jnp.einsum("...cij,bcj->bci", A, vc) - b
    return jnp.max(jnp.abs(r), axis=(1, 2))


def solve_multistart(tree, params: SolverParams, problem: IkProblem, key,
                     num_seeds: int, mesh=None, solve_fn=None):
    """Solve from `num_seeds` random configurations; return the best seed.

    solve_fn(tree, params, qs, problem) overrides the solver backend (e.g.
    two-stage refinement for tol-1e-6 scoring); default is the mesh-sharded
    batched solve.

    Returns (best_q, best_nu, best_error, result) where error is the pure
    task residual inf-norm of each converged seed (inf for non-converged)."""
    qs = tree.random_configuration(key, (num_seeds,))
    if solve_fn is not None:
        res = solve_fn(tree, params, qs, problem)
    else:
        if mesh is None:
            mesh = make_mesh()
        res = solve_sharded(tree, params, qs, problem, mesh)
    # task error per seed: max constraint violation at the solution
    err = jnp.where(res.converged, task_error(res, problem), jnp.inf)
    best = jnp.argmin(err)
    return qs[best], res.nu[best], err[best], res
