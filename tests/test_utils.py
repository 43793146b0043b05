"""Observability + checkpoint utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loik_tpu.model import robots
from loik_tpu.params import SolverParams
from loik_tpu.problem import make_problem
from loik_tpu.solver import solve
from loik_tpu.utils import load_state, no_recompile_guard, save_state

from tests.test_oracle import fixture_problem

PARAMS = SolverParams(max_iter=100, tol_abs=1e-6, tol_rel=1e-6)


def test_no_recompile_guard_passes_when_warm():
    tree = robots.ur5()
    problem = fixture_problem(tree)
    q = tree.neutral()
    solve(tree, PARAMS, q, problem)  # warm up
    with no_recompile_guard():
        for _ in range(3):
            solve(tree, PARAMS, q, problem)


def test_no_recompile_guard_detects_shape_leak():
    tree = robots.ur5()
    problem = fixture_problem(tree)
    solve(tree, PARAMS, tree.neutral(), problem)
    with pytest.raises(RuntimeError, match="no_recompile_guard"):
        with no_recompile_guard():
            # new batch shape -> recompile -> the guard must fire
            qs = jnp.broadcast_to(tree.neutral(), (3, tree.nq))
            solve(tree, PARAMS, qs, problem)


def test_checkpoint_roundtrip(tmp_path):
    tree = robots.ur5()
    problem = fixture_problem(tree)
    res = solve(tree, PARAMS, tree.neutral(), problem)
    path = str(tmp_path / "state.npz")
    save_state(path, res.state)
    restored = load_state(path, res.state)
    for a, b in zip(
        jax.tree_util.tree_leaves(res.state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resuming from the restored state works (warm start)
    warm = solve(
        tree, PARAMS.replace(warm_start=True), tree.neutral(), problem, restored
    )
    assert int(warm.iterations[0]) <= int(res.iterations[0])
