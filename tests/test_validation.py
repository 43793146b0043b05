"""Problem-input validation: the `checkIkIdData` analog
(loik-loid-data.hpp:244-321).  Every malformed input must be rejected with a
clear error instead of silently mis-solving."""

import numpy as np
import pytest

from loik_tpu.model import robots
from loik_tpu.params import SolverParams
from loik_tpu.problem import IkProblem, make_problem, validate_problem
from loik_tpu.solver import solve

PARAMS = SolverParams(max_iter=10)


def test_rejects_out_of_range_link():
    tree = robots.ur5()
    with pytest.raises(ValueError, match="out of range"):
        make_problem(tree, (tree.njoints,))
    with pytest.raises(ValueError, match="out of range"):
        make_problem(tree, (-1,))


def test_rejects_duplicate_links():
    tree = robots.ur5()
    with pytest.raises(ValueError, match="duplicate"):
        make_problem(tree, (3, 3))


def test_rejects_bad_A_shape():
    tree = robots.ur5()
    good = make_problem(tree, (5,))
    bad = good.replace(A=np.zeros((2, 6, 6)))  # NC=1 problem, 2 A slots
    with pytest.raises(ValueError, match="A has shape"):
        validate_problem(tree, bad)
    bad = good.replace(A=np.zeros((1, 6, 5)))
    with pytest.raises(ValueError, match="A has shape"):
        validate_problem(tree, bad)


def test_rejects_bad_b_shape():
    tree = robots.ur5()
    good = make_problem(tree, (5,))
    bad = good.replace(b=np.zeros((1, 5)))
    with pytest.raises(ValueError, match="b has shape"):
        validate_problem(tree, bad)


def test_rejects_bad_bounds():
    tree = robots.ur5()
    with pytest.raises(ValueError, match="lb > ub"):
        make_problem(tree, (5,), lb=np.ones(tree.nv), ub=-np.ones(tree.nv))
    with pytest.raises(ValueError, match="lb has shape"):
        make_problem(tree, (5,), lb=np.zeros(3), ub=np.ones(3))


def test_rejects_excess_batch_dims():
    tree = robots.ur5()
    good = make_problem(tree, (5,))
    bad = good.replace(b=np.zeros((2, 3, 1, 6)))  # two leading batch dims
    with pytest.raises(ValueError, match="at most one leading batch dim"):
        validate_problem(tree, bad)


def test_solve_rejects_handbuilt_bad_problem():
    tree = robots.ur5()
    good = make_problem(tree, (5,))
    bad = IkProblem(
        H_ref=good.H_ref, v_ref=good.v_ref, A=good.A, b=good.b,
        lb=good.lb, ub=good.ub, constraint_links=(99,),
    )
    with pytest.raises(ValueError, match="out of range"):
        solve(tree, PARAMS, tree.neutral(), bad)


def test_solve_rejects_wrong_q_size():
    tree = robots.ur5()
    prob = make_problem(tree, (5,))
    with pytest.raises(ValueError, match="configuration entries"):
        solve(tree, PARAMS, np.zeros(4), prob)
