"""Fuzz: random topologies + random problems, fast solver vs oracle.

Broadens the fixture-based parity suite the way the reference uses
humanoidRandom — arbitrary branching, mixed joint types, random constraint
placement."""

import jax
import numpy as np
import pytest

from loik_tpu.model.builders import random_tree, serial_chain
from loik_tpu.oracle import OracleSolver
from loik_tpu.params import SolverParams
from loik_tpu.problem import make_problem
from loik_tpu.solver import solve

pytestmark = pytest.mark.slow  # heavy f64 compiles/solves; quick tier skips

PARAMS = SolverParams(max_iter=150, tol_abs=1e-6, tol_rel=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_random_tree_parity(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 10))
    tree = random_tree(rng, n, floating_base=bool(rng.random() < 0.3))
    # constrain a random leaf + sometimes one interior joint
    leaves = tree.leaf_joints
    c_links = [int(rng.choice(leaves))]
    if rng.random() < 0.5 and tree.njoints > 2:
        other = int(rng.integers(0, tree.njoints))
        if other not in c_links:
            c_links.append(other)
    c_links = tuple(sorted(c_links))
    nc = len(c_links)
    b = rng.uniform(-0.2, 0.2, size=(nc, 6))
    A = np.tile(np.eye(6), (nc, 1, 1))
    problem = make_problem(
        tree, c_links, A=A, b=b,
        lb=-3.0 * np.ones(tree.nv), ub=3.0 * np.ones(tree.nv),
    )
    q = tree.random_configuration(jax.random.PRNGKey(seed))
    res = solve(tree, PARAMS, q, problem)
    orc = OracleSolver(tree, PARAMS).solve(np.asarray(q), problem)
    assert bool(res.converged[0]) == orc.converged
    assert int(res.iterations[0]) == orc.iterations
    np.testing.assert_allclose(np.asarray(res.nu[0]), orc.nu, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.vis[0]), orc.vis, atol=1e-9)


def test_fuzz_long_chain():
    """40-joint serial chain — deeper than Talos; stresses the recursion."""
    tree = serial_chain(40)
    b = np.zeros((1, 6))
    b[0, 1] = 0.1
    problem = make_problem(
        tree, (39,), b=b, lb=-3 * np.ones(40), ub=3 * np.ones(40)
    )
    q = tree.random_configuration(jax.random.PRNGKey(7)) * 0.1
    res = solve(tree, PARAMS, q, problem)
    orc = OracleSolver(tree, PARAMS).solve(np.asarray(q), problem)
    assert bool(res.converged[0]) == orc.converged
    np.testing.assert_allclose(np.asarray(res.nu[0]), orc.nu, atol=1e-8)


def test_fuzz_star_topology():
    """Every joint a child of the root — maximal branching."""
    rng = np.random.default_rng(0)
    joints = [dict(name="j0", parent=-1, type=0, axis=(0, 0, 1))]
    for i in range(1, 8):
        joints.append(
            dict(name=f"j{i}", parent=0, type=0,
                 xyz=tuple(rng.uniform(-0.3, 0.3, 3)), axis=(0, 1, 0))
        )
    from loik_tpu.model import make_tree

    tree = make_tree(joints, name="star")
    b = np.zeros((2, 6))
    b[0, 2] = 0.1
    b[1, 0] = -0.1
    problem = make_problem(
        tree, (3, 6), b=b, lb=-3 * np.ones(8), ub=3 * np.ones(8)
    )
    q = tree.random_configuration(jax.random.PRNGKey(1))
    res = solve(tree, PARAMS, q, problem)
    orc = OracleSolver(tree, PARAMS).solve(np.asarray(q), problem)
    assert bool(res.converged[0]) == orc.converged
    np.testing.assert_allclose(np.asarray(res.nu[0]), orc.nu, atol=1e-9)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_spherical_joints_parity(seed):
    """Spherical (3-dof) joints through the 3x3 SPD D-block path, fast vs
    oracle (the reference covers spherical via pinocchio's generic visitor;
    here the k=3 Cholesky branch of spd_inv)."""
    rng = np.random.default_rng(100 + seed)
    tree = random_tree(rng, int(rng.integers(4, 9)),
                       floating_base=bool(seed % 2), allow_spherical=True,
                       force_spherical=True)
    assert 3 in set(tree.jtypes)  # SPHERICAL code is 3: guaranteed, not RNG luck
    c_links = (tree.leaf_joints[-1],)
    b = rng.uniform(-0.2, 0.2, size=(1, 6))
    problem = make_problem(
        tree, c_links, b=b,
        lb=-3.0 * np.ones(tree.nv), ub=3.0 * np.ones(tree.nv),
    )
    q = tree.random_configuration(jax.random.PRNGKey(seed))
    res = solve(tree, PARAMS, q, problem)
    orc = OracleSolver(tree, PARAMS).solve(np.asarray(q), problem)
    assert bool(res.converged[0]) == orc.converged
    assert int(res.iterations[0]) == orc.iterations
    np.testing.assert_allclose(np.asarray(res.nu[0]), orc.nu, atol=1e-9)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_check_interval_random_trees(seed):
    """check_interval=3 on random topologies: the K-unrolled body must reach
    the same tolerances as K=1 on arbitrary branching/joint mixes, with
    iteration counts on multiples of K (tests/test_check_interval.py pins
    the fixture robots; this fuzzes the schedule over the topology space)."""
    rng = np.random.default_rng(300 + seed)
    tree = random_tree(rng, int(rng.integers(3, 10)),
                       floating_base=bool(rng.random() < 0.3))
    c_links = (tree.leaf_joints[-1],)
    b = rng.uniform(-0.2, 0.2, size=(1, 6))
    problem = make_problem(
        tree, c_links, b=b,
        lb=-3.0 * np.ones(tree.nv), ub=3.0 * np.ones(tree.nv),
    )
    q = tree.random_configuration(jax.random.PRNGKey(seed))
    r1 = solve(tree, PARAMS, q, problem)
    rK = solve(tree, PARAMS.replace(check_interval=3), q, problem)
    assert bool(rK.converged[0]) == bool(r1.converged[0])
    assert int(rK.iterations[0]) % 3 == 0
    if bool(r1.converged[0]):
        # both satisfy the same adaptive tolerances; iterates agree to the
        # tolerance scale
        np.testing.assert_allclose(np.asarray(rK.nu[0]), np.asarray(r1.nu[0]),
                                   atol=5e-5)
