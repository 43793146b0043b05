"""DiffIkSolver OO API: reference-parity surface (solve / split solve /
tailored tracking solve / getters) plus a closed-loop trajectory-tracking
simulation — the usage pattern the tailored overload exists for
(loik-loid-optimized.hpp:596-695)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loik_tpu.api import DiffIkSolver
from loik_tpu.model import robots
from loik_tpu.params import SolverParams
from loik_tpu.solver import solve

from tests.test_oracle import fixture_problem

PARAMS = SolverParams(max_iter=200, tol_abs=1e-6, tol_rel=1e-6)


def test_solver_class_basic():
    tree = robots.ur5()
    s = DiffIkSolver(tree, PARAMS, (tree.njoints - 1,))
    b = np.zeros((1, 6)); b[0, 2] = 0.3
    s.update_eq_constraints(np.broadcast_to(np.eye(6), (1, 6, 6)), b)
    s.update_ineq_constraints(-4 * np.ones(6), 4 * np.ones(6))
    res = s.solve(tree.neutral())
    assert bool(res.converged[0])
    assert bool(s.get_convergence_status()[0])
    assert int(s.get_iter()[0]) == int(res.iterations[0])
    np.testing.assert_allclose(np.asarray(res.vis[0, -1]), b[0], atol=1e-5)


def test_solver_class_matches_functional():
    tree = robots.ur5()
    problem = fixture_problem(tree)
    s = DiffIkSolver(tree, PARAMS, problem.constraint_links, problem)
    r1 = s.solve(tree.neutral())
    r2 = solve(tree, PARAMS, tree.neutral(), problem)
    np.testing.assert_array_equal(np.asarray(r1.nu), np.asarray(r2.nu))


def test_split_solve():
    tree = robots.ur5()
    problem = fixture_problem(tree)
    s = DiffIkSolver(tree, PARAMS, problem.constraint_links, problem)
    s.solve_init(tree.neutral())
    r1 = s.resolve()
    r2 = s.resolve()  # FK frozen, repeated resolve must be deterministic
    np.testing.assert_array_equal(np.asarray(r1.nu), np.asarray(r2.nu))


def test_split_solve_warm_start():
    """`resolve()` must honor params.warm_start like the reference's
    `Solve()` after `SolveInit()` (`ik_id_data_.Reset(warm_start_)`,
    loik-loid-optimized.hpp:368-455): the second resolve warm-starts from
    the first's state — fewer iterations, same answer as a monolithic warm
    `solve` from the same state."""
    tree = robots.ur5()
    params = PARAMS.replace(warm_start=True)
    problem = fixture_problem(tree)
    s = DiffIkSolver(tree, params, problem.constraint_links, problem)
    q = tree.neutral()
    s.solve_init(q)
    r1 = s.resolve()
    assert s.state is not None  # state threaded for later warm calls
    r2 = s.resolve()
    assert int(r2.iterations[0]) < int(r1.iterations[0])
    # monolithic warm solve from the same state must match exactly
    r_mono = solve(tree, params, q, problem, warm_state=r1.state)
    np.testing.assert_array_equal(np.asarray(r2.nu), np.asarray(r_mono.nu))
    np.testing.assert_array_equal(np.asarray(r2.iterations),
                                  np.asarray(r_mono.iterations))


def test_constraint_update_validation():
    tree = robots.ur5()
    s = DiffIkSolver(tree, PARAMS, (5,))
    with pytest.raises(ValueError):
        s.update_eq_constraint(3, b=np.zeros(6))  # no constraint at link 3
    with pytest.raises(ValueError):
        s.update_eq_constraints(np.zeros((2, 6, 6)), np.zeros((2, 6)))  # count change


def test_tracking_loop_warm_start():
    """1 kHz-style loop: follow a sinusoidal EE velocity target over 50 ticks,
    warm starting each tick.  Warm ticks should converge in far fewer
    iterations than the cold first tick."""
    tree = robots.panda_arm()
    params = PARAMS.replace(warm_start=True)
    s = DiffIkSolver(tree, params, (tree.njoints - 1,))
    s.update_ineq_constraints(-4 * np.ones(7), 4 * np.ones(7))
    q = jnp.asarray(
        [-2.79684649, -0.55090374, 0.424806, -1.21112304, -0.89856966,
         0.79726132, -0.07125267]
    )
    dt = 1e-3
    iters = []
    for t in range(50):
        b = np.zeros(6)
        b[2] = 0.1 * np.sin(2 * np.pi * t / 50)
        b[0] = 0.05 * np.cos(2 * np.pi * t / 50)
        res = s.solve_tracking(q, tree.njoints - 1, b=jnp.asarray(b))
        assert bool(res.converged[0]), f"tick {t} diverged"
        np.testing.assert_allclose(np.asarray(res.vis[0, -1]), b, atol=1e-4)
        iters.append(int(res.iterations[0]))
        q = q + dt * res.nu[0]  # integrate
    # warm ticks converge faster than the cold tick (the target moves every
    # tick, so duals re-adapt — this is not the 1-iteration resolve case)
    assert np.mean(iters[1:]) < iters[0]
    assert np.mean(iters[1:]) <= 8.0, f"warm ticks too slow: {iters}"


def test_reset_drops_warm_state():
    tree = robots.ur5()
    problem = fixture_problem(tree)
    s = DiffIkSolver(tree, PARAMS.replace(warm_start=True),
                     problem.constraint_links, problem)
    s.solve(tree.neutral())
    s.reset()
    assert s.state is None
    r = s.solve(tree.neutral())  # cold again, must not error
    assert bool(r.converged[0])


def test_solve_refined_certifies_tight_tol():
    tree = robots.panda_arm("float32")
    params = SolverParams(max_iter=200, tol_abs=1e-6, tol_rel=1e-6)
    solver = DiffIkSolver(tree, params, (6,))
    solver.update_ineq_constraints(-4 * np.ones(7), 4 * np.ones(7))
    solver.update_eq_constraint(6, b=np.array([0, 0, 0.2, 0, 0, 0.0]))
    qs = tree.random_configuration(jax.random.PRNGKey(9), (32,)).astype(
        jnp.float32)
    res = solver.solve_refined(qs)            # default: delta-duals (f32)
    conv = np.asarray(res.converged)
    assert conv.mean() > 0.6
    assert res.nu.dtype == jnp.float32        # pure-f32 loops
    assert np.asarray(res.primal_residual)[conv].max() < 1e-5
    res2 = solver.solve_refined(qs, method="two-stage")
    assert res2.nu.dtype == jnp.float64       # f64 tail reports in f64
    conv2 = np.asarray(res2.converged)
    assert conv2.mean() > 0.6
    assert np.asarray(res2.primal_residual)[conv2].max() < 1e-5
