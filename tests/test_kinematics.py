"""Jacobian / task-helper tests: finite-difference validation and
consistency with the solver's internal recursion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loik_tpu import SolverParams, make_problem, solve
from loik_tpu.model import robots
from loik_tpu.model.kinematics import (
    frame_velocity,
    task_from_world_velocity,
    task_linear_velocity,
)


def fd_local_velocity(tree, q, nu, link, eps=1e-7):
    """Finite-difference local spatial velocity of `link` under qdot = nu."""
    # integrate q: revolute/prismatic additive; no floating base in this test
    q2 = q + eps * nu
    _, _, oR, op = tree.fwd_kinematics(q)
    _, _, oR2, op2 = tree.fwd_kinematics(q2)
    R, p = np.asarray(oR[link]), np.asarray(op[link])
    R2, p2 = np.asarray(oR2[link]), np.asarray(op2[link])
    lin = R.T @ (p2 - p) / eps
    dR = R.T @ R2
    ang = np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0], dR[1, 0] - dR[0, 1]]) / (
        2 * eps
    )
    return np.concatenate([lin, ang])


@pytest.mark.parametrize("robot", ["ur5", "panda_arm"])
def test_jacobian_matches_finite_differences(robot):
    tree = robots.get(robot)
    q = tree.random_configuration(jax.random.PRNGKey(0))
    nu = np.asarray(tree.random_configuration(jax.random.PRNGKey(1)))[: tree.nv] * 0.3
    link = tree.njoints - 1
    v = np.asarray(frame_velocity(tree, q, jnp.asarray(nu), link))
    v_fd = fd_local_velocity(tree, np.asarray(q), nu, link)
    np.testing.assert_allclose(v, v_fd, atol=1e-5)


def test_jacobian_world_frame():
    tree = robots.ur5()
    q = tree.random_configuration(jax.random.PRNGKey(2))
    nu = jnp.ones(6) * 0.1
    from loik_tpu import spatial

    _, _, oR, op = tree.fwd_kinematics(q)
    v_loc = frame_velocity(tree, q, nu, 5, "local")
    v_world = frame_velocity(tree, q, nu, 5, "world")
    np.testing.assert_allclose(
        np.asarray(spatial.act_motion(oR[5], op[5], v_loc)), np.asarray(v_world),
        atol=1e-12,
    )


def test_jacobian_consistent_with_solver():
    """The solver's converged vis must equal J @ nu."""
    tree = robots.ur5()
    b = np.zeros((1, 6))
    b[0, 2] = 0.3
    prob = make_problem(tree, (5,), b=b, lb=-4 * np.ones(6), ub=4 * np.ones(6))
    params = SolverParams(max_iter=200, tol_abs=1e-8, tol_rel=1e-8)
    q = tree.neutral()
    res = solve(tree, params, q, prob)
    assert bool(res.converged[0])
    for link in (2, 5):
        v_jac = frame_velocity(tree, q, res.nu[0], link)
        np.testing.assert_allclose(
            np.asarray(v_jac), np.asarray(res.vis[0, link]), atol=1e-6
        )


def test_task_from_world_velocity_roundtrip():
    """Solving with a world-frame task helper yields that world velocity."""
    tree = robots.panda_arm()
    q = jnp.asarray(
        [-2.79684649, -0.55090374, 0.424806, -1.21112304, -0.89856966,
         0.79726132, -0.07125267]
    )
    v_world = jnp.asarray([0.05, -0.1, 0.2, 0.0, 0.0, 0.1])
    A, b = task_from_world_velocity(tree, q, 6, v_world)
    prob = make_problem(
        tree, (6,), A=A[None], b=b[None], lb=-4 * np.ones(7), ub=4 * np.ones(7)
    )
    params = SolverParams(max_iter=300, tol_abs=1e-8, tol_rel=1e-8)
    res = solve(tree, params, q, prob)
    assert bool(res.converged[0])
    v_achieved = frame_velocity(tree, q, res.nu[0], 6, "world")
    np.testing.assert_allclose(np.asarray(v_achieved), np.asarray(v_world), atol=1e-5)


def test_task_linear_velocity_underdetermined():
    """Linear-only task leaves angular free: must converge and achieve the
    commanded linear velocity."""
    tree = robots.panda_arm()
    q = jnp.asarray(
        [-2.79684649, -0.55090374, 0.424806, -1.21112304, -0.89856966,
         0.79726132, -0.07125267]
    )
    v_lin = jnp.asarray([0.1, 0.05, -0.2])
    A, b = task_linear_velocity(tree, q, 6, v_lin)
    prob = make_problem(
        tree, (6,), A=A[None], b=b[None], lb=-4 * np.ones(7), ub=4 * np.ones(7)
    )
    params = SolverParams(max_iter=300, tol_abs=1e-8, tol_rel=1e-8)
    res = solve(tree, params, q, prob)
    assert bool(res.converged[0])
    # the commanded quantity is the frame-origin point velocity: R @ v_local_lin
    v_local = frame_velocity(tree, q, res.nu[0], 6, "local")
    _, _, oR, _ = tree.fwd_kinematics(q)
    v_point = jnp.einsum("ij,j->i", oR[6], v_local[:3])
    np.testing.assert_allclose(np.asarray(v_point), np.asarray(v_lin), atol=1e-5)
