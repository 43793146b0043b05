"""Oracle solver tests.

The key correctness instrument is *independent*: the converged ADMM solution
must match a direct KKT solve of the same dense QP (something the reference
never does — it only checks optimized-vs-reference consistency).  Plus the
fixture problems of tests/loik-loid.cpp:87-165 (H_ref=I6, v_ref=0, one EE
constraint A=I6, b=(0,0,0.5,0,0,0), box bounds +-4)."""

import numpy as np
import pytest

from loik_tpu.model import robots
from loik_tpu.oracle import OracleSolver
from loik_tpu.params import SolverParams
from loik_tpu.problem import make_problem


# the explicit Panda configuration of the reference fixture
# (tests/loik-loid.cpp:214) — Panda at neutral is singular and the fixture
# problem is genuinely primal-infeasible there (see
# test_oracle_panda_neutral_infeasible below).
PANDA_Q = np.array(
    [-2.79684649, -0.55090374, 0.424806, -1.21112304, -0.89856966,
     0.79726132, -0.07125267, 0.13154589, 0.13171856]
)


def fixture_q(tree):
    if tree.name == "panda":
        return PANDA_Q
    return np.asarray(tree.neutral())


def fixture_problem(tree, b3=0.5, bound=4.0):
    nc = 1
    c_links = (tree.njoints - 1,)
    b = np.zeros((nc, 6))
    b[0, 2] = b3
    return make_problem(
        tree,
        c_links,
        b=b,
        lb=-bound * np.ones(tree.nv),
        ub=bound * np.ones(tree.nv),
    )


def kkt_solution(solver, problem):
    """Directly solve min 1/2 x^T P x + q^T x  s.t.  A_eq x = b_eq
    (kinematics + task rows; box assumed inactive)."""
    N = solver.N
    A = solver.A_qp
    # kinematics rows (always equalities, rhs 0) + task rows at constrained links
    rows = list(range(6 * N))
    rhs = [0.0] * (6 * N)
    for kc, c in enumerate(solver.c_links):
        for j in range(6):
            rows.append(6 * N + 6 * c + j)
            rhs.append(solver.bis[kc][j])
    Aeq = A[rows]
    beq = np.array(rhs)
    P, q = solver.P_qp, solver.q_qp
    n, m = P.shape[0], Aeq.shape[0]
    KKT = np.block([[P, Aeq.T], [Aeq, np.zeros((m, m))]])
    sol = np.linalg.solve(KKT, np.concatenate([-q, beq]))
    return sol[:n]


@pytest.mark.parametrize("robot", ["panda", "ur5"])
def test_oracle_converges_and_matches_kkt(robot):
    tree = robots.get(robot)
    problem = fixture_problem(tree)
    params = SolverParams(max_iter=500, tol_abs=1e-8, tol_rel=1e-8)
    solver = OracleSolver(tree, params)
    res = solver.solve(fixture_q(tree), problem)
    assert res.converged, f"not converged in {res.iterations} iters"

    # task constraint satisfied: A v_ee = b
    c = problem.constraint_links[0]
    np.testing.assert_allclose(res.vis[c], np.asarray(problem.b[0]), atol=1e-6)

    # independent check: ADMM x matches the direct KKT solution
    x_kkt = kkt_solution(solver, problem)
    nu_kkt = x_kkt[6 * tree.njoints :]
    np.testing.assert_allclose(res.nu, nu_kkt, atol=1e-5)
    v_kkt = x_kkt[: 6 * tree.njoints].reshape(tree.njoints, 6)
    np.testing.assert_allclose(res.vis, v_kkt, atol=1e-5)


def test_oracle_fixture_defaults_converges():
    """Reference fixture tolerances (tol 1e-3, max_iter 200)."""
    tree = robots.panda()
    problem = fixture_problem(tree)
    params = SolverParams(max_iter=200)
    res = OracleSolver(tree, params).solve(fixture_q(tree), problem)
    assert res.converged
    assert res.iterations < 200
    assert res.primal_residual < res.info.primal_residuals[0]


def test_oracle_deterministic():
    tree = robots.ur5()
    problem = fixture_problem(tree)
    params = SolverParams(max_iter=100)
    s = OracleSolver(tree, params)
    r1 = s.solve(tree.neutral(), problem)
    r2 = s.solve(tree.neutral(), problem)
    np.testing.assert_array_equal(r1.nu, r2.nu)
    assert r1.iterations == r2.iterations


def test_oracle_split_solve_equivalent():
    """Solve(q,...) == SolveInit + main loop (test_loik_solve_split,
    tests/loik-loid.cpp:261-303)."""
    tree = robots.ur5()
    problem = fixture_problem(tree)
    params = SolverParams(max_iter=100)
    s1 = OracleSolver(tree, params)
    r1 = s1.solve(tree.neutral(), problem)
    s2 = OracleSolver(tree, params)
    s2.solve_init(tree.neutral(), problem)
    s2.solve_main_loop()
    np.testing.assert_array_equal(r1.nu, s2.nu)


def test_oracle_box_constraints_active():
    """Tight bounds: z must respect the box, nu ~ z at convergence."""
    tree = robots.ur5()
    bound = 0.05
    problem = fixture_problem(tree, b3=0.5, bound=bound)
    params = SolverParams(max_iter=2000, tol_abs=1e-6, tol_rel=1e-6)
    res = OracleSolver(tree, params).solve(tree.neutral(), problem)
    assert np.all(res.z <= bound + 1e-12) and np.all(res.z >= -bound - 1e-12)
    if res.converged:
        np.testing.assert_allclose(res.nu, res.z, atol=1e-4)


def test_oracle_random_configs():
    tree = robots.panda()
    import jax

    problem = fixture_problem(tree, b3=0.2)
    params = SolverParams(max_iter=500, tol_abs=1e-6, tol_rel=1e-6)
    s = OracleSolver(tree, params)
    for seed in range(3):
        q = tree.random_configuration(jax.random.PRNGKey(seed))
        res = s.solve(q, problem)
        assert res.converged
        c = problem.constraint_links[0]
        np.testing.assert_allclose(res.vis[c], np.asarray(problem.b[0]), atol=1e-4)


def test_oracle_floating_base():
    """Free-flyer joint (6-dof D blocks) on Solo-12."""
    tree = robots.solo12()
    problem = fixture_problem(tree, b3=0.3)
    params = SolverParams(max_iter=500, tol_abs=1e-6, tol_rel=1e-6)
    solver = OracleSolver(tree, params)
    res = solver.solve(tree.neutral(), problem)
    assert res.converged
    x_kkt = kkt_solution(solver, problem)
    np.testing.assert_allclose(res.nu, x_kkt[6 * tree.njoints :], atol=1e-4)


def test_oracle_infeasible_problem():
    """Contradictory task constraints at the same link cannot both hold:
    primal infeasibility detection + tail solve (loik-loid.hpp:257-347)."""
    tree = robots.ur5()
    c = tree.njoints - 1
    A = np.stack([np.eye(6), np.eye(6)])
    b = np.zeros((2, 6))
    b[0, 2] = 0.5
    b[1, 2] = -0.5  # contradicts the first
    problem = make_problem(
        tree, (c - 1, c), A=A, b=b, lb=-10 * np.ones(tree.nv), ub=10 * np.ones(tree.nv)
    )
    # constraints at *different* links CAN both hold; instead pin link c-1 to
    # zero motion and demand link c (child, rigidly further out along a chain
    # with bounded reach) to move: may or may not be infeasible. Use the
    # stronger contradiction: same A at same link is not supported (slots at
    # distinct links), so emulate: lock parent to 0 and require child large b.
    b2 = np.zeros((2, 6))
    b2[1, 2] = 50.0  # parent fully stopped, child must move at 50 m/s
    problem = problem.replace(b=np.asarray(b2, dtype=np.float64))
    params = SolverParams(max_iter=300)
    res = OracleSolver(tree, params).solve(tree.neutral(), problem)
    assert not res.converged
    # the certificate must actually fire (detected at iteration 17 in f64);
    # no max-iter escape hatch
    assert res.primal_infeasible
    assert res.iterations < 100


def test_oracle_panda_neutral_infeasible():
    """Panda at neutral is a stretched singular configuration: the 6-D EE
    velocity task (v_z = 0.5) needs |nu_4| ~ 6.1 > bound 4 (verified by the
    KKT solve), so the boxed problem is primal infeasible.  The solver must
    detect it and run the tail solve rather than report convergence."""
    tree = robots.panda()
    problem = fixture_problem(tree)
    params = SolverParams(max_iter=300, tol_abs=1e-8, tol_rel=1e-8)
    res = OracleSolver(tree, params).solve(tree.neutral(), problem)
    assert not res.converged
    assert res.primal_infeasible
    # tail solve ran until the iterates stopped moving (possibly 0 extra
    # iterations if deltas were already below tol_tail_solve, as in the
    # reference's while-condition, loik-loid.hpp:261)
    solver = OracleSolver(tree, params)
    solver.solve(tree.neutral(), problem)
    assert np.max(np.abs(solver.delta_x_qp)) < params.tol_tail_solve
    assert np.max(np.abs(solver.delta_z_qp)) < params.tol_tail_solve
