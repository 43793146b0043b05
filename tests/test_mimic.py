"""Mimic-pair reduction: serial <mimic> couplings as ONE merged joint.

The reference consumes whatever Pinocchio's URDF pipeline produces
(loik-loid-optimized.hxx:60) and never owns the mimic failure mode; this
rebuild owns its parser, so it must either reject (<mimic> raises by
default, test_native.py) or reduce EXACTLY.  The reduction merges a
serial-adjacent master->mimic pair into one 1-dof MIMIC_PAIR joint whose
configuration-dependent motion subspace carries nu_mimic = k nu_master
(tree.MIMIC_PAIR); these tests pin it against the expanded chain three
independent ways: FK, finite-difference twists, and the expanded dense QP
with an explicit coupling row (KKT-solved by numpy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loik_tpu.model import load_urdf
from loik_tpu.model.tree import (MIMIC_PAIR, PRISMATIC, REVOLUTE, make_tree)
from loik_tpu.params import SolverParams
from loik_tpu.problem import make_problem
from loik_tpu.solver import solve

K_MULT, OFFSET = 1.5, 0.2
INNER_XYZ = (0.0, 0.1, 0.3)
INNER_RPY = (0.1, -0.2, 0.3)


def _merged_tree():
    """base revolute -> MIMIC_PAIR (rev master, rev mimic, k=1.5, o=0.2)."""
    return make_tree([
        dict(name="j0", parent=-1, type=REVOLUTE, axis=(1, 0, 0),
             xyz=(0, 0, 0.5)),
        dict(name="pair", parent=0, type=MIMIC_PAIR, axis=(0, 0, 1),
             axis2=(0, 1, 0), xyz=(0.2, 0, 0.1), rpy=(0, 0.1, 0),
             xyz2=INNER_XYZ, rpy2=INNER_RPY,
             mimic=(REVOLUTE, REVOLUTE, K_MULT, OFFSET)),
    ], name="merged")


def _expanded_tree():
    """Same mechanism with master and mimic as independent joints."""
    return make_tree([
        dict(name="j0", parent=-1, type=REVOLUTE, axis=(1, 0, 0),
             xyz=(0, 0, 0.5)),
        dict(name="master", parent=0, type=REVOLUTE, axis=(0, 0, 1),
             xyz=(0.2, 0, 0.1), rpy=(0, 0.1, 0)),
        dict(name="mimic", parent=1, type=REVOLUTE, axis=(0, 1, 0),
             xyz=INNER_XYZ, rpy=INNER_RPY),
    ], name="expanded")


def _expand_q(q):
    q = np.asarray(q)
    return np.concatenate(
        [q, (K_MULT * q[..., 1:2] + OFFSET)], axis=-1
    )


def test_fk_matches_expanded_chain():
    merged, exp = _merged_tree(), _expanded_tree()
    q = np.array([[0.3, 0.7], [-1.1, 0.4], [0.0, 0.0]])
    _, _, oR_m, op_m = merged.fwd_kinematics(jnp.asarray(q))
    _, _, oR_e, op_e = exp.fwd_kinematics(jnp.asarray(_expand_q(q)))
    np.testing.assert_allclose(np.asarray(oR_m[:, -1]),
                               np.asarray(oR_e[:, -1]), atol=1e-14)
    np.testing.assert_allclose(np.asarray(op_m[:, -1]),
                               np.asarray(op_e[:, -1]), atol=1e-14)


@pytest.mark.parametrize("pair_types,q1", [
    ((REVOLUTE, REVOLUTE), 0.7),
    ((REVOLUTE, PRISMATIC), -0.4),
    ((PRISMATIC, REVOLUTE), 0.3),
    ((PRISMATIC, PRISMATIC), 0.5),
])
def test_subspace_matches_finite_difference(pair_types, q1):
    """S(q) == numerical body-frame twist d/dq1 of the merged transform,
    for every master/mimic type combination."""
    tree = make_tree([
        dict(name="pair", parent=-1, type=MIMIC_PAIR, axis=(0, 0, 1),
             axis2=(0, 1, 0), xyz2=INNER_XYZ, rpy2=INNER_RPY,
             mimic=(*pair_types, -0.8, 0.05)),
    ], name="p")

    def pose(q):
        _, _, oR, op = tree.fwd_kinematics(jnp.asarray([q]))
        return np.asarray(oR[-1]), np.asarray(op[-1])

    eps = 1e-7
    R0, p0 = pose(q1)
    R1, p1 = pose(q1 + eps)
    What = R0.T @ ((R1 - R0) / eps)
    w_fd = np.array([What[2, 1], What[0, 2], What[1, 0]])
    v_fd = R0.T @ ((p1 - p0) / eps)
    S = np.asarray(tree.joint_S(0, jnp.asarray([q1]))[..., 0])
    np.testing.assert_allclose(S, np.concatenate([v_fd, w_fd]), atol=1e-6)


def test_solver_matches_reduced_expanded_qp():
    """Production solve on the merged tree == the EXPANDED chain's dense QP
    with an explicit coupling row nu_mimic = k nu_master, KKT-solved by
    numpy (wide box bounds keep the problem equality-constrained, so the
    KKT system is linear and exact)."""
    from loik_tpu.oracle.solver import OracleSolver

    merged, exp = _merged_tree(), _expanded_tree()
    q = np.array([0.3, 0.7])
    # ONE effective task row (v_z): with 2 dofs the constraint is feasible
    # and underdetermined, so the H_ref cost shapes the optimum — the
    # interesting regime (a full 6-row task over 2 dofs is infeasible)
    A = np.zeros((1, 6, 6))
    A[0, 2, 2] = 1.0
    b = np.zeros((1, 6))
    b[0, 2] = 0.1
    H = np.tile(1e-2 * np.eye(6), (2, 1, 1))
    prob_m = make_problem(merged, (1,), A=A, H_ref=H, b=b,
                          lb=-100 * np.ones(2), ub=100 * np.ones(2))
    params = SolverParams(max_iter=2000, tol_abs=1e-9, tol_rel=1e-9)
    res = solve(merged, params, jnp.asarray(q)[None], prob_m)
    assert bool(np.asarray(res.converged)[0])
    nu_merged = np.asarray(res.nu)[0]                       # (2,)

    # expanded dense QP via the oracle's literal matrices: H_ref = 0 on the
    # intermediate link (it has no tracking cost in the merged problem)
    H_e = np.zeros((3, 6, 6))
    H_e[0], H_e[2] = H[0], H[1]
    prob_e = make_problem(exp, (2,), A=A, H_ref=H_e, b=b,
                          lb=-100 * np.ones(3), ub=100 * np.ones(3))
    oracle = OracleSolver(exp, params)
    oracle.solve_init(jnp.asarray(_expand_q(q)), prob_e)
    P, qv = oracle.P_qp, oracle.q_qp
    A = oracle.A_qp
    N = exp.njoints
    # equality rows: kinematics (6N) + the task rows at the constrained link
    task = slice(6 * N + 6 * 2, 6 * N + 6 * 3)
    C = np.vstack([A[: 6 * N], A[task]])
    d = np.concatenate([np.zeros(6 * N), oracle.lb_qp[task]])
    # coupling row: nu_mimic - k nu_master = 0
    row = np.zeros((1, C.shape[1]))
    row[0, 6 * N + 2] = 1.0
    row[0, 6 * N + 1] = -K_MULT
    C = np.vstack([C, row])
    d = np.concatenate([d, [0.0]])
    # KKT: [P C'; C 0] [x; y] = [-q; d]
    nvar, ncon = P.shape[0], C.shape[0]
    KKT = np.block([[P, C.T], [C, np.zeros((ncon, ncon))]])
    rhs = np.concatenate([-qv, d])
    sol = np.linalg.lstsq(KKT, rhs, rcond=None)[0]
    nu_exp = sol[6 * N : nvar]                              # (3,)

    np.testing.assert_allclose(nu_merged[0], nu_exp[0], atol=1e-6)
    np.testing.assert_allclose(nu_merged[1], nu_exp[1], atol=1e-6)
    np.testing.assert_allclose(nu_exp[2], K_MULT * nu_exp[1], atol=1e-8)


def test_oracle_parity_with_box_active():
    """Batched production solver vs the dense oracle ON the merged tree,
    with binding box bounds (the standard two-tier parity check extended to
    the new joint type)."""
    from loik_tpu.oracle.solver import OracleSolver

    merged = _merged_tree()
    A = np.zeros((1, 6, 6))
    A[0, 2, 2] = 1.0
    b = np.zeros((1, 6))
    b[0, 2] = 0.2
    prob = make_problem(merged, (1,), A=A, b=b,
                        lb=-0.3 * np.ones(2), ub=0.3 * np.ones(2))
    params = SolverParams(max_iter=300, tol_abs=1e-8, tol_rel=1e-8)
    qs = merged.random_configuration(jax.random.PRNGKey(0), (8,))
    res = solve(merged, params, qs, prob)
    oracle = OracleSolver(merged, params)
    for r in range(8):
        ores = oracle.solve(qs[r], prob)
        assert bool(np.asarray(res.converged)[r]) == bool(ores.converged)
        if ores.converged:
            np.testing.assert_allclose(np.asarray(res.nu)[r], ores.nu,
                                       rtol=1e-6, atol=1e-6)


URDF_COUPLED_FINGER = (
    '<robot name="finger"><link name="base"/><link name="prox"/>'
    '<link name="dist"/><link name="tip"/>'
    '<joint name="knuckle" type="revolute">'
    '<origin xyz="0 0 0.1"/><parent link="base"/><child link="prox"/>'
    '<axis xyz="0 1 0"/><limit effort="1" velocity="2.0"/></joint>'
    '<joint name="distal" type="revolute">'
    '<origin xyz="0 0 0.05" rpy="0 0 0.3"/><parent link="prox"/>'
    '<child link="dist"/><axis xyz="0 1 0"/>'
    '<limit effort="1" velocity="2.0"/>'
    '<mimic joint="knuckle" multiplier="0.71" offset="0.1"/></joint>'
    '<joint name="tip" type="revolute">'
    '<origin xyz="0 0 0.04"/><parent link="dist"/><child link="tip"/>'
    '<axis xyz="1 0 0"/><limit effort="1" velocity="3.0"/></joint>'
    "</robot>"
)


def test_loader_reduce_mode():
    """mimic='reduce' folds the coupled phalanx into one MIMIC_PAIR joint;
    FK matches the expanded chain loaded mimic-free."""
    tree = load_urdf(URDF_COUPLED_FINGER, mimic="reduce")
    assert tree.jtypes == (MIMIC_PAIR, REVOLUTE)
    assert tree.nv == 2
    # velocity limit folds: min(2.0, 2.0/0.71)
    np.testing.assert_allclose(np.asarray(tree.velocity_limit)[0], 2.0)

    exp = load_urdf(URDF_COUPLED_FINGER.replace(
        '<mimic joint="knuckle" multiplier="0.71" offset="0.1"/>', ""))
    q = np.array([[0.4, -0.2]])
    qe = np.array([[0.4, 0.71 * 0.4 + 0.1, -0.2]])
    _, _, oR_m, op_m = tree.fwd_kinematics(jnp.asarray(q))
    _, _, oR_e, op_e = exp.fwd_kinematics(jnp.asarray(qe))
    np.testing.assert_allclose(np.asarray(op_m[:, -1]),
                               np.asarray(op_e[:, -1]), atol=1e-14)
    np.testing.assert_allclose(np.asarray(oR_m[:, -1]),
                               np.asarray(oR_e[:, -1]), atol=1e-14)


def test_loader_reduce_allows_leaf_fixed_siblings():
    """Cosmetic fixed frames (visual/tool) on the master's child link are
    common on real gripper URDFs and do not affect the coupling: the
    reduction must accept them (ADVICE r4) and produce the same tree."""
    urdf_with_frames = URDF_COUPLED_FINGER.replace(
        "</robot>",
        '<link name="prox_visual"/><link name="nail"/>'
        '<joint name="prox_vis" type="fixed"><origin xyz="0 0 0.01"/>'
        '<parent link="prox"/><child link="prox_visual"/></joint>'
        '<joint name="nail_f" type="fixed"><origin xyz="0 0 0.02"/>'
        '<parent link="prox_visual"/><child link="nail"/></joint></robot>',
    )
    tree = load_urdf(urdf_with_frames, mimic="reduce")
    ref = load_urdf(URDF_COUPLED_FINGER, mimic="reduce")
    assert tree.jtypes == ref.jtypes == (MIMIC_PAIR, REVOLUTE)
    q = jnp.asarray([[0.4, -0.2]])
    _, _, oR_a, op_a = tree.fwd_kinematics(q)
    _, _, oR_b, op_b = ref.fwd_kinematics(q)
    np.testing.assert_allclose(np.asarray(op_a), np.asarray(op_b),
                               atol=1e-14)


def test_loader_reduce_rejects_dof_carrying_fixed_branch():
    """A fixed sibling whose subtree carries a MOVING joint still blocks the
    reduction — and the error names the branch."""
    urdf = URDF_COUPLED_FINGER.replace(
        "</robot>",
        '<link name="mount"/><link name="sensor"/>'
        '<joint name="mount_f" type="fixed"><origin xyz="0 0 0.01"/>'
        '<parent link="prox"/><child link="mount"/></joint>'
        '<joint name="sensor_j" type="revolute"><origin xyz="0 0 0.02"/>'
        '<parent link="mount"/><child link="sensor"/>'
        '<axis xyz="0 0 1"/></joint></robot>',
    )
    with pytest.raises(ValueError, match="mount_f"):
        load_urdf(urdf, mimic="reduce")


def test_loader_rejects_non_adjacent_mimic():
    """Sibling (cross-branch) mimics cannot reduce and must still raise."""
    urdf = (
        '<robot name="g"><link name="hand"/><link name="f1"/>'
        '<link name="f2"/>'
        '<joint name="a" type="prismatic"><origin xyz="0 0.04 0"/>'
        '<parent link="hand"/><child link="f1"/><axis xyz="0 1 0"/></joint>'
        '<joint name="b" type="prismatic"><origin xyz="0 -0.04 0"/>'
        '<parent link="hand"/><child link="f2"/><axis xyz="0 -1 0"/>'
        '<mimic joint="a"/></joint></robot>'
    )
    with pytest.raises(ValueError, match="serial-adjacent"):
        load_urdf(urdf, mimic="reduce")
    with pytest.raises(ValueError, match="mimic"):
        load_urdf(urdf)  # default stays reject
