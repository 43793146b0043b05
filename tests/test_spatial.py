"""Spatial-algebra unit tests: group laws, action/matrix consistency,
motion-force duality.  Mirrors the conventions the reference inherits from
pinocchio (SE3::act/actInv/toActionMatrix/toDualActionMatrix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loik_tpu import spatial


def rand_se3(key):
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (4,), dtype=jnp.float64)
    R = spatial.quat_to_rotmat(q)
    p = jax.random.normal(k2, (3,), dtype=jnp.float64)
    return R, p


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_rotation_about_axis_matches_quat():
    axis = jnp.array([0.0, 0.0, 1.0])
    th = 0.7
    R = spatial.rotation_about_axis(axis, jnp.asarray(th))
    expect = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    np.testing.assert_allclose(np.asarray(R), expect, atol=1e-14)
    # orthonormality for arbitrary axis
    a = jnp.array([1.0, 2.0, -0.5])
    a = a / jnp.linalg.norm(a)
    R2 = spatial.rotation_about_axis(a, jnp.asarray(1.3))
    np.testing.assert_allclose(np.asarray(R2 @ R2.T), np.eye(3), atol=1e-14)
    np.testing.assert_allclose(np.asarray(R2 @ a), np.asarray(a), atol=1e-14)


def test_rpy_convention():
    # yaw-only
    R = spatial.rpy_to_rotmat(jnp.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(np.asarray(R @ jnp.array([1.0, 0, 0])), [0, 1, 0], atol=1e-14)
    # roll-only
    R = spatial.rpy_to_rotmat(jnp.array([np.pi / 2, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(R @ jnp.array([0, 1.0, 0])), [0, 0, 1], atol=1e-14)


def test_compose_inverse(key):
    Ra, pa = rand_se3(key)
    Ri, pi = spatial.se3_inverse(Ra, pa)
    R, p = spatial.se3_compose(Ra, pa, Ri, pi)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-13)
    np.testing.assert_allclose(np.asarray(p), np.zeros(3), atol=1e-13)


def test_action_matrix_consistency(key):
    k1, k2 = jax.random.split(key)
    R, p = rand_se3(k1)
    v = jax.random.normal(k2, (6,), dtype=jnp.float64)
    X = spatial.se3_action_matrix(R, p)
    np.testing.assert_allclose(
        np.asarray(X @ v), np.asarray(spatial.act_motion(R, p, v)), atol=1e-13
    )
    Xd = spatial.se3_dual_action_matrix(R, p)
    np.testing.assert_allclose(
        np.asarray(Xd @ v), np.asarray(spatial.act_force(R, p, v)), atol=1e-13
    )
    # duality: X* = X^{-T}
    np.testing.assert_allclose(np.asarray(Xd), np.linalg.inv(np.asarray(X)).T, atol=1e-12)


def test_act_inv_roundtrip(key):
    k1, k2 = jax.random.split(key)
    R, p = rand_se3(k1)
    v = jax.random.normal(k2, (6,), dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(spatial.act_inv_motion(R, p, spatial.act_motion(R, p, v))),
        np.asarray(v),
        atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(spatial.act_inv_force(R, p, spatial.act_force(R, p, v))),
        np.asarray(v),
        atol=1e-13,
    )


def test_power_pairing_invariance(key):
    """<f, v> is invariant: <X* f, X v> = <f, v> — force/motion duality."""
    k1, k2, k3 = jax.random.split(key, 3)
    R, p = rand_se3(k1)
    v = jax.random.normal(k2, (6,), dtype=jnp.float64)
    f = jax.random.normal(k3, (6,), dtype=jnp.float64)
    lhs = jnp.dot(spatial.act_force(R, p, f), spatial.act_motion(R, p, v))
    np.testing.assert_allclose(float(lhs), float(jnp.dot(f, v)), atol=1e-12)


def test_se3_act_on_sym6(key):
    k1, k2 = jax.random.split(key)
    R, p = rand_se3(k1)
    A = jax.random.normal(k2, (6, 6), dtype=jnp.float64)
    H = A + A.T
    X = spatial.se3_action_matrix(R, p)
    expect = np.linalg.inv(np.asarray(X)).T @ np.asarray(H) @ np.linalg.inv(np.asarray(X))
    got = spatial.se3_act_on_sym6(R, p, H)
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-12)


def test_batching(key):
    ks = jax.random.split(key, 4)
    R = spatial.quat_to_rotmat(jax.random.normal(ks[0], (5, 4), dtype=jnp.float64))
    p = jax.random.normal(ks[1], (5, 3), dtype=jnp.float64)
    v = jax.random.normal(ks[2], (5, 6), dtype=jnp.float64)
    batched = spatial.act_motion(R, p, v)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(spatial.act_motion(R[i], p[i], v[i])), atol=1e-14
        )


class TestExpIntegrate:
    def test_exp3_quat_matches_rotmat(self):
        import numpy as np
        from loik_tpu import spatial

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(16, 3)))
        R1 = spatial.quat_to_rotmat(spatial.exp3_quat(w))
        theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
        R2 = spatial.rotation_about_axis(w / theta, theta[..., 0])
        np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-12)

    def test_exp3_quat_zero(self):
        import numpy as np
        from loik_tpu import spatial

        q = spatial.exp3_quat(jnp.zeros((3,)))
        np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=1e-15)

    def test_se3_exp_pure_translation(self):
        import numpy as np
        from loik_tpu import spatial

        v = jnp.asarray([1.0, -2.0, 3.0, 0.0, 0.0, 0.0])
        R, p = spatial.se3_exp(v)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-15)
        np.testing.assert_allclose(np.asarray(p), [1, -2, 3], atol=1e-15)

    def test_se3_exp_screw_small_step_composition(self):
        # exp(v) == exp(v/n)^n — validates V(w) against first-order stepping
        import numpy as np
        from loik_tpu import spatial

        v = jnp.asarray([0.3, -0.1, 0.2, 0.4, 0.5, -0.6])
        R, p = spatial.se3_exp(v)
        n = 2048
        Rs, ps = spatial.se3_identity()
        dR, dp = spatial.se3_exp(v / n)
        for _ in range(n):
            Rs, ps = spatial.se3_compose(Rs, ps, dR, dp)
        np.testing.assert_allclose(np.asarray(R), np.asarray(Rs), atol=1e-9)
        np.testing.assert_allclose(np.asarray(p), np.asarray(ps), atol=1e-9)

    def test_quat_mul_composes(self):
        import numpy as np
        from loik_tpu import spatial

        rng = np.random.default_rng(1)
        q1 = spatial.exp3_quat(jnp.asarray(rng.normal(size=(8, 3))))
        q2 = spatial.exp3_quat(jnp.asarray(rng.normal(size=(8, 3))))
        R12 = spatial.quat_to_rotmat(spatial.quat_mul(q1, q2))
        Rr = spatial.quat_to_rotmat(q1) @ spatial.quat_to_rotmat(q2)
        np.testing.assert_allclose(np.asarray(R12), np.asarray(Rr), atol=1e-12)

    def test_se3_exp_f32_small_angles(self):
        # f32 regression: theta in [1e-4, 1e-3] used to hit the cancellation
        # zone of (1-cos t)/t^2 with an f64-tuned cutoff, zeroing the
        # rotational coupling of the translation (found in review)
        import numpy as np
        from loik_tpu import spatial

        for theta in (2e-4, 5e-4, 2e-3):
            v32 = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, theta], jnp.float32)
            _, p32 = spatial.se3_exp(v32)
            _, p64 = spatial.se3_exp(v32.astype(jnp.float64))
            np.testing.assert_allclose(
                np.asarray(p32), np.asarray(p64), rtol=1e-5,
                err_msg=f"theta={theta}",
            )
            assert abs(float(p32[1]) - theta / 2) < 1e-7, theta

    def test_exp_maps_grad_safe_at_zero(self):
        import numpy as np
        from loik_tpu import spatial

        g1 = jax.grad(lambda w: spatial.exp3_quat(w)[3])(jnp.zeros(3))
        assert np.isfinite(np.asarray(g1)).all()
        g2 = jax.jacobian(
            lambda v: spatial.se3_exp(v)[1]
        )(jnp.zeros(6).at[0].set(1.0))
        assert np.isfinite(np.asarray(g2)).all()
        g3 = jax.jacobian(spatial.se3_exp_translation)(
            jnp.zeros(6).at[1].set(0.5)
        )
        assert np.isfinite(np.asarray(g3)).all()
