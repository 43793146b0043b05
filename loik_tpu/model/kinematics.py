"""Kinematics utilities on top of KinematicTree: geometric Jacobians and
task-constraint construction helpers.

The reference consumes task constraints (A_i, b_i) already expressed in the
constrained joint's LOCAL frame (ik-id-description.hpp:106-135) and leaves
their construction to the caller.  These helpers close that gap for users:
build local-frame constraints from world-frame velocity targets, and expose
the standard local/world geometric Jacobians (validated against finite
differences in tests/test_kinematics.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import spatial


def joint_jacobian(tree, q, link: int, frame: str = "local"):
    """Geometric Jacobian J of joint `link`'s spatial velocity wrt nu.

    v_link = J @ nu, with v in [linear; angular] order, expressed in the
    link's local frame ("local") or the world frame ("world").
    Shape (..., 6, nv) for q (..., nq)."""
    lR, lp, oR, op = tree.fwd_kinematics(q)
    batch = q.shape[:-1]
    nv = tree.nv
    J = jnp.zeros(batch + (6, nv), q.dtype)
    # chain from link up to the root: dof j of ancestor a contributes
    # (aMlink)^-1 action of S_a  (motion transported to link frame)
    i = link
    chain = []
    while i >= 0:
        chain.append(i)
        i = tree.parents[i]
    for a in chain:
        # transform aMlink: X from frame a to link frame = (oMlink)^-1 oMa
        Rl, pl = spatial.se3_inverse(oR[..., link, :, :], op[..., link, :])
        Ra, pa = oR[..., a, :, :], op[..., a, :]
        Rla, pla = spatial.se3_compose(Rl, pl, Ra, pa)
        Sa = tree.joint_S(a, q)  # (6, k); q covers q-dependent subspaces
                                 # (universal joints)
        k = tree.nvs[a]
        cols = spatial.act_motion(
            Rla[..., None, :, :], pla[..., None, :], jnp.moveaxis(Sa, -1, 0)
        )  # (..., k, 6)
        iv = tree.idx_v[a]
        J = J.at[..., :, iv : iv + k].set(jnp.moveaxis(cols, -2, -1))
    if frame == "world":
        Xw = spatial.se3_action_matrix(oR[..., link, :, :], op[..., link, :])
        J = Xw @ J
    elif frame != "local":
        raise ValueError("frame must be 'local' or 'world'")
    return J


def frame_velocity(tree, q, nu, link: int, frame: str = "local"):
    """Spatial velocity of `link` for joint velocities nu (via the Jacobian)."""
    J = joint_jacobian(tree, q, link, frame)
    return jnp.einsum("...ij,...j->...i", J, nu)


def task_from_world_velocity(tree, q, link: int, v_world):
    """Build a local-frame equality constraint (A, b) commanding `link` to
    move with world-frame spatial velocity `v_world` (6,).

    Returns (A, b) with A = I6 in the local frame and b = (oMl)^-1 v_world,
    ready for IkProblem / DiffIkSolver.update_eq_constraint."""
    _, _, oR, op = tree.fwd_kinematics(q)
    b = spatial.act_inv_motion(oR[..., link, :, :], op[..., link, :], jnp.asarray(v_world))
    A = jnp.broadcast_to(jnp.eye(6, dtype=b.dtype), b.shape[:-1] + (6, 6))
    return A, b


def task_linear_velocity(tree, q, link: int, v_lin_world):
    """Constrain only the LINEAR velocity of the link-frame ORIGIN, given in
    world coordinates; angular rows of A are zeroed — the standard
    point-tracking diff-IK task.  (Note: this is the velocity of the frame
    origin point, not the linear part of the world-origin spatial twist.)"""
    A, b = task_from_world_velocity(
        tree, q, link, jnp.concatenate([jnp.asarray(v_lin_world), jnp.zeros(3)])
    )
    # select linear part in local frame: rows = R^T applied... constraining
    # R_wl^T v_lin_world requires A = [[I,0],[0,0]] in a frame aligned with
    # the local frame; zero the angular rows of A and of b.
    A = A.at[..., 3:, :].set(0.0)
    b = b.at[..., 3:].set(0.0)
    # b's linear part must correspond to A v = P_lin v_local; recompute:
    _, _, oR, op = tree.fwd_kinematics(q)
    R = oR[..., link, :, :]
    b_lin = jnp.einsum("...ji,...j->...i", R, jnp.asarray(v_lin_world, b.dtype))
    b = b.at[..., :3].set(b_lin)
    return A, b
