"""Gradients through the solver: calibrate a task target by descent.

`solve_unrolled` makes the WHOLE diff-IK solve reverse-mode
differentiable (solver/diff.py).  Demo: find the commanded end-effector
velocity b_z whose solved joint motion matches a demonstrated joint
velocity profile — the inner pattern of learning-from-demonstration /
policy-training pipelines that embed an IK layer.

Run:  python examples/06_differentiable_ik.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from loik_tpu import SolverParams, make_problem, solve_unrolled
from loik_tpu.model import robots

tree = robots.ur5()
A = np.zeros((1, 6, 6))
A[0, 2, 2] = 1.0                                  # constrain EE v_z
b = np.zeros((1, 6))
problem = make_problem(tree, (tree.njoints - 1,), A=A, b=b,
                       lb=-10 * np.ones(tree.nv), ub=10 * np.ones(tree.nv))
params = SolverParams()
q = tree.random_configuration(jax.random.PRNGKey(0), (8,))

# "demonstration": the joint velocities produced by a hidden target
b_true = 0.17
res = solve_unrolled(tree, params, q,
                     problem.replace(b=problem.b.at[0, 2].set(b_true)),
                     num_iters=50)
nu_demo = res.nu


def loss(bz):
    prob = problem.replace(b=problem.b.at[0, 2].set(bz))
    out = solve_unrolled(tree, params, q, prob, num_iters=50)
    return jnp.mean((out.nu - nu_demo) ** 2)


# second-order descent: jax gives the curvature through the solver too
step_fn = jax.jit(lambda bz: (loss(bz), jax.grad(loss)(bz),
                              jax.grad(jax.grad(loss))(bz)))
bz = jnp.asarray(0.5)
for step in range(6):
    val, g, h = step_fn(bz)
    bz = bz - g / jnp.maximum(h, 1e-8)             # Newton step
    print(f"step {step}: loss {float(val):.3e}  b_z {float(bz):+.5f}")

print(f"\nrecovered b_z = {float(bz):+.5f}  (true {b_true:+.5f})")
assert abs(float(bz) - b_true) < 1e-3
