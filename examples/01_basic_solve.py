"""Basic constrained differential IK: the reference fixture problem.

Mirrors the LoIK test fixture (reference tests/loik-loid.cpp:108-131): a
manipulator, identity tracking weights, one 6-D equality task at the end
effector (A = I6, b = commanded spatial velocity), joint-velocity box
bounds — solved here for a BATCH of configurations at once.

Run:  python examples/01_basic_solve.py
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from loik_tpu import DiffIkSolver, SolverParams
from loik_tpu.model import robots

tree = robots.panda_arm("float32")          # 7-dof Franka Panda arm
params = SolverParams(max_iter=200, tol_abs=1e-4, tol_rel=1e-4)
# Throughput knob for cold batched solves: check_interval=K runs the
# convergence checks every K-th ADMM iteration (OSQP's check_termination;
# K=8 measured +74% device rate on the 16k panda batch at equal certified
# convergence — see ROADMAP).  Default 1 = the reference's per-iteration
# schedule; warm tracking loops should keep 1.

ee = tree.njoints - 1                        # constrain the last joint/link
solver = DiffIkSolver(tree, params, constraint_links=(ee,))
solver.update_ineq_constraints(-4.0 * np.ones(tree.nv), 4.0 * np.ones(tree.nv))
b = jnp.array([0.0, 0.0, 0.2, 0.0, 0.0, 0.0])   # move EE up at 0.2 m/s
solver.update_eq_constraint(ee, b=b)

B = 1024
qs = tree.random_configuration(jax.random.PRNGKey(0), (B,)).astype(jnp.float32)
res = solver.solve(qs)

conv = np.asarray(res.converged)
print(f"robot={tree.name} batch={B}")
print(f"converged: {conv.sum()}/{B} "
      f"(infeasible certified: {int(np.asarray(res.primal_infeasible).sum())})")
print(f"iterations: mean={np.asarray(res.iterations).mean():.1f} "
      f"max={int(np.asarray(res.iterations).max())}")
print(f"max primal residual (converged): "
      f"{np.asarray(res.primal_residual)[conv].max():.2e}")
print("nu[0] =", np.asarray(res.nu[0]).round(4))
