"""1 kHz-style trajectory tracking: the tailored per-tick solve, two ways.

The reference's control-loop entry point `Solve(q, c_id, Ai, bi)`
(loik-loid-optimized.hpp:596-695) updates ONE equality constraint per tick
and warm-starts duals from the previous tick.  Here: track a vertical
sinusoid with the Panda EE, (1) per-tick `solve_tracking` with host-side q
integration — the sensor-in-the-loop pattern — and (2) `track_scan`, which
runs a whole horizon of ticks as ONE device program (zero host round-trips
between ticks; the 1 kHz-budget path the bench measures).

Run:  python examples/02_tracking_loop.py
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax.numpy as jnp
import numpy as np

from loik_tpu import DiffIkSolver, SolverParams
from loik_tpu.model import robots

tree = robots.panda_arm("float32")
ee = tree.njoints - 1
params = SolverParams(max_iter=100, tol_abs=1e-4, tol_rel=1e-4,
                      warm_start=True)

solver = DiffIkSolver(tree, params, constraint_links=(ee,))
solver.update_ineq_constraints(-2.0 * np.ones(tree.nv), 2.0 * np.ones(tree.nv))

dt, ticks = 1e-3, 300
q = tree.neutral()[None].astype(jnp.float32)
iters = []
for t in range(ticks):
    vz = 0.1 * np.cos(2 * np.pi * 1.0 * t * dt)       # 1 Hz vertical wave
    b = jnp.array([0.0, 0.0, vz, 0.0, 0.0, 0.0], jnp.float32)
    res = solver.solve_tracking(q, ee, b=b)           # warm duals carry over
    q = tree.integrate(q, dt * res.nu)
    iters.append(int(np.asarray(res.iterations)[0]))

print(f"ticks={ticks}  iterations/tick: first={iters[0]} "
      f"warm mean={np.mean(iters[1:]):.1f} max={max(iters[1:])}")
print("final q =", np.asarray(q[0]).round(3))

# ---- device-resident horizon: the same targets as ONE scanned program ----
# (a controller that can stage its targets — trajectory replay, MPC rollout —
# pays the host round-trip once per horizon instead of once per tick)
T = 100
b_seq = np.zeros((T, 6), np.float32)
b_seq[:, 2] = 0.1 * np.cos(2 * np.pi * 1.0 * np.arange(T) * dt)
stream = solver.track_scan(q, b_seq)         # warm state threads on-device
print(f"track_scan: {T} ticks in one dispatch, warm iters "
      f"mean={np.asarray(stream.iterations).mean():.1f}, "
      f"converged={np.asarray(stream.converged).mean():.3f}")
