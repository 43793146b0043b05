"""One simulated host for tests/test_distributed.py (NOT a pytest file).

Invoked as: python tests/distributed_worker.py <pid> <nproc> <coord> <dir>
with XLA_FLAGS=--xla_force_host_platform_device_count=<n> in the env, so the
process exposes n virtual CPU devices and `jax.distributed` federates the
processes into one logical multi-host runtime (SURVEY.md §4 transfer notes).
"""

import sys
import time


def main():
    pid, nproc, coord, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from loik_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=coord, num_processes=nproc,
                    process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    import jax.numpy as jnp
    import numpy as np

    from loik_tpu.model import robots
    from loik_tpu.params import SolverParams
    from loik_tpu.problem import make_problem

    d = np.load(f"{outdir}/fixture.npz")
    q = d["q"]
    B = q.shape[0]
    B_local = B // nproc
    q_local = q[pid * B_local : (pid + 1) * B_local]

    tree = robots.panda_arm("float64")
    b = np.zeros((1, 6))
    b[0, 2] = 0.2
    problem = make_problem(
        tree,
        (tree.njoints - 1,),
        b=b,
        lb=-4.0 * np.ones(tree.nv),
        ub=4.0 * np.ones(tree.nv),
        dtype=jnp.float64,
    )
    params = SolverParams(max_iter=60, tol_abs=1e-6, tol_rel=1e-6)

    mesh = dist.global_mesh()
    assert mesh.devices.size == nproc * len(jax.local_devices())

    res = dist.solve_global(tree, params, q_local, problem, mesh=mesh)
    m = dist.global_metrics(res)

    # scaling probe: wall time of R repeated global solves (the dryrun
    # workload); on simulated hosts this only demonstrates the protocol —
    # real efficiency numbers need real chips
    res.nu.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        r2 = dist.solve_global(tree, params, q_local, problem, mesh=mesh)
    r2.nu.block_until_ready()
    wall = (time.perf_counter() - t0) / 3

    np.savez(
        f"{outdir}/out_{pid}.npz",
        nu=dist.local_shard(res.nu),
        converged=dist.local_shard(res.converged),
        iterations=dist.local_shard(res.iterations),
        primal_residual=dist.local_shard(res.primal_residual),
        num_converged=m["num_converged"],
        wall_per_solve=wall,
    )
    dist.shutdown()


if __name__ == "__main__":
    main()
