"""Simulated 2-host multi-process execution (SURVEY.md §5 distributed
backend; BASELINE.md 2+ host target).

Two OS processes x 4 virtual CPU devices each federate via
`jax.distributed.initialize` into one 8-device runtime and solve ONE global
batch; every process's local output rows must match a single-process solve
of the same batch bit-for-bit in pass structure (same masked while-loop), to
tight f64 tolerance numerically.  This is the multi-host analog the
reference never had (no comm deps, CMakeLists.txt:111-117) but the rebuild's
scale story requires.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy f64 compiles/solves; quick tier skips

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize(
    "nproc,per_host",
    [(2, 4), (4, 2)],
    ids=["2hosts_x4dev", "4hosts_x2dev"],
)
def test_simulated_hosts_match_single_process(tmp_path, nproc, per_host):
    import jax
    import jax.numpy as jnp

    from loik_tpu.model import robots
    from loik_tpu.params import SolverParams
    from loik_tpu.problem import make_problem
    from loik_tpu.solver import solve

    tree = robots.panda_arm("float64")
    B = 16
    q = np.asarray(tree.random_configuration(jax.random.PRNGKey(7), (B,)))
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
    ref = solve(tree, params, jnp.asarray(q), problem)
    ref_nu = np.asarray(ref.nu)
    ref_conv = np.asarray(ref.converged)
    ref_iters = np.asarray(ref.iterations)
    assert ref_conv.sum() >= B - 2, "fixture batch must mostly converge"

    np.savez(tmp_path / "fixture.npz", q=q)

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={per_host}"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc),
             f"localhost:{port}", str(tmp_path)],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    B_local = B // nproc
    for pid in range(nproc):
        got = np.load(tmp_path / f"out_{pid}.npz")
        rows = slice(pid * B_local, (pid + 1) * B_local)
        # same algorithm, same masked loop — f64 parity is tight
        np.testing.assert_allclose(got["nu"], ref_nu[rows], rtol=1e-9,
                                   atol=1e-9)
        np.testing.assert_array_equal(got["converged"], ref_conv[rows])
        np.testing.assert_array_equal(got["iterations"], ref_iters[rows])
        # cross-host aggregate identical on every process
        assert int(got["num_converged"]) == int(ref_conv.sum())
        assert float(got["wall_per_solve"]) > 0.0
