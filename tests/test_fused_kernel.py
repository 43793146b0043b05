"""Fused Pallas kernel vs XLA path: must be an exact drop-in (same math via
the shared _solve_loop — the kernel only changes WHERE it runs).  CPU tests
use interpret mode; TPU equivalence is covered by the benchmark harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loik_tpu.kernels import solve_fused
from loik_tpu.model import robots
from loik_tpu.params import SolverParams
from loik_tpu.problem import make_problem
from loik_tpu.solver import solve


def _workload(robot="panda_arm", B=64, seed=0, dtype=jnp.float32):
    tree = robots.get(robot, str(np.dtype(dtype)))
    b = np.zeros((1, 6))
    b[0, 2] = 0.2
    prob = make_problem(
        tree, (tree.njoints - 1,), b=b,
        lb=-4 * np.ones(tree.nv), ub=4 * np.ones(tree.nv), dtype=dtype,
    )
    qs = tree.random_configuration(jax.random.PRNGKey(seed), (B,)).astype(dtype)
    return tree, prob, qs


@pytest.mark.parametrize("robot", ["panda_arm", "ur5", "solo12"])
def test_fused_matches_xla(robot):
    tree, prob, qs = _workload(robot, B=32)
    params = SolverParams(max_iter=60, tol_abs=1e-4, tol_rel=1e-4)
    r1 = solve(tree, params, qs, prob)
    r2 = solve_fused(tree, params, qs, prob, batch_tile=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1.nu), np.asarray(r2.nu))
    np.testing.assert_array_equal(np.asarray(r1.iterations), np.asarray(r2.iterations))
    np.testing.assert_array_equal(np.asarray(r1.converged), np.asarray(r2.converged))
    np.testing.assert_array_equal(
        np.asarray(r1.primal_infeasible), np.asarray(r2.primal_infeasible)
    )


def test_fused_multiple_tiles():
    """Grid > 1: tiles must be independent."""
    tree, prob, qs = _workload(B=48)
    params = SolverParams(max_iter=60, tol_abs=1e-4, tol_rel=1e-4)
    r1 = solve_fused(tree, params, qs, prob, batch_tile=16, interpret=True)
    r2 = solve_fused(tree, params, qs, prob, batch_tile=48, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1.nu), np.asarray(r2.nu))


def test_fused_warm_start():
    tree, prob, qs = _workload(B=16)
    params = SolverParams(max_iter=100, tol_abs=1e-4, tol_rel=1e-4)
    cold = solve_fused(tree, params, qs, prob, batch_tile=16, interpret=True)
    warm = solve_fused(
        tree, params.replace(warm_start=True), qs, prob,
        warm_state=cold.state, batch_tile=16, interpret=True,
    )
    conv = np.asarray(cold.converged)
    assert np.all(np.asarray(warm.iterations)[conv] <= 2)


def test_fused_rejects_logging():
    tree, prob, qs = _workload(B=16)
    params = SolverParams(max_iter=10, logging=True)
    with pytest.raises(ValueError, match="logging"):
        solve_fused(tree, params, qs, prob, batch_tile=16, interpret=True)


def test_fused_rejects_f64():
    """Mosaic has no f64; f64 inputs must fail fast with a clear message
    (under jax_enable_x64 they previously crashed the TPU lowering)."""
    tree, prob, qs = _workload(B=16, dtype=jnp.float64)
    params = SolverParams(max_iter=10)
    with pytest.raises(ValueError, match="f32-only"):
        solve_fused(tree, params, qs, prob, batch_tile=16, interpret=True)


def test_fused_f32_under_x64_config():
    """x64 is globally ON in conftest: the fused path must still trace with
    32-bit literals (x64 scoped off inside) and run f32 inputs."""
    assert jax.config.jax_enable_x64
    tree, prob, qs = _workload(B=16)
    params = SolverParams(max_iter=30, tol_abs=1e-4, tol_rel=1e-4)
    r1 = solve(tree, params, qs, prob)
    r2 = solve_fused(tree, params, qs, prob, batch_tile=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1.nu), np.asarray(r2.nu))


def test_fused_traces_once():
    """solve_fused must reuse one module-level jit cache entry across calls
    (a per-call closure would re-trace every solve — ~1.5 s of host overhead
    per call, the dominant cost at control-loop batch sizes)."""
    from loik_tpu.kernels import fused as fused_mod

    tree, prob, qs = _workload(B=16)
    params = SolverParams(max_iter=10, tol_abs=1e-3, tol_rel=1e-3)
    solve_fused(tree, params, qs, prob, batch_tile=16, interpret=True)
    n0 = fused_mod._run_fused._cache_size()
    solve_fused(tree, params, qs, prob, batch_tile=16, interpret=True)
    assert fused_mod._run_fused._cache_size() == n0
