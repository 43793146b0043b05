"""debug_mirror: per-iteration observability for the fused production path
(VERDICT r4 next #2).  The mirror re-runs the same inputs on the XLA path
with logging and ASSERTS outcome parity against the production result, so
the returned logs are guaranteed to describe the solve being debugged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loik_tpu.kernels import solve_fused
from loik_tpu.model import robots
from loik_tpu.params import SolverParams
from loik_tpu.problem import make_problem
from loik_tpu.utils import MirrorMismatch, debug_mirror

PARAMS = SolverParams(max_iter=60, tol_abs=1e-4, tol_rel=1e-4)


def _workload(B=32, dtype=jnp.float32):
    tree = robots.panda_arm(str(np.dtype(dtype)))
    b = np.zeros((1, 6))
    b[0, 2] = 0.2
    prob = make_problem(
        tree, (tree.njoints - 1,), b=b,
        lb=-4 * np.ones(tree.nv), ub=4 * np.ones(tree.nv), dtype=dtype,
    )
    qs = tree.random_configuration(jax.random.PRNGKey(3), (B,)).astype(dtype)
    return tree, prob, qs


def test_mirror_logs_fused_run():
    """Mirror a fused (interpret-mode) production solve: parity asserted,
    per-iteration logs returned."""
    tree, prob, qs = _workload()
    res = solve_fused(tree, PARAMS, qs, prob, batch_tile=16, interpret=True)
    mirror = debug_mirror(tree, PARAMS, qs, prob, result=res)
    # logs exist and cover exactly the iterations each problem ran
    log_rp = np.asarray(mirror.log_rp)
    assert log_rp.shape == (PARAMS.max_iter, qs.shape[0])
    iters = np.asarray(res.iterations)
    for i in (0, 7, 31):
        assert np.isfinite(log_rp[: iters[i], i]).all()
        assert np.isnan(log_rp[iters[i]:, i]).all()
    # the last logged residual is the reported one
    np.testing.assert_allclose(
        log_rp[iters[0] - 1, 0], float(res.primal_residual[0]), rtol=1e-6
    )


def test_mirror_sample_subbatch():
    """sample= mirrors only the named problems — the B=16k debugging shape."""
    tree, prob, qs = _workload(B=32)
    res = solve_fused(tree, PARAMS, qs, prob, batch_tile=16, interpret=True)
    idx = [3, 17, 30]
    mirror = debug_mirror(tree, PARAMS, qs, prob, result=res, sample=idx)
    assert np.asarray(mirror.log_rp).shape == (PARAMS.max_iter, 3)
    np.testing.assert_array_equal(
        np.asarray(mirror.iterations), np.asarray(res.iterations)[idx]
    )


def test_mirror_detects_divergence():
    """A result that does NOT match the mirrored inputs must raise — mirror
    logs can never silently describe a different solve."""
    import dataclasses

    tree, prob, qs = _workload()
    res = solve_fused(tree, PARAMS, qs, prob, batch_tile=16, interpret=True)
    forged = dataclasses.replace(
        res, iterations=res.iterations + 5,
    )
    with pytest.raises(MirrorMismatch, match="iterations"):
        debug_mirror(tree, PARAMS, qs, prob, result=forged)
    forged2 = dataclasses.replace(res, primal_residual=res.primal_residual * 3)
    with pytest.raises(MirrorMismatch, match="primal_residual"):
        debug_mirror(tree, PARAMS, qs, prob, result=forged2)


def test_mirror_warm_tick():
    """Warm ticks mirror too when given the same warm state."""
    tree, prob, qs = _workload(B=16)
    p = PARAMS.replace(warm_start=True)
    cold = solve_fused(tree, p, qs, prob, batch_tile=16, interpret=True)
    warm = solve_fused(tree, p, qs, prob, warm_state=cold.state,
                       batch_tile=16, interpret=True)
    mirror = debug_mirror(tree, p, qs, prob, warm_state=cold.state,
                          result=warm)
    np.testing.assert_array_equal(np.asarray(mirror.iterations),
                                  np.asarray(warm.iterations))


def test_mirror_check_interval_schedule():
    """Mirroring a check_interval>1 production solve keeps the SAME K
    schedule (outcome parity incl. iteration counts on multiples of K);
    logs carry residuals at check slots and NaN on skipped iterations."""
    tree, prob, qs = _workload()
    pK = PARAMS.replace(check_interval=4)
    res = solve_fused(tree, pK, qs, prob, batch_tile=16, interpret=True)
    mirror = debug_mirror(tree, pK, qs, prob, result=res)
    iters = np.asarray(mirror.iterations)
    assert (iters % 4 == 0).all()
    log_rp = np.asarray(mirror.log_rp)
    for j, it in enumerate(iters):
        ran = log_rp[:it, j]
        assert np.isfinite(ran[3::4]).all()      # check slots
        assert np.isnan(ran[0::4]).all()         # skipped slots
