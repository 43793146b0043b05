"""Golden-trace parity: frozen ADMM iterate trajectories at a fixed budget.

The artifact tests/golden/traces.json records per-iteration
(primal_residual, dual_residual, mu) and final (nu, z) for the reference
test-fixture problem on four robots at a FIXED 8-iteration budget — the
reference's own optimized-vs-reference comparison protocol
(tests/loik-loid.cpp:559-671).  Two layers of pinning:

1. the ORACLE must reproduce the committed file to near-bit f64 accuracy —
   any semantic drift in the dense-QP spec solver is a deliberate,
   regenerate-and-review event (tools/gen_golden_trace.py);
2. the FAST solver (the production path) must track the same trajectories
   to 1e-10 — the "residuals match at the same ADMM iteration budget"
   BASELINE.md target, asserted against an artifact rather than an
   in-process computation.
"""

import json
import os

import numpy as np
import pytest

from loik_tpu.model import robots
from loik_tpu.oracle import OracleSolver
from loik_tpu.params import SolverParams
from loik_tpu.problem import make_problem
from loik_tpu.solver import solve

pytestmark = pytest.mark.slow  # heavy f64 compiles/solves; quick tier skips

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "traces.json")

with open(GOLDEN) as f:
    DOC = json.load(f)

PARAMS = SolverParams(logging=True, **DOC["params"])


def _fixture(trace):
    tree = robots.get(trace["robot"], "float64")
    b = np.asarray(trace["b"])[None]
    problem = make_problem(
        tree, (trace["constraint_link"],), b=b,
        lb=-trace["bounds"] * np.ones(tree.nv),
        ub=trace["bounds"] * np.ones(tree.nv),
    )
    return tree, np.asarray(trace["q"]), problem


@pytest.mark.parametrize("trace", DOC["traces"], ids=lambda t: t["robot"])
def test_oracle_reproduces_golden(trace):
    tree, q, problem = _fixture(trace)
    orc = OracleSolver(tree, PARAMS).solve(q, problem)
    assert orc.iterations == trace["iterations"] == 8
    np.testing.assert_allclose(
        orc.info.primal_residuals, trace["primal_residuals"], rtol=1e-12
    )
    np.testing.assert_allclose(
        orc.info.dual_residuals, trace["dual_residuals"], rtol=1e-12
    )
    np.testing.assert_allclose(orc.info.mus, trace["mus"], rtol=1e-15)
    np.testing.assert_allclose(orc.nu, trace["nu_final"], rtol=1e-12,
                               atol=1e-15)
    np.testing.assert_allclose(orc.z, trace["z_final"], rtol=1e-12,
                               atol=1e-15)


@pytest.mark.parametrize("trace", DOC["traces"], ids=lambda t: t["robot"])
def test_fast_solver_matches_golden(trace):
    tree, q, problem = _fixture(trace)
    res = solve(tree, PARAMS, q, problem)
    assert int(res.iterations[0]) == trace["iterations"]
    rp = np.asarray(res.log_rp)[:8, 0]
    rd = np.asarray(res.log_rd)[:8, 0]
    np.testing.assert_allclose(rp, trace["primal_residuals"], rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(rd, trace["dual_residuals"], rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.nu[0]), trace["nu_final"],
                               rtol=1e-9, atol=1e-12)


# --------------------------------------------------------------------------- #
# v2: infeasibility certificate + tail solve, mu flips, mimic-pair tree,
# universal-joint tree (VERDICT r4 next #8)
# --------------------------------------------------------------------------- #


def _fixture_v2(trace):
    if "urdf" in trace:
        from loik_tpu.model import load_urdf

        tree = load_urdf(trace["urdf"], mimic=trace.get("mimic", "raise"))
    else:
        tree = robots.get(trace["robot"], "float64")
    b = np.asarray(trace["b"])[None]
    problem = make_problem(
        tree, (trace["constraint_link"],), b=b,
        lb=-trace["bounds"] * np.ones(tree.nv),
        ub=trace["bounds"] * np.ones(tree.nv),
    )
    params = SolverParams(logging=True, **trace["params"])
    return tree, np.asarray(trace["q"]), problem, params


@pytest.mark.parametrize("trace", DOC["traces_v2"],
                         ids=lambda t: t["family"])
def test_oracle_reproduces_golden_v2(trace):
    tree, q, problem, params = _fixture_v2(trace)
    orc = OracleSolver(tree, params).solve(q, problem)
    assert orc.iterations == trace["iterations"]
    assert orc.tail_solve_iterations == trace["tail_iterations"]
    assert bool(orc.converged) == trace["converged"]
    assert bool(orc.primal_infeasible) == trace["primal_infeasible"]
    assert bool(orc.dual_infeasible) == trace["dual_infeasible"]
    np.testing.assert_allclose(
        orc.info.primal_residuals, trace["primal_residuals"], rtol=1e-12
    )
    np.testing.assert_allclose(
        orc.info.dual_residuals, trace["dual_residuals"], rtol=1e-12
    )
    np.testing.assert_allclose(orc.info.mus, trace["mus"], rtol=1e-15)
    assert [bool(v) for v in orc.info.in_tail] == trace["in_tail"]
    np.testing.assert_allclose(orc.nu, trace["nu_final"], rtol=1e-12,
                               atol=1e-15)
    np.testing.assert_allclose(orc.z, trace["z_final"], rtol=1e-12,
                               atol=1e-15)
    # the families really exercise what they claim to freeze
    if trace["family"] == "infeasible_tail":
        assert trace["primal_infeasible"] and trace["tail_iterations"] > 0
    if trace["family"] == "mu_flip":
        d = np.sign(np.diff(np.log10(np.asarray(trace["mus"]))))
        assert (d > 0).any() and (d < 0).any()
    if trace["family"] == "mimic_pair":
        from loik_tpu.model.tree import MIMIC_PAIR

        assert MIMIC_PAIR in tree.jtypes
    if trace["family"] == "universal":
        assert tree.has_q_dependent_S


@pytest.mark.parametrize("trace", DOC["traces_v2"],
                         ids=lambda t: t["family"])
def test_fast_solver_matches_golden_v2(trace):
    tree, q, problem, params = _fixture_v2(trace)
    res = solve(tree, params, q, problem)
    n = trace["iterations"]
    assert int(res.iterations[0]) == n
    assert int(res.tail_iterations[0]) == trace["tail_iterations"]
    assert bool(res.converged[0]) == trace["converged"]
    assert bool(res.primal_infeasible[0]) == trace["primal_infeasible"]
    # per-iteration trajectory: the production path reproduces the frozen
    # residual/mu/tail history, not just the endpoint.  Comparison length is
    # what the oracle LOGGED (residuals log per main-loop pass; the tail
    # continuation contributes in_tail rows but no new residual entries
    # beyond them).  Absolute floor 1e-9: below that the recursive residual
    # assembly and the oracle's dense formulas differ by f64 noise amplified
    # by mu_eq = 1e4 — "zero" for trajectory purposes.
    total = len(trace["primal_residuals"])
    np.testing.assert_allclose(np.asarray(res.log_rp)[:total, 0],
                               trace["primal_residuals"], rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.log_rd)[:total, 0],
                               trace["dual_residuals"], rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.log_mu)[:total, 0],
                               trace["mus"], rtol=1e-12)
    in_tail = [bool(v) for v in np.asarray(res.log_in_tail)[:total, 0]]
    assert in_tail == trace["in_tail"]
    np.testing.assert_allclose(np.asarray(res.nu[0]), trace["nu_final"],
                               rtol=1e-9, atol=1e-11)
