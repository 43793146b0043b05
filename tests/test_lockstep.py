"""Pass-by-pass lockstep parity: fast solver vs oracle, every intermediate.

The rebuild's analog of the reference's strongest test,
`test_1st_order_loik_optimized_correctness_component_wise`
(tests/loik-loid.cpp:305-556): both solvers advance ONE iteration at a time
and every named intermediate of every pass is compared at 1e-10 —

  FwdPass1   : His, pis, ris
  BwdPass    : accumulated His/pis, Dinv, r_tot (= ris + S^T pis)
  FwdPass2   : nu, vis, fis
  BoxProj    : z
  DualUpdate : yis, w, Aty, delta_yis
  Residuals  : full dual-residual VECTOR (recursive fdpa/stfw vs the
               authoritative dense  P x + q + A^T y,  loik-loid.hxx:280),
               per-block residual components, adaptive tolerances,
               infeasibility conditions, post-update mu

so a divergence inside one pass is caught at that pass, even if it would
cancel by iteration end (invisible to the end-state/golden-trace tests).
A mutation test seeds a fault into single passes and asserts the comparison
fails AT that pass, proving localization.
"""

import dataclasses

import jax
import numpy as np
import pytest

from loik_tpu.model import robots
from loik_tpu.oracle import OracleSolver
from loik_tpu.params import SolverParams
from loik_tpu.problem import make_problem
from loik_tpu.solver.solve import (_iteration, _reset_state, fwd_pass_init,
                                   make_loop_body, prepare_problem)
from loik_tpu.solver.state import init_state

from tests.test_oracle import fixture_problem, fixture_q

PARAMS = SolverParams(max_iter=40, tol_abs=1e-6, tol_rel=1e-6)


class LockstepMismatch(AssertionError):
    def __init__(self, pass_name, detail):
        self.pass_name = pass_name
        super().__init__(f"lockstep divergence in {pass_name}: {detail}")


def _cmp(pass_name, name, got, want, atol=1e-10):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    # abs-OR-rel comparison, like the reference's custom predicate
    # (check_eigen_dense_abs_or_rel_equal, tests/loik-loid.cpp:60-83)
    err = np.abs(got - want)
    rel = err / np.maximum(np.abs(want), 1.0)
    if not np.all(np.minimum(err, rel) <= atol):
        raise LockstepMismatch(pass_name, f"{name}: max err {err.max():.3e}")


def run_lockstep(tree, params, q, problem, iters=10):
    """Drive oracle and fast solver one pass at a time; raises
    LockstepMismatch naming the first diverging pass."""
    dtype = tree.dtype
    nvs, N = tree.nvs, tree.njoints
    cl = problem.constraint_links

    orc = OracleSolver(tree, params)
    orc.solve_init(np.asarray(q), problem)

    qb = jax.numpy.asarray(q)[None]
    prob = prepare_problem(tree, problem, 1, dtype)
    st = init_state(tree, 1, problem.num_constraints, dtype)
    st = _reset_state(tree, params, st, dtype)
    liMi_R, liMi_p = fwd_pass_init(tree, qb)
    st = dataclasses.replace(st, liMi_R=liMi_R, liMi_p=liMi_p)
    body = make_loop_body(tree, prob, params)

    def flat_dofs(padded):
        # (N, K, 1) padded -> (nv,) flat
        out = []
        for i in range(N):
            out.extend(np.asarray(padded[i, : nvs[i], 0]))
        return np.asarray(out)

    for it in range(1, iters + 1):
        new, checks = _iteration(tree, prob, params, st, debug=True)
        dbg = checks["debug"]
        orc.iter = it
        orc.update_prev()

        orc.fwd_pass1()
        for i in range(N):
            _cmp("FwdPass1", f"His[{i}]", dbg["H_fwd1"][i][..., 0], orc.His[i])
            _cmp("FwdPass1", f"pis[{i}]", dbg["p_fwd1"][i][..., 0], orc.pis[i])
            _cmp("FwdPass1", f"ris[{i}]",
                 dbg["r_fwd1"][i, : nvs[i], 0], orc.ris[i])

        orc.bwd_pass()
        for i in range(N):
            _cmp("BwdPass", f"His[{i}]", dbg["H_bwd"][i][..., 0], orc.His[i])
            _cmp("BwdPass", f"pis[{i}]", dbg["p_bwd"][i][..., 0], orc.pis[i])
            _cmp("BwdPass", f"Dinv[{i}]", dbg["Dinv"][i][..., 0], orc.Dinv[i])
            _cmp("BwdPass", f"r_tot[{i}]", dbg["r_tot"][i][..., 0],
                 orc.ris[i] + orc.S[i].T @ orc.pis[i])

        orc.fwd_pass2()
        _cmp("FwdPass2", "nu", flat_dofs(new["nu"]), orc.nu)
        _cmp("FwdPass2", "vis", new["vis"][..., 0], orc.vis)
        _cmp("FwdPass2", "fis", new["fis"][..., 0], orc.fis)

        orc.box_proj()
        _cmp("BoxProj", "z", flat_dofs(new["z"]), orc.z)

        orc.dual_update()
        for k, c in enumerate(cl):
            _cmp("DualUpdate", f"yis[{k}]", new["yis"][k, :, 0], orc.yis[c])
            _cmp("DualUpdate", f"Aty[{k}]", new["Aty"][k, :, 0],
                 orc.Ais[k].T @ orc.yis[c])
            _cmp("DualUpdate", f"delta_yis[{k}]", dbg["delta_yis"][k, :, 0],
                 orc.mu_eq * (orc.Ais[k] @ orc.vis[c] - orc.bis[k]))
        _cmp("DualUpdate", "w", flat_dofs(new["w"]), orc.w)

        orc.update_qp_loop()
        orc.compute_residuals()
        # the key spec check: the fast recursive dual residual (fdpa/stfw,
        # loik-loid-optimized.hxx:173-243) must equal the authoritative dense
        # vector P x + q + A^T y (loik-loid.hxx:280), element-wise
        _cmp("Residuals", "dual_residual_vec[v-block]",
             dbg["dr_v"][..., 0], orc.dual_residual_vec[: 6 * N].reshape(N, 6))
        _cmp("Residuals", "dual_residual_vec[nu-block]",
             flat_dofs(new["stfw"]), orc.dual_residual_vec[6 * N:])
        _cmp("Residuals", "primal_residual",
             new["primal_residual"][0], orc.primal_residual)
        _cmp("Residuals", "dual_residual",
             new["dual_residual"][0], orc.dual_residual)
        _cmp("Residuals", "primal_residual_task",
             dbg["primal_residual_task"][0], orc.primal_residual_task)
        _cmp("Residuals", "primal_residual_slack",
             dbg["primal_residual_slack"][0], orc.primal_residual_slack)
        _cmp("Residuals", "dual_residual_v",
             dbg["dual_residual_v"][0], orc.dual_residual_v)
        _cmp("Residuals", "dual_residual_nu",
             dbg["dual_residual_nu"][0], orc.dual_residual_nu)

        orc.check_convergence()
        _cmp("CheckConvergence", "tol_dual",
             checks["tol_dual"][0], orc.tol_dual)
        _cmp("CheckConvergence", "tol_primal",
             checks["tol_primal"][0], orc.tol_primal)
        conv_fast = bool(
            (new["primal_residual"][0] < checks["tol_primal"][0])
            & (new["dual_residual"][0] < checks["tol_dual"][0])
        )
        if conv_fast != orc.converged:
            raise LockstepMismatch(
                "CheckConvergence", f"flags {conv_fast} vs {orc.converged}"
            )

        if it > 1:
            orc.check_feasibility()
            pinf_fast = bool(checks["primal_infeasible_now"][0])
            if pinf_fast != orc.primal_infeasible:
                raise LockstepMismatch(
                    "CheckFeasibility",
                    f"primal flags {pinf_fast} vs {orc.primal_infeasible}",
                )

        if orc.converged or orc.primal_infeasible or orc.dual_infeasible:
            return it
        mu_before = orc.mu
        orc.update_mu()
        st = body(st)
        _cmp("UpdateMu", "mu", st.mu[0], orc.mu)
        if orc.mu != mu_before:
            pass  # adaptation exercised; nothing extra to assert
    return iters


@pytest.mark.parametrize("robot", [
    "panda", pytest.param("solo12", marks=pytest.mark.slow),
])
def test_lockstep_component_wise(robot):
    """Every intermediate of every pass matches the oracle at 1e-10 on a
    revolute arm AND a floating-base quadruped (free-flyer + spherical-free
    mix of joint dof counts)."""
    tree = robots.get(robot)
    problem = fixture_problem(tree, b3=0.2)
    q = fixture_q(tree)
    n = run_lockstep(tree, PARAMS, q, problem, iters=12)
    assert n >= 2  # at least two full lockstep iterations actually compared


def test_lockstep_multi_constraint():
    tree = robots.solo12()
    feet = tree.leaf_joints
    b = np.zeros((1 + len(feet), 6))
    b[0, 2] = 0.1
    problem = make_problem(
        tree, (0,) + feet, b=b,
        lb=-10 * np.ones(tree.nv), ub=10 * np.ones(tree.nv),
    )
    run_lockstep(tree, PARAMS, tree.neutral(), problem, iters=8)


@pytest.mark.parametrize(
    "mutate_pass,expect_at",
    [
        ("fwd_pass1", "FwdPass1"),
        ("bwd_pass", "BwdPass"),
        ("fwd_pass2", "FwdPass2"),
        ("box_proj", "BoxProj"),
        ("dual_update", "DualUpdate"),
        ("update_mu", "UpdateMu"),
    ],
)
def test_lockstep_localizes_seeded_fault(monkeypatch, mutate_pass, expect_at):
    """Mutation test: corrupt ONE oracle pass and assert the lockstep
    comparison fails AT that pass (never earlier, never only at iteration
    end) — the proof that the test localizes intra-iteration faults."""
    tree = robots.panda()
    problem = fixture_problem(tree, b3=0.2)
    q = fixture_q(tree)

    orig = getattr(OracleSolver, mutate_pass)

    def corrupted(self):
        orig(self)
        if self.iter >= 2:  # let iteration 1 pass clean
            if mutate_pass == "fwd_pass1":
                self.pis[0] = self.pis[0] + 1e-6
            elif mutate_pass == "bwd_pass":
                self.Dinv[2] = self.Dinv[2] * (1 + 1e-6)
            elif mutate_pass == "fwd_pass2":
                self.fis[1] = self.fis[1] - 1e-6
            elif mutate_pass == "box_proj":
                self.z = self.z + 1e-6
            elif mutate_pass == "dual_update":
                self.w = self.w + 1e-6  # additive: w may be exactly 0
            elif mutate_pass == "update_mu":
                self.mu = self.mu * (1 + 1e-5)
                self.mu_eq = self.params.mu_equality_scale_factor * self.mu
                self.mu_ineq = self.mu

    monkeypatch.setattr(OracleSolver, mutate_pass, corrupted)
    with pytest.raises(LockstepMismatch) as ei:
        run_lockstep(tree, PARAMS, q, problem, iters=6)
    assert ei.value.pass_name == expect_at, (
        f"fault in {mutate_pass} surfaced at {ei.value.pass_name}"
    )
