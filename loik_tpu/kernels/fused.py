"""Fused Pallas solve kernel: the entire masked ADMM while-loop on-chip.

The XLA path dispatches a few hundred small HLO ops per iteration; at small
batch sizes per-op overhead dominates (measured ~0.6 ms/iteration at B=1024
on v5e vs ~15 us of VPU work).  This kernel runs the WHOLE solve loop for a
tile of problems inside one `pallas_call`: state lives in VMEM/registers for
the entire solve, nothing round-trips to HBM between iterations — the
SURVEY.md §7 step-6 plan (fuse FwdPass1 + BwdPass + FwdPass2 + BoxProj +
DualUpdate per iteration) taken to its limit.

Crucially the kernel body REUSES `solve._solve_loop` — the exact same
iteration/flag/penalty code as the XLA path — applied to values read from
kernel refs.  One source of truth for the math; Mosaic simply compiles it
fused.  Correctness therefore reduces to the existing oracle parity suite
plus the kernel-vs-XLA equivalence tests.

Grid: 1-D over batch tiles (the trailing lane axis).  Constraints of the
fused path (fall back to `solver.solve` otherwise):
  - no per-iteration logging (params.logging=False)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..params import SolverParams
from ..problem import IkProblem
from ..solver import solve as _solve_pkg_function  # noqa: F401 (api parity)
from ..solver.solve import (_flat_nu, _reset_state, fwd_pass_init,
                            make_loop_body, prepare_problem)
from ..solver.state import PreparedProblem, SolverState, SolveResult

# state fields that the kernel carries (everything except liMi/log arrays)
_STATE_FIELDS = (
    "vis", "fis", "nu", "z", "w", "yis", "Aty", "fdpa", "stfw",
    "mu", "mu_eq", "mu_ineq", "iterations", "tail_iterations",
    "converged", "primal_infeasible", "dual_infeasible", "in_tail",
    "running", "primal_residual", "dual_residual", "delta_x_inf",
    "delta_z_inf",
)
_PROB_FIELDS = ("H_ref", "Hv", "A", "b", "AtA", "Atb", "lb", "ub", "b_inf", "Hv_inf")
_BOOL_FIELDS = {
    "converged", "primal_infeasible", "dual_infeasible", "in_tail", "running"
}
_INT_FIELDS = {"iterations", "tail_iterations"}


def _tile_spec(shape, bt):
    """BlockSpec tiling only the trailing batch axis."""
    from jax.experimental import pallas as pl

    block = shape[:-1] + (bt,)
    nlead = len(shape) - 1
    return pl.BlockSpec(block, lambda i, n=nlead: (0,) * n + (i,))


def _kernel(tree, params, constraint_links, n_state, prob_fields, *refs):
    """Kernel body: rebuild state/problem from refs, run the shared solve
    loop, write results back.  `tree` here carries only STATIC topology; its
    array leaves (the joint axes, which joint_S derives S from) arrive via
    refs — kernels cannot capture array constants."""
    n_prob = len(prob_fields)
    state_in = refs[:n_state]
    prob_in = refs[n_state : n_state + n_prob]
    liMi_R_ref, liMi_p_ref, axis_ref = refs[n_state + n_prob : n_state + n_prob + 3]
    outs = refs[n_state + n_prob + 3 :]
    N = tree.njoints
    z3 = jnp.zeros((N, 3, 3), axis_ref.dtype)
    tree = dataclasses.replace(
        tree,
        placement_R=z3,
        placement_p=z3[:, 0],
        axis=axis_ref[:],
        velocity_limit=jnp.zeros((tree.nv,), axis_ref.dtype),
        axis2=None,  # q-dependent joints are rejected before the kernel
        placement2_R=None, placement2_p=None,  # (mimic pairs likewise)
    )

    # keep every per-problem scalar as (1, BT) — bools decoded from i32 but
    # NOT squeezed: rank-1 bool/int vector ops crash this Mosaic backend,
    # while (1, BT) broadcasts identically through the shared solver math
    vals = {}
    for name, ref in zip(_STATE_FIELDS, state_in):
        v = ref[:]
        if name in _BOOL_FIELDS:
            v = v != 0             # (1,BT) i32 -> (1,BT) bool
        vals[name] = v
    pvals = {name: ref[:] for name, ref in zip(prob_fields, prob_in)}
    for scalar in ("b_inf", "Hv_inf", "tol_scale_primal", "tol_scale_dual"):
        if scalar in pvals:
            pvals[scalar] = pvals[scalar][0]  # (1,BT) -> (BT,) float vector

    liMi_R = liMi_R_ref[:]
    liMi_p = liMi_p_ref[:]
    st = SolverState(
        liMi_R=liMi_R,
        liMi_p=liMi_p,
        it=jnp.zeros((), jnp.int32),
        log_rp=None, log_rd=None, log_mu=None,
        **vals,
    )
    prob = PreparedProblem(constraint_links=constraint_links, **pvals)

    # Mosaic's while-loop lowering rejects the mixed-rank dataclass carry
    # (1-D vectors, bools, 0-d scalars); run the SAME `make_loop_body` under
    # a carry of uniformly >=2-D arrays, re-encoding at the loop boundary.
    def enc_st(s2):
        out = []
        for name in _STATE_FIELDS:
            v = getattr(s2, name)
            if name in _BOOL_FIELDS:
                v = v.astype(jnp.int32)
            if v.ndim == 1:
                v = v[None]
            out.append(v)
        out.append(jnp.reshape(s2.it, (1, 1)))  # () -> (1,1)
        return tuple(out)

    def dec_st(carry):
        vals2 = {}
        for name, v in zip(_STATE_FIELDS, carry[:-1]):
            if name in _BOOL_FIELDS:
                v = v != 0
            vals2[name] = v
        return SolverState(
            liMi_R=liMi_R, liMi_p=liMi_p, it=carry[-1][0, 0],
            log_rp=None, log_rd=None, log_mu=None, **vals2,
        )

    running_idx = _STATE_FIELDS.index("running")

    def running_any(carry):
        # i32 max instead of bool any: Mosaic lowers reduce_or through a
        # float proxy that becomes f64 under x64 and fails the scalar
        # squeeze; an integer max reduction stays 32-bit everywhere
        return jnp.max(carry[running_idx]) > 0

    body_core = make_loop_body(tree, prob, params)

    def body_k(carry):
        return enc_st(body_core(dec_st(carry)))

    final = jax.lax.while_loop(running_any, body_k, enc_st(st))
    st = dec_st(final)

    for name, ref in zip(_STATE_FIELDS, outs):
        v = getattr(st, name)
        if name in _BOOL_FIELDS:
            v = v.astype(jnp.int32)
        if v.ndim == 1:
            v = v[None]
        ref[:] = jnp.broadcast_to(v, ref.shape)


# one warning per distinct (call-site, reason): the XLA fallback tick is
# ~14x slower than the fused one (8.5 ms vs 0.59 ms at B=1024, ROADMAP) — a
# cliff users must be told about, once, not per call
_fallback_warned: set = set()


def fused_eligibility(tree, params: SolverParams, B: int, batch_tile: int,
                      dtype=None):
    """Why-not report for the fused production kernel.

    Returns ``(eligible, reason)``: eligible=True means the fused Pallas
    kernel can run on this call shape; otherwise ``reason`` names the first
    blocker in plain words.  ``dtype=None`` skips the f32 check (the
    delta-duals path casts to f32 internally, so its stages fuse regardless
    of the caller's q dtype)."""
    import jax

    backend = jax.default_backend()
    if backend != "tpu":
        return False, f"backend is '{backend}', not TPU"
    if params.logging:
        return False, ("params.logging is set — the fused kernel has no "
                       "per-iteration log arrays (use utils.debug_mirror "
                       "to log a batch on the XLA path)")
    if params.verbose:
        return False, ("params.verbose is set — host callbacks cannot run "
                       "inside a Mosaic kernel")
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False, (f"dtype {jnp.dtype(dtype).name} != float32 (Mosaic "
                       "TPU has no f64; cast inputs or use the delta-duals "
                       "refinement for tight tolerances)")
    if tree.has_q_dependent_S:
        return False, ("tree has configuration-dependent motion subspaces "
                       "(universal/mimic joints) — the kernel bakes S in as "
                       "constants")
    if B % batch_tile:
        return False, (f"batch {B} is not divisible by the batch tile "
                       f"{batch_tile} (pad the batch or pass batch_tile=)")
    if params.check_interval > 1 and tree.njoints * batch_tile > 3000:
        # measured boundary (ROADMAP round-5): talos (33 joints x tile 128 =
        # 4224) overflows Mosaic's 16 MB scoped-VMEM stack by ~0.5 MB at
        # K=2 (and more at K=4) because the K-unrolled body extends the
        # interval-start state's live ranges; panda at 9 x 256 = 2304 fits
        # at K=4 with room.  Without this gate the failure is an opaque
        # remote-compile OOM.
        return False, (f"check_interval={params.check_interval} with "
                       f"{tree.njoints} joints x batch_tile {batch_tile} "
                       "exceeds the Mosaic scoped-VMEM stack (measured: 33 "
                       "joints x tile 128 overflows 16 MB at K>=2); use "
                       "check_interval=1 for trees this tall or fused=False")
    return True, None


def resolve_fused(fused, tree, params: SolverParams, B: int, batch_tile: int,
                  dtype=None, where: str = "solve") -> bool:
    """Resolve a user ``fused=`` request (None | bool | 'require') to a bool.

    None (auto): eligible shapes fuse; an ineligible shape on TPU warns ONCE
    per (call-site, reason) naming the blocker — the silent-14x-cliff fix
    (VERDICT r4 weak #3).  On CPU the fallback is silent (expected: the
    correctness tier runs there).  'require': raise with the reason instead
    of degrading.  True/False: forced by the caller (the kernel itself still
    validates hard preconditions)."""
    if fused == "require":
        ok, reason = fused_eligibility(tree, params, B, batch_tile, dtype)
        if not ok:
            raise ValueError(
                f"{where}: fused='require' but the fused kernel cannot run "
                f"here: {reason}"
            )
        return True
    if fused is None:
        ok, reason = fused_eligibility(tree, params, B, batch_tile, dtype)
        if not ok and not reason.startswith("backend"):
            key = (where, reason)
            if key not in _fallback_warned:
                _fallback_warned.add(key)
                import warnings

                warnings.warn(
                    f"{where}: falling back to the per-op XLA solver "
                    f"(~14x slower per tick at production batch sizes): "
                    f"{reason}. Pass fused=False to silence or "
                    f"fused='require' to fail instead.",
                    stacklevel=3,
                )
        return ok
    return bool(fused)


def fused_solve_loop(tree, params: SolverParams, prob: PreparedProblem,
                     st: SolverState, batch_tile: int = 256,
                     interpret: bool = False) -> SolverState:
    """Run `_solve_loop` as one fused Pallas kernel over batch tiles.

    Takes/returns the same trailing-batch state as the XLA loop."""
    from jax.experimental import pallas as pl

    if params.logging:
        raise ValueError("fused path does not support logging")
    if params.verbose:
        raise ValueError(
            "fused path does not support verbose console mode (host "
            "callbacks cannot run inside a Mosaic kernel); use solver.solve"
        )
    B = st.vis.shape[-1]
    bt = min(batch_tile, B)
    if B % bt:
        raise ValueError(f"batch {B} not divisible by tile {bt}")
    grid = (B // bt,)
    dtype = st.vis.dtype

    def enc(name, v):
        if name in _BOOL_FIELDS:
            return v.astype(jnp.int32)[None]
        if name in _INT_FIELDS:
            return v[None]
        if v.ndim == 1:
            return v[None]
        return v

    state_arrays = [enc(n, getattr(st, n)) for n in _STATE_FIELDS]
    # optional per-problem leaves (precomputed subspaces for mixed
    # super-batches, the delta-duals nu-block offset, per-problem tolerance
    # scales) ride along as additional lane-tiled problem inputs
    prob_fields = _PROB_FIELDS + tuple(
        n for n in ("S_all", "r_offset", "tol_scale_primal", "tol_scale_dual")
        if getattr(prob, n) is not None
    )
    prob_arrays = [
        getattr(prob, n)[None] if getattr(prob, n).ndim == 1 else getattr(prob, n)
        for n in prob_fields
    ]
    if tree.axis.ndim == 3:
        if prob.S_all is None:
            raise ValueError(
                "fused_solve_loop with batched geometry (axis ndim 3) needs "
                "precomputed per-problem subspaces in prob.S_all — without "
                "them the in-kernel dummy axis would silently zero every "
                "motion subspace (use solve_fused / _fused_body, which set "
                "S_all)"
            )
        # batched geometry: S arrives precomputed via S_all; the axis leaf is
        # unused in-kernel, so pass a shape-stable dummy
        axis = jnp.zeros((tree.njoints, 3), dtype)
    else:
        axis = tree.axis.astype(dtype)
    inputs = state_arrays + prob_arrays + [st.liMi_R, st.liMi_p, axis]

    from jax.experimental import pallas as pl  # noqa: F811
    in_specs = [_tile_spec(a.shape, bt) for a in inputs[:-1]]
    # the axis array has no batch dim: replicate the full array to every tile
    in_specs.append(pl.BlockSpec(axis.shape, lambda i: (0, 0)))
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in state_arrays]
    out_specs = [_tile_spec(a.shape, bt) for a in state_arrays]

    kern = functools.partial(
        _kernel, tree, params, prob.constraint_links,
        len(state_arrays), prob_fields,
    )
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(*inputs)

    def dec(name, v):
        if name in _BOOL_FIELDS:
            return v[0] != 0
        if name in _INT_FIELDS:
            return v[0]
        if v.shape[0] == 1 and getattr(st, name).ndim == 1:
            return v[0]
        return v

    upd = {n: dec(n, v) for n, v in zip(_STATE_FIELDS, outs)}
    return dataclasses.replace(st, it=jnp.zeros((), jnp.int32), **upd)


def solve_fused(tree, params: SolverParams, q, problem: IkProblem,
                warm_state: Optional[SolverState] = None,
                batch_tile: int = 512, interpret: bool = False) -> SolveResult:
    """Drop-in variant of `solver.solve` running the fused kernel.

    f32-only: Mosaic has no f64, and under `jax_enable_x64` even weak-typed
    Python ints/floats in the traced loop widen to 64-bit and crash the TPU
    lowering (`bitwidth_ <= 32`).  f64 inputs are rejected up front and the
    trace runs with x64 scoped OFF so literals stay 32-bit regardless of the
    global flag (the f64 path is `solver.solve` / the two-stage refinement).
    """
    q = jnp.asarray(q)
    if q.dtype == jnp.float64:
        raise ValueError(
            "solve_fused is f32-only (Mosaic TPU has no f64); cast inputs to "
            "float32 or use solver.solve / solve_two_stage for f64"
        )
    if q.ndim == 1:
        q = q[None]

    with jax.enable_x64(False):
        return _run_fused(params, batch_tile, interpret, tree, q, problem,
                          warm_state)


# module-level jit: a closure re-created per call would RE-TRACE every call
# (~1.5 s of host tracing per solve, measured); here the cache keys on
# (params, tile, interpret) + the pytree treedefs and tracing happens once
@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _run_fused(params, batch_tile, interpret, tree, q, problem, warm_state):
    return _fused_body(params, batch_tile, interpret, tree, q, problem,
                       warm_state)


def with_S_all(tree, prob: PreparedProblem, dtype) -> PreparedProblem:
    """Attach precomputed per-problem motion subspaces for batched-geometry
    trees (axis (N, B, 3), the mixed super-batch path): inside the kernel S
    is DATA, not computation — (N, 6, K, B) built once at prepare time."""
    K = tree.nv_max
    if any(k != K for k in tree.nvs):
        raise ValueError(
            "fused path with batched geometry needs uniform joint "
            "dof counts (serial 1-dof chains)"
        )
    S_all = jnp.stack(
        [jnp.moveaxis(tree.joint_S(i).astype(dtype), 0, -1)
         for i in range(tree.njoints)]
    )
    return dataclasses.replace(prob, S_all=S_all)


def _fused_body(params, batch_tile, interpret, tree, q, problem, warm_state):
    """Traceable fused-solve body (also inlined by refine._two_stage_jit)."""
    if tree.has_q_dependent_S:
        raise ValueError(
            "the fused kernel does not support configuration-dependent "
            "motion subspaces (universal joints); use solver.solve"
        )
    with jax.default_matmul_precision("highest"):
        dtype = q.dtype
        B = q.shape[0]
        prob = prepare_problem(tree, problem, B, dtype)
        if tree.axis.ndim == 3:
            prob = with_S_all(tree, prob, dtype)
        if warm_state is None:
            from ..solver.state import init_state

            st = init_state(tree, B, problem.num_constraints, dtype)
        else:
            st = warm_state
        st = _reset_state(tree, params, st, dtype)
        liMi_R, liMi_p = fwd_pass_init(tree, q)
        st = dataclasses.replace(st, liMi_R=liMi_R, liMi_p=liMi_p)
        st = fused_solve_loop(tree, params, prob, st, batch_tile, interpret)
        vis_out = jnp.moveaxis(st.vis, -1, 0)
        return SolveResult(
            nu=_flat_nu(tree, st.nu),
            z=_flat_nu(tree, st.z),
            vis=vis_out,
            converged=st.converged,
            primal_infeasible=st.primal_infeasible,
            dual_infeasible=st.dual_infeasible,
            iterations=st.iterations,
            tail_iterations=st.tail_iterations,
            primal_residual=st.primal_residual,
            dual_residual=st.dual_residual,
            state=st,
        )
