"""SQP solver: linearize -> residuals -> QP -> globalize -> update.

TPU-native counterpart of the reference SQP loop
(/root/reference/acados/ocp_nlp/ocp_nlp_sqp.c:474, loop :541-799):
- linearization == one fused vmap (linearize.py) instead of the OpenMP
  module loop;
- the QP is solved by the Riccati IPM (ocp_qp/ipm.py) instead of HPIPM;
- globalization: FIXED_STEP or MERIT_BACKTRACKING with an l1 merit
  (reference ocp_nlp_globalization_merit_backtracking.c:290);
- per-instance termination/status inside `lax.while_loop` — a vmapped batch
  of SQP solves is the TPU replacement for the reference's OpenMP
  batch-of-capsules (acados_solver.in.c:3232);
- the per-iteration stats matrix mirrors the reference `stat` rows
  res_stat/res_eq/res_ineq/res_comp/qp_status/qp_iter/alpha
  (ocp_nlp_sqp.c:579-585).

Multiplier update rule follows ocp_nlp_update_variables_sqp
(ocp_nlp_common.c:3292): duals blend (1-alpha)*old + alpha*new.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from acados_tpu.ocp_nlp.formulation import NlpData, OcpNlpFormulation
from acados_tpu.ocp_nlp.linearize import (NlpIterate, build_static_rows,
                                          eval_constraints, eval_cost,
                                          eval_dyn_gap, linearize)
from acados_tpu.ocp_nlp.regularize import regularize_qp
from acados_tpu.ocp_qp.data import OcpQp
from acados_tpu.ocp_qp.ipm import IpmOpts, solve_ocp_qp
from acados_tpu.ocp_qp.xcond import solve_ocp_qp_xcond
from acados_tpu.ops.smallmm import mTv, mv
from acados_tpu.utils.struct import pytree_dataclass, static_field

# stats matrix columns (reference ocp_nlp_sqp.c:579-585)
STAT_COLS = ("res_stat", "res_eq", "res_ineq", "res_comp", "qp_status",
             "qp_iter", "alpha", "step_norm")

_CLOCK_EPOCH = None


def _wall_clock_dep(_dep):
    """_wall_clock with a dummy data dependency: the caller passes a
    scalar produced by the phase being timed, forcing XLA to finish that
    phase before the (ordered) callback fires."""
    return _wall_clock()


def _wall_clock():
    """Host wall clock for the predictive timeout (io_callback target);
    relative to first use so f32 keeps sub-ms resolution."""
    import time as _time

    import numpy as _np

    global _CLOCK_EPOCH
    if _CLOCK_EPOCH is None:
        _CLOCK_EPOCH = _time.perf_counter()
    import jax as _jax
    dt = _np.float64 if _jax.config.jax_enable_x64 else _np.float32
    return dt(_time.perf_counter() - _CLOCK_EPOCH)


@pytree_dataclass
class SqpOpts:
    """SQP options; names follow AcadosOcpOptions
    (acados_ocp_options.py: nlp_solver_max_iter, tol_*, globalization,
    levenberg_marquardt, globalization_alpha_min/alpha_reduction)."""

    max_iter: int = static_field(default=50)
    tol_stat: float = 1e-6
    tol_eq: float = 1e-6
    tol_ineq: float = 1e-6
    tol_comp: float = 1e-6
    tol_min_step_norm: float = 1e-12
    # unboundedness detection (reference tol_unbounded,
    # ocp_nlp_common.c:1285, check ocp_nlp_sqp.c:411-417)
    tol_unbounded: float = -1e10
    levenberg_marquardt: float = 0.0
    # adaptive LM (reference with_adaptive_levenberg_marquardt,
    # acados_ocp_options.py:136-140): lm /= lam on stationarity-residual
    # decrease, *= lam otherwise, floored at mu_min
    with_adaptive_levenberg_marquardt: bool = static_field(default=False)
    adaptive_levenberg_marquardt_lam: float = 5.0
    adaptive_levenberg_marquardt_mu_min: float = 1e-16
    adaptive_levenberg_marquardt_mu0: float = 1e-3
    regularize_method: str = static_field(default="NO_REGULARIZE")
    reg_epsilon: float = 1e-4  # reference default (acados_ocp_options.py)
    globalization: str = static_field(default="FIXED_STEP")
    # FIXED_STEP | MERIT_BACKTRACKING | FUNNEL_L1PEN_LINESEARCH
    # (reference ocp_nlp_globalization_* modules)
    alpha_min: float = 0.05
    alpha_reduction: float = 0.7
    full_step_dual: bool = static_field(default=False)
    # Armijo sufficient-descent test in the merit line search (reference
    # globalization_opts line_search_use_sufficient_descent +
    # eps_sufficient_descent, globalization_merit_backtracking.c:336-353)
    line_search_use_sufficient_descent: bool = static_field(default=False)
    eps_sufficient_descent: float = 1e-4
    # second-order correction on a rejected full step (reference
    # globalization_use_SOC; ocp_nlp_perform_second_order_correction,
    # ocp_nlp_common.c:4227 — Nocedal2006 eq. 18.51-18.56)
    globalization_use_SOC: bool = static_field(default=False)
    # funnel method parameters (reference globalization_funnel.c:73-96)
    funnel_initialization_increase_factor: float = 15.0
    funnel_initialization_upper_bound: float = 1.0
    funnel_sufficient_decrease_factor: float = 0.9
    funnel_kappa: float = 0.9
    funnel_fraction_switching_condition: float = 1e-3
    funnel_initial_penalty_parameter: float = 1.0
    funnel_penalty_contraction: float = 0.5
    funnel_penalty_eta: float = 1e-6
    rti: bool = static_field(default=False)
    # SQP_RTI semantics: one iteration, success unless NaN/QP failure
    # (reference ocp_nlp_sqp_rti.c never checks NLP convergence).
    matmul_precision: str = static_field(default="highest")
    # bf16 MXU passes corrupt cost/constraint gradients on TPU (residual
    # norms stall ~1e-2); see IpmOpts.matmul_precision.
    # QP condensing front-end (reference: qp_solver plan enum
    # PARTIAL_CONDENSING_* / FULL_CONDENSING_* + qp_solver_cond_N,
    # ocp_qp_interface.h:60-106). cond_N must divide N (use
    # xcond.resolve_cond_N); None = no condensing.
    cond_N: int | None = static_field(default=None)
    # explicit ragged block sizes (reference qp_solver_cond_block_size;
    # tuple summing to N) — overrides cond_N's HPIPM remainder rule
    cond_block_size: tuple | None = static_field(default=None)
    full_cond: bool = static_field(default=False)
    # AS-RTI advanced-step options (reference as_rti_level_t LEVEL_A..D +
    # as_rti_iter + advancement strategy, ocp_nlp_sqp_rti.h:70-77,
    # ocp_nlp_sqp_rti.c:711-877). Only used by make_rti_solver.
    as_rti_level: str = static_field(default="STANDARD")  # A|B|C|D|STANDARD
    as_rti_iter: int = static_field(default=1)
    as_rti_advancement: str = static_field(default="SIMULATE")  # SHIFT|NONE
    # fixed-step length (reference nlp_solver_step_length /
    # globalization_fixed_step_length, acados_ocp_options.py)
    step_length: float = 1.0
    # measure per-phase times INSIDE the solve (reference ocp_nlp_timings
    # time_lin/time_reg/time_qp_sol/time_glob, ocp_nlp_common.h:410-428)
    # via ordered host-clock callbacks with data-dependency fences.
    # Single-instance solves only (ordered callbacks do not vmap); each
    # boundary costs a host round trip, so this is a diagnostic mode —
    # the reference pays the same cost unconditionally on CPU where a
    # clock read is cheap.
    collect_phase_times: bool = static_field(default=False)
    # predictive in-loop timeout (reference ocp_nlp_sqp.c:436,611-635):
    # before each iteration, elapsed + predicted-next-iteration time is
    # checked against the budget; heuristic in {ZERO, LAST, MAX,
    # AVERAGE}. Uses an ordered host clock callback, so it is for
    # SINGLE-INSTANCE solves (the reference is single-instance too);
    # the batched/vmapped path uses the post-hoc budget check instead.
    timeout_max_time: float = static_field(default=0.0)
    timeout_heuristic: str = static_field(default="ZERO")
    # Anderson(1) acceleration on the fixed-step update (reference
    # with_anderson_acceleration + anderson_activation_threshold,
    # ocp_nlp_common.c:1277-1278, globalization_fixed_step.c:174-215)
    with_anderson_acceleration: bool = static_field(default=False)
    anderson_activation_threshold: float = 1e1
    # keep the per-iteration primal iterates (reference store_iterates,
    # ocp_nlp_common.h:352); exposed via SqpStats.iterates_x/u
    store_iterates: bool = static_field(default=False)
    # QP scaling (reference ocp_nlp_qpscaling.c; modes mirror
    # qpscaling_scale_objective_type): NO_SCALING | OBJECTIVE_GERSHGORIN
    qpscaling: str = static_field(default="NO_SCALING")
    # warm-start each iteration's QP at the current NLP multipliers
    # with zero primal deltas (reference warm_start_first_qp_from_nlp,
    # ocp_nlp_common.h:350). Default OFF and not auto-enabled for RTI:
    # measured on chip it RAISES the steady-state residual floor
    # (pendulum 2e-3 -> 1.2e-2) and destabilizes the chain model — the
    # Mehrotra cold start (mu0-scaled) recenters better than NLP duals
    # pinned at the t0_min floor on the equality rows.
    warm_start_first_qp_from_nlp: bool = static_field(default=False)
    # QP backend by registry name (ocp_qp/registry.py; reference
    # qp_solver plan enum — RICCATI_IPM is the HPIPM analog, ADMM the
    # OSQP-class first-order fallback)
    qp_solver_name: str = static_field(default="RICCATI_IPM")
    # QP-tolerance strategy per NLP iteration (reference
    # nlp_qp_tol_strategy, acados_ocp_options.py:663-686,
    # ocp_nlp_common.c:4460): ADAPTIVE_CURRENT_RES_JOINT ties each QP's
    # stopping tolerance to the current NLP residuals (inexact-SQP
    # forcing term) — saves IPM iterations that cannot improve the step;
    # FIXED_QP_TOL uses qp_opts' tolerances unchanged.
    nlp_qp_tol_strategy: str = static_field(default="FIXED_QP_TOL")
    nlp_qp_tol_reduction_factor: float = 1e-1
    nlp_qp_tol_safety_factor: float = 0.1
    # eliminate the fixed initial state from each QP (reference: HPIPM
    # d_ocp_qp_reduce_eq_dof, applied unconditionally by the reference's
    # condensing front-end, ocp_qp_partial_condensing.c:542). Effective
    # only when the builder proved the stage-0 layout is a full-state
    # equality (constraints.x0 / idxbxe_0 == range(nx)); requires
    # lbx_0 == ubx_0 at runtime (the x0-injection API keeps them equal).
    eliminate_x0: bool = static_field(default=True)
    qp_opts: IpmOpts = None

    def __post_init__(self):
        if self.qp_opts is None:
            object.__setattr__(self, "qp_opts", IpmOpts())


@pytree_dataclass
class SqpStats:
    """Solve diagnostics (reference: solver.get_stats + stat matrix)."""

    status: jnp.ndarray     # utils.types.AcadosStatus
    sqp_iter: jnp.ndarray
    qp_iter_total: jnp.ndarray
    res_stat: jnp.ndarray
    res_eq: jnp.ndarray
    res_ineq: jnp.ndarray
    res_comp: jnp.ndarray
    stat: jnp.ndarray       # (max_iter+1, 8) iteration table
    cost: jnp.ndarray
    # (max_iter+1, N+1, nx)/(max_iter+1, N, nu) when store_iterates,
    # else None (reference mem->iterates, ocp_nlp_common.h:452)
    iterates_x: jnp.ndarray = None
    iterates_u: jnp.ndarray = None
    # (4,) accumulated [time_lin, time_reg, time_qp, time_glob] seconds,
    # when collect_phase_times (reference ocp_nlp_timings)
    phase_times: jnp.ndarray = None


def _nlp_residuals(form, qp: OcpQp, it: NlpIterate, soft_scaled):
    """NLP KKT residual inf-norms at the current iterate, using the fresh
    linearization (the NLP KKT residual equals the QP KKT residual at zero
    step with current multipliers). Reference: ocp_nlp_res_compute
    (ocp_nlp_common.c:3680)."""
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    Zl, Zu, zl, zu = qp.Zl, qp.Zu, qp.zl, qp.zu  # already cost-scaled
    lam_d = ml * it.lam_l - mu_ * it.lam_u

    rx = qp.q - mTv(qp.C, lam_d)
    rx = rx.at[:-1].add(mTv(qp.A, it.pi))
    rx = rx.at[1:].add(-it.pi)
    ru = qp.r + mTv(qp.B, it.pi) - mTv(qp.D, lam_d[:-1])

    # slack stationarity: zl + Zl sl - lam_l - lam_sl = 0 with the implicit
    # slack multiplier lam_sl = max(zl + Zl sl - lam_l, 0) >= 0 eliminated;
    # its negative part is the stationarity violation, the product with sl
    # is complementarity (counted in res_comp below)
    r_sl = sml * (zl + Zl * it.sl - it.lam_l)
    r_su = smu * (zu + Zu * it.su - it.lam_u)
    r_sl = jnp.maximum(-r_sl, 0.0)
    r_su = jnp.maximum(-r_su, 0.0)

    res_stat = jnp.maximum(jnp.max(jnp.abs(rx)), jnp.max(jnp.abs(ru)))
    res_stat = jnp.maximum(res_stat,
                           jnp.maximum(jnp.max(r_sl), jnp.max(r_su)))
    res_eq = jnp.max(jnp.abs(qp.b))
    # delta-form bounds: lg = lb - g, ug = ub - g at the current point
    viol_l = ml * jnp.maximum(qp.lg - sml * it.sl, 0.0)
    viol_u = mu_ * jnp.maximum(-qp.ug - smu * it.su, 0.0)
    res_ineq = jnp.maximum(jnp.max(viol_l), jnp.max(viol_u))
    # complementarity: lam * distance-to-bound (slack-relaxed)
    t_l = -qp.lg + sml * it.sl
    t_u = qp.ug + smu * it.su
    res_comp = jnp.maximum(jnp.max(ml * jnp.abs(it.lam_l * t_l)),
                           jnp.max(mu_ * jnp.abs(it.lam_u * t_u)))
    res_comp = jnp.maximum(
        res_comp, jnp.max(sml * jnp.abs(it.sl * jnp.maximum(
            zl + Zl * it.sl - it.lam_l, 0.0))))
    res_comp = jnp.maximum(
        res_comp, jnp.max(smu * jnp.abs(it.su * jnp.maximum(
            zu + Zu * it.su - it.lam_u, 0.0))))
    return res_stat, res_eq, res_ineq, res_comp


def _l1_infeasibility(form, data, soft_mask, x, u, sl, su, lb_all, ub_all):
    """Unweighted l1 infeasibility: |dynamics gaps|_1 + bound violations
    (reference ocp_nlp_get_l1_infeasibility)."""
    gap = eval_dyn_gap(form, data, x, u)
    g = eval_constraints(form, data, x, u)
    viol_l = jnp.maximum(lb_all - g - soft_mask * sl, 0.0)
    viol_u = jnp.maximum(g - ub_all - soft_mask * su, 0.0)
    return jnp.sum(jnp.abs(gap)) + jnp.sum(viol_l + viol_u)


def _merit(form, data, soft_mask, x, u, sl, su, w_pi, w_lam, lb_all, ub_all):
    """l1 merit: objective + multiplier-weighted infeasibilities
    (reference merit_fun in globalization_merit_backtracking.c)."""
    cost = eval_cost(form, data, x, u, sl, su, soft_mask)
    gap = eval_dyn_gap(form, data, x, u)
    g = eval_constraints(form, data, x, u)
    viol_l = jnp.maximum(lb_all - g - soft_mask * sl, 0.0)
    viol_u = jnp.maximum(g - ub_all - soft_mask * su, 0.0)
    return (cost + jnp.sum(w_pi * jnp.abs(gap))
            + jnp.sum(w_lam * (viol_l + viol_u)))


def _merit_gradient(form, qp, sol, it, w_pi, w_lam, lb_all, ub_all,
                    soft_mask, data):
    """Directional derivative of the l1 merit along the QP step
    (reference ocp_nlp_compute_merit_gradient,
    globalization_merit_backtracking.c:140-280)."""
    # objective part: cost gradient . step
    g_cost = jnp.sum(qp.q * sol.x) + jnp.sum(qp.r * sol.u)
    # dynamics part: w_pi * sign(gap) * d(lin gap)
    dgap = mv(qp.A, sol.x[:-1]) + mv(qp.B, sol.u) - sol.x[1:]
    gap = eval_dyn_gap(form, data, it.x, it.u)
    g_dyn = jnp.sum(w_pi * jnp.sign(gap) * dgap)
    # inequality part: active (violated) rows only
    g = eval_constraints(form, data, it.x, it.u)
    drow = mv(qp.C, sol.x)
    drow = drow.at[:-1].add(mv(qp.D, sol.u))
    dsl = sol.sl - it.sl
    dsu = sol.su - it.su
    act_l = (lb_all - g - soft_mask * it.sl) > 0
    act_u = (g - ub_all - soft_mask * it.su) > 0
    g_ineq = (jnp.sum(jnp.where(act_l, w_lam * (-drow
                                                - soft_mask * dsl), 0.0))
              + jnp.sum(jnp.where(act_u, w_lam * (drow
                                                  - soft_mask * dsu),
                                  0.0)))
    return g_cost + g_dyn + g_ineq


def _funnel_search(form, opts, data, soft_mask, lb_all, ub_all, qp, it,
                   sol, gstate, dtype):
    """Funnel l1-penalty line search (reference globalization_funnel.c:
    backtracking_line_search + is_trial_iterate_acceptable_to_funnel).

    gstate = (funnel_width, penalty_parameter, penalty_mode).
    Returns (alpha, new gstate).
    """
    fw, pen, pmode = gstate
    eps_sd = jnp.asarray(opts.eps_sufficient_descent, dtype)
    eta = jnp.asarray(opts.funnel_penalty_eta, dtype)

    cur_inf = _l1_infeasibility(form, data, soft_mask, it.x, it.u, it.sl,
                                it.su, lb_all, ub_all)
    cur_cost = eval_cost(form, data, it.x, it.u, it.sl, it.su, soft_mask)
    # predicted reductions (ocp_nlp_sqp.c:757-758): the QP removes the
    # whole linearized infeasibility; objective via grad . step
    pred_inf = cur_inf
    pred_obj = -(jnp.sum(qp.q * sol.x) + jnp.sum(qp.r * sol.u))
    pred_obj = jnp.where((pred_obj < 0) & (pred_obj > -1e-4), 0.0,
                         pred_obj)
    # penalty parameter update (update_funnel_penalty_parameter)
    shrink = pen * pred_obj + pred_inf < eta * pred_inf
    pen_new = jnp.maximum(0.0, jnp.minimum(
        opts.funnel_penalty_contraction * pen,
        (1.0 - eta) * pred_inf / (-pred_obj + 1e-9)))
    pen = jnp.where(shrink, pen_new, pen)
    cur_merit = pen * cur_cost + cur_inf
    pred_merit = pen * pred_obj + pred_inf

    def classify(alpha):
        xt = it.x + alpha * sol.x
        ut = it.u + alpha * sol.u
        slt = it.sl + alpha * (sol.sl - it.sl)
        sut = it.su + alpha * (sol.su - it.su)
        t_inf = _l1_infeasibility(form, data, soft_mask, xt, ut, slt,
                                  sut, lb_all, ub_all)
        t_cost = eval_cost(form, data, xt, ut, slt, sut, soft_mask)
        inside = t_inf <= fw
        switching = (alpha * pred_obj
                     >= opts.funnel_fraction_switching_condition
                     * pred_inf)
        armijo_obj = (cur_cost - t_cost
                      >= eps_sd * alpha
                      * jnp.maximum(0.0, pred_obj - 1e-9))
        h_ok = t_inf <= opts.funnel_sufficient_decrease_factor * fw
        t_merit = pen * t_cost + t_inf
        armijo_merit = (cur_merit - t_merit
                        >= eps_sd * alpha
                        * jnp.maximum(0.0, pred_merit - 1e-9))
        f_type = (~pmode) & inside & switching & armijo_obj
        h_type = (~pmode) & inside & (~switching) & h_ok
        b_type = ((~pmode) & inside & (~switching) & (~h_ok)
                  & (t_inf < cur_inf) & armijo_merit)
        p_type = pmode & inside & armijo_merit
        ok = f_type | h_type | b_type | p_type
        finite = jnp.isfinite(t_cost) & jnp.isfinite(t_inf)
        return ok & finite, h_type, b_type, p_type, h_ok, t_inf

    def ls_cond(ls):
        alpha, accepted = ls[0], ls[1]
        return jnp.logical_and(jnp.logical_not(accepted),
                               alpha > opts.alpha_min)

    def ls_body(ls):
        alpha = ls[0]
        ok, h_t, b_t, p_t, h_ok, t_inf = classify(alpha)
        alpha_next = jnp.where(ok, alpha, alpha * opts.alpha_reduction)
        return (alpha_next, ok, h_t, b_t, p_t, h_ok, t_inf)

    f0 = jnp.asarray(False)
    z0 = jnp.asarray(0.0, dtype)
    alpha, ok, h_t, b_t, p_t, h_ok, t_inf = jax.lax.while_loop(
        ls_cond, ls_body,
        (jnp.asarray(1.0, dtype), f0, f0, f0, f0, f0, z0))

    # funnel / mode updates for the accepted step
    do_decrease = ok & (h_t | (p_t & h_ok))
    fw = jnp.where(do_decrease,
                   (1.0 - opts.funnel_kappa) * t_inf
                   + opts.funnel_kappa * fw, fw)
    pmode = jnp.where(ok & b_t, True,
                      jnp.where(ok & p_t & h_ok, False, pmode))
    return alpha, (fw, pen, pmode)


def adaptive_qp_tol(opts: SqpOpts, qp_opts: IpmOpts, rs, re, ri, rc):
    """ADAPTIVE_CURRENT_RES_JOINT QP tolerances from the current NLP
    residuals (reference ocp_nlp_common.c:4460, spec
    acados_ocp_options.py:663-686):
      tmp_tol_* = min(reduction_factor * res_*, 1e-2)
      joint     = max over tmp_tol_*
      tol_*     = max(joint, safety_factor * nlp_tol_*)."""
    dtype = rs.dtype
    red = jnp.asarray(opts.nlp_qp_tol_reduction_factor, dtype)
    saf = jnp.asarray(opts.nlp_qp_tol_safety_factor, dtype)
    cap = jnp.asarray(1e-2, dtype)
    joint = jnp.max(jnp.stack([
        jnp.minimum(red * rs, cap), jnp.minimum(red * re, cap),
        jnp.minimum(red * ri, cap), jnp.minimum(red * rc, cap)]))
    return qp_opts.replace(
        tol_stat=jnp.maximum(joint, saf * opts.tol_stat),
        tol_eq=jnp.maximum(joint, saf * opts.tol_eq),
        tol_ineq=jnp.maximum(joint, saf * opts.tol_ineq),
        tol_comp=jnp.maximum(joint, saf * opts.tol_comp))


def use_x0_elimination(form: OcpNlpFormulation, opts: SqpOpts) -> bool:
    """Static eligibility for initial-state elimination (the HPIPM
    d_ocp_qp_reduce_eq_dof analog, which the reference applies
    unconditionally BEFORE partial condensing,
    ocp_qp_partial_condensing.c:542): the builder must have proven the
    stage-0 rows start with a full-state identity equality block
    (x0_equality) and none of those rows are softened. The elimination
    composes with partial condensing (the condensed block-0 entry state
    IS x0; xcond passes the re-blocked identity-row positions) and with
    qpscaling (the x0 rows keep unit row scales). Full condensing has
    its own state elimination; non-Riccati backends lack the fast
    path."""
    nx = form.nx
    return bool(
        opts.eliminate_x0
        and getattr(form, "x0_equality", False)
        and form.con_0.idxbx == tuple(range(nx))
        and not any(r < nx for r in form.con_0.soft_rows)
        and not opts.full_cond
        and opts.qp_solver_name == "RICCATI_IPM")


def make_sqp_solver(form: OcpNlpFormulation, opts: SqpOpts):
    """Build the jitted SQP solve function.

    Returns solve(data: NlpData, init: NlpIterate) -> (NlpIterate, SqpStats).
    vmap it over a leading batch axis for batched solves; shard the batch
    axis over a device mesh for multi-chip.
    """

    def solve(data: NlpData, init: NlpIterate):
        with jax.default_matmul_precision(opts.matmul_precision):
            return _solve(data, init)

    # static real-row counts per stage class: lets partial condensing
    # prune padding rows instead of promoting all nc rows per eliminated
    # stage to general constraints (the round-2 row-blowup regression)
    _keep_rows = (None if getattr(form, "segments", None) is not None
                  else (form.con_0.nrows, form.con.nrows,
                        form.con_e.nrows))
    _x0_fixed = use_x0_elimination(form, opts)

    def solve_qp(qp, warm=None, qp_opts=None):
        """QP backend dispatch: scaling front-end -> condensing front-end
        -> Riccati IPM. qp_opts overrides opts.qp_opts (the adaptive
        QP-tolerance strategy passes per-iteration tolerances)."""
        if qp_opts is None:
            qp_opts = opts.qp_opts
        scales = None
        if opts.qpscaling != "NO_SCALING":
            from acados_tpu.ocp_qp.qpscaling import scale_qp, unscale_sol
            # x0 rows keep unit scales: the eliminated path reads dx0
            # from lg on those rows (see qpscaling.scale_qp)
            qp, scales = scale_qp(
                qp, unit_rows_0=form.nx if _x0_fixed else 0)
            warm = None  # warm point is in unscaled units
        if opts.full_cond:
            sol, info = solve_ocp_qp_xcond(qp, qp_opts,
                                           full_cond=True)
        elif opts.cond_N is not None:
            sol, info = solve_ocp_qp_xcond(
                qp, qp_opts, cond_N=opts.cond_N, warm=warm,
                keep_rows=_keep_rows,
                cond_block_size=opts.cond_block_size,
                x0_fixed=_x0_fixed)
        elif opts.qp_solver_name != "RICCATI_IPM":
            from acados_tpu.ocp_qp.registry import get_qp_backend
            sol, info = get_qp_backend(opts.qp_solver_name)(
                qp, qp_opts, warm=warm)
        else:
            sol, info = solve_ocp_qp(qp, qp_opts, warm=warm,
                                     x0_fixed=_x0_fixed)
        if scales is not None:
            sol = unscale_sol(sol, scales)
        return sol, info

    def _solve(data: NlpData, init: NlpIterate):
        dtype = init.x.dtype
        static_rows = build_static_rows(form, dtype)
        lm = jnp.asarray(opts.levenberg_marquardt, dtype)
        soft_scaled = static_rows["soft"] * static_rows["mask"]
        lb_all = jnp.concatenate([data.lb_0[None], data.lb,
                                  data.lb_e[None]])
        ub_all = jnp.concatenate([data.ub_0[None], data.ub,
                                  data.ub_e[None]])
        # mask off disabled rows / absent sides for merit-violation checks
        big = jnp.asarray(1e20, dtype)
        inf_thr = 0.5 * 1e10  # 0.5 * ACADOS_INFTY
        lb_m = jnp.where((static_rows["mask"] > 0) & (lb_all > -inf_thr),
                         lb_all, -big)
        ub_m = jnp.where((static_rows["mask"] > 0) & (ub_all < inf_thr),
                         ub_all, big)

        nstat = len(STAT_COLS)
        stat0 = jnp.zeros((opts.max_iter + 1, nstat), dtype)
        use_aa = (opts.with_anderson_acceleration
                  and opts.globalization == "FIXED_STEP")

        def cond(carry):
            return jnp.logical_and(carry[1] < opts.max_iter,
                                   jnp.logical_not(carry[3]))

        adaptive_lm = opts.with_adaptive_levenberg_marquardt

        collect_pt = opts.collect_phase_times
        tdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        def _pclock(dep):
            from jax.experimental import io_callback
            return io_callback(_wall_clock_dep,
                               jax.ShapeDtypeStruct((), tdt),
                               jnp.asarray(dep, tdt), ordered=True)

        def _taint(tree, t):
            z = (t * 0).astype(dtype)
            return jax.tree.map(lambda v: v + z.astype(v.dtype), tree)

        def _iteration(carry):
            (it, k, status, _, qp_tot, stat, aa, hist, gstate,
             _res_prev, tstate, ptimes) = carry
            lm_k = _res_prev[4] if adaptive_lm else lm
            if collect_pt:
                t_a = _pclock(it.x[0, 0])
                it = _taint(it, t_a)
            qp = linearize(form, static_rows, data, it, lm_k)
            rs, re, ri, rc = _nlp_residuals(form, qp, it, soft_scaled)
            stat = stat.at[k, 0].set(rs).at[k, 1].set(re) \
                       .at[k, 2].set(ri).at[k, 3].set(rc)

            converged = ((rs < opts.tol_stat) & (re < opts.tol_eq)
                         & (ri < opts.tol_ineq) & (rc < opts.tol_comp))
            # unbounded-objective detection (ocp_nlp_sqp.c:411-417)
            cost_k = eval_cost(form, data, it.x, it.u, it.sl, it.su,
                               soft_scaled)
            unbounded = cost_k <= opts.tol_unbounded

            if collect_pt:
                t_b = _pclock(rs)
                qp = _taint(qp, t_b)
            # Hessian regularization before the QP (reference hook:
            # regularize->regularize, ocp_nlp_sqp.c:602); the NLP residuals
            # above use only gradients, so they see the true problem.
            qp_solve = regularize_qp(qp, opts.regularize_method,
                                     opts.reg_epsilon)
            if collect_pt:
                t_c = _pclock(qp_solve.Q[0, 0, 0])
                qp_solve = _taint(qp_solve, t_c)
            if opts.nlp_qp_tol_strategy == "ADAPTIVE_CURRENT_RES_JOINT":
                qp_opts_k = adaptive_qp_tol(opts, opts.qp_opts, rs, re,
                                            ri, rc)
            else:
                qp_opts_k = opts.qp_opts
            if opts.warm_start_first_qp_from_nlp:
                from acados_tpu.ocp_qp.data import OcpQpSol
                warm0 = OcpQpSol(
                    x=jnp.zeros_like(qp.q), u=jnp.zeros_like(qp.r),
                    pi=it.pi, lam_lg=it.lam_l, lam_ug=it.lam_u,
                    t_lg=jnp.ones_like(it.lam_l),
                    t_ug=jnp.ones_like(it.lam_u), sl=it.sl, su=it.su)
                sol, info = solve_qp(qp_solve, warm=warm0,
                                     qp_opts=qp_opts_k)
            else:
                sol, info = solve_qp(qp_solve, qp_opts=qp_opts_k)
            if collect_pt:
                t_d = _pclock(info.res_stat)
                sol = _taint(sol, t_d)
            qp_ok = info.status <= 0
            # QP hit its iteration limit but may still be usable; only a
            # NaN QP is fatal (reference: QP failure propagation,
            # ocp_nlp_sqp.c:720-752).
            qp_fatal = info.status == 1
            qp_tot = qp_tot + info.num_iter
            stat = stat.at[k, 4].set(info.status.astype(dtype)) \
                       .at[k, 5].set(info.num_iter.astype(dtype))

            sol_used = sol
            if opts.globalization == "FIXED_STEP":
                alpha = jnp.asarray(opts.step_length, dtype)
            elif opts.globalization == "FUNNEL_L1PEN_LINESEARCH":
                alpha, gstate = _funnel_search(
                    form, opts, data, soft_scaled, lb_m, ub_m, qp, it,
                    sol, gstate, dtype)
            else:  # MERIT_BACKTRACKING
                w_pi = jnp.maximum(jnp.abs(it.pi), jnp.abs(sol.pi)) + 1e-4
                w_lam = (jnp.maximum(jnp.maximum(it.lam_l, sol.lam_lg),
                                     jnp.maximum(it.lam_u, sol.lam_ug))
                         + 1e-4) * static_rows["mask"]
                merit0 = _merit(form, data, soft_scaled, it.x, it.u,
                                it.sl, it.su, w_pi, w_lam, lb_m, ub_m)
                if opts.line_search_use_sufficient_descent:
                    dmerit = _merit_gradient(form, qp, sol, it, w_pi,
                                             w_lam, lb_m, ub_m,
                                             soft_scaled, data)
                    dmerit = jnp.minimum(dmerit, 0.0)
                else:
                    dmerit = jnp.asarray(0.0, dtype)
                eps_sd = jnp.asarray(opts.eps_sufficient_descent, dtype)

                def trial_merit(s, alpha):
                    xt = it.x + alpha * s.x
                    ut = it.u + alpha * s.u
                    slt = it.sl + alpha * (s.sl - it.sl)
                    sut = it.su + alpha * (s.su - it.su)
                    return _merit(form, data, soft_scaled, xt, ut, slt,
                                  sut, w_pi, w_lam, lb_m, ub_m)

                m1 = trial_merit(sol, jnp.asarray(1.0, dtype))
                full_ok = m1 < merit0 + eps_sd * dmerit

                if opts.globalization_use_SOC:
                    # second-order correction of the QP rhs at the
                    # rejected full step (ocp_nlp_common.c:4227)
                    x_t = it.x + sol.x
                    u_t = it.u + sol.u
                    gap_t = eval_dyn_gap(form, data, x_t, u_t)
                    dgap_lin = (mv(qp.A, sol.x[:-1])
                                + mv(qp.B, sol.u) - sol.x[1:])
                    g_t = eval_constraints(form, data, x_t, u_t)
                    g_cur = eval_constraints(form, data, it.x, it.u)
                    drow = mv(qp.C, sol.x)
                    drow = drow.at[:-1].add(mv(qp.D, sol.u))
                    delta2 = g_t - g_cur - drow
                    qp_soc = qp.replace(b=gap_t - dgap_lin,
                                        lg=qp.lg - delta2,
                                        ug=qp.ug - delta2)
                    sol_soc, info_soc = solve_qp(qp_soc,
                                                 qp_opts=qp_opts_k)
                    qp_tot = qp_tot + info_soc.num_iter
                    m_soc = trial_merit(sol_soc,
                                        jnp.asarray(1.0, dtype))
                    soc_ok = jnp.logical_and(
                        jnp.logical_not(full_ok),
                        m_soc < merit0 + eps_sd * dmerit)
                    sol_used = jax.tree.map(
                        lambda a, b: jnp.where(soc_ok, a, b), sol_soc,
                        sol)
                else:
                    soc_ok = jnp.asarray(False)

                def ls_cond(ls):
                    alpha, accepted = ls
                    return jnp.logical_and(
                        jnp.logical_not(accepted),
                        alpha > opts.alpha_min)

                def ls_body(ls):
                    alpha, _ = ls
                    mt = trial_merit(sol, alpha)
                    ok = mt < merit0 + eps_sd * dmerit * alpha
                    alpha_next = jnp.where(ok, alpha,
                                           alpha * opts.alpha_reduction)
                    return (alpha_next, ok)

                alpha_bt, _ = jax.lax.while_loop(
                    ls_cond, ls_body,
                    (jnp.asarray(opts.alpha_reduction, dtype),
                     jnp.asarray(False)))
                alpha = jnp.where(full_ok | soc_ok, 1.0, alpha_bt)
            sol = sol_used

            step_norm = alpha * jnp.maximum(jnp.max(jnp.abs(sol.x)),
                                            jnp.max(jnp.abs(sol.u)))
            stat = stat.at[k, 6].set(alpha).at[k, 7].set(step_norm)

            beta = alpha if opts.full_step_dual is False else 1.0
            # delta primal-dual step (Anderson works on delta form,
            # ocp_nlp_convert_primaldelta_absdual_step_to_delta_step)
            step = NlpIterate(
                x=sol.x, u=sol.u, pi=sol.pi - it.pi,
                lam_l=sol.lam_lg - it.lam_l, lam_u=sol.lam_ug - it.lam_u,
                sl=sol.sl - it.sl, su=sol.su - it.su)
            if use_aa:
                prev_step, and_step = aa
                d_diff = jax.tree.map(lambda n, o: n - o, step, prev_step)
                dots = jax.tree.map(lambda a, c: jnp.sum(a * c), step,
                                    d_diff)
                nrm2 = jax.tree.map(lambda c: jnp.sum(c * c), d_diff)
                gamma = (sum(jax.tree.leaves(dots))
                         / jnp.maximum(sum(jax.tree.leaves(nrm2)), 1e-30))
                res_inf = jnp.maximum(jnp.maximum(rs, re), ri)
                plain = (k == 0) | (res_inf
                                    > opts.anderson_activation_threshold)
                and_new = jax.tree.map(
                    lambda a_s, p_s, n_s: jnp.where(
                        plain, alpha * n_s,
                        -gamma * a_s + gamma * alpha * p_s
                        + (alpha - gamma * alpha) * n_s),
                    and_step, prev_step, step)
                aa = (step, and_new)
                it_new = jax.tree.map(lambda v, d: v + d, it, and_new)
            else:
                it_new = NlpIterate(
                    x=it.x + alpha * step.x,
                    u=it.u + alpha * step.u,
                    pi=it.pi + beta * step.pi,
                    lam_l=it.lam_l + beta * step.lam_l,
                    lam_u=it.lam_u + beta * step.lam_u,
                    sl=it.sl + beta * step.sl,
                    su=it.su + beta * step.su,
                )
            nan = jnp.logical_not(jnp.isfinite(
                jnp.sum(it_new.x) + jnp.sum(it_new.u)))
            it_new = jax.tree.map(lambda n, o: jnp.where(nan | converged,
                                                         o, n), it_new, it)
            if opts.store_iterates:
                x_h, u_h = hist
                hist = (x_h.at[k + 1].set(it_new.x),
                        u_h.at[k + 1].set(it_new.u))

            small_step = step_norm < opts.tol_min_step_norm
            new_status = jnp.where(
                converged, 0,
                jnp.where(unbounded, 6,  # ACADOS_UNBOUNDED
                          jnp.where(nan | qp_fatal,
                                    jnp.where(qp_fatal, 4, 1),
                                    jnp.where(small_step, 3, status))))
            done = converged | unbounded | nan | qp_fatal | small_step
            if collect_pt:
                t_e = _pclock(it_new.x[0, 0])
                ptimes = ptimes + jnp.stack([t_b - t_a, t_c - t_b,
                                             t_d - t_c, t_e - t_d])
            # k advances only when we actually stepped
            k_new = jnp.where(converged, k, k + 1)
            if adaptive_lm:
                # reference adaptive LM: shrink on stationarity-residual
                # decrease, grow otherwise (acados_ocp_options.py:136-140)
                lam_f = jnp.asarray(
                    opts.adaptive_levenberg_marquardt_lam, dtype)
                mu_min = jnp.asarray(
                    opts.adaptive_levenberg_marquardt_mu_min, dtype)
                lm_next = jnp.where(
                    k == 0, lm_k,
                    jnp.where(rs < _res_prev[0],
                              jnp.maximum(mu_min, lm_k / lam_f),
                              lm_k * lam_f))
                res_state = (rs, re, ri, rc, lm_next)
            else:
                res_state = (rs, re, ri, rc)
            return (it_new, k_new, new_status, done, qp_tot, stat, aa,
                    hist, gstate, res_state, tstate, ptimes)

        status0 = jnp.asarray(2, jnp.int32)  # MAXITER unless terminated
        zero_step = jax.tree.map(jnp.zeros_like, init)
        aa0 = (zero_step, zero_step) if use_aa else ()
        if opts.store_iterates:
            hist0 = (
                jnp.zeros((opts.max_iter + 1,) + init.x.shape,
                          dtype).at[0].set(init.x),
                jnp.zeros((opts.max_iter + 1,) + init.u.shape,
                          dtype).at[0].set(init.u))
        else:
            hist0 = ()
        if opts.globalization == "FUNNEL_L1PEN_LINESEARCH":
            inf0 = _l1_infeasibility(form, data, soft_scaled, init.x,
                                     init.u, init.sl, init.su, lb_m, ub_m)
            fw0 = jnp.maximum(
                jnp.asarray(opts.funnel_initialization_upper_bound,
                            dtype),
                opts.funnel_initialization_increase_factor * inf0)
            gstate0 = (fw0,
                       jnp.asarray(opts.funnel_initial_penalty_parameter,
                                   dtype), jnp.asarray(False))
        else:
            gstate0 = ()
        timeout_on = opts.timeout_max_time > 0.0
        tdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        def _clock():
            from jax.experimental import io_callback
            return io_callback(_wall_clock,
                               jax.ShapeDtypeStruct((), tdtype),
                               ordered=True)

        if timeout_on:
            def body(carry):
                (it, k, status, done_, qp_tot, stat, aa, hist, gstate,
                 res_prev, (t_start, t_prev, pred), ptimes) = carry
                t_now = _clock()
                iter_time = t_now - t_prev
                h = opts.timeout_heuristic
                if h == "ZERO":
                    pred_new = jnp.zeros((), tdtype)
                elif h == "LAST":
                    pred_new = iter_time
                elif h == "MAX":
                    pred_new = jnp.maximum(pred, iter_time)
                elif h == "AVERAGE":
                    # reference: exponentially weighted average
                    pred_new = jnp.where(k > 0,
                                         0.5 * (pred + iter_time),
                                         iter_time)
                else:
                    raise ValueError(
                        f"timeout_heuristic {opts.timeout_heuristic!r}")
                pred_new = jnp.where(k > 0, pred_new,
                                     jnp.zeros((), tdtype))
                hit = ((k > 0) & ((t_now - t_start) + pred_new
                                  > opts.timeout_max_time))
                carry2 = (it, k, status, done_, qp_tot, stat, aa, hist,
                          gstate, res_prev, (t_start, t_now, pred_new),
                          ptimes)

                def mark_timeout(c):
                    (it_, k_, _st, _dn, qt, st_, aa_, h_, gs_, rp_,
                     ts_, pt_) = c
                    return (it_, k_, jnp.asarray(7, jnp.int32),
                            jnp.asarray(True), qt, st_, aa_, h_, gs_,
                            rp_, ts_, pt_)

                return jax.lax.cond(hit, mark_timeout, _iteration,
                                    carry2)
        else:
            body = _iteration

        # residual-state carry: (rs, re, ri, rc) + the adaptive-LM value
        zero4 = tuple(jnp.zeros((), dtype) for _ in range(4))
        if opts.with_adaptive_levenberg_marquardt:
            zero4 = zero4 + (jnp.asarray(
                opts.adaptive_levenberg_marquardt_mu0, dtype),)
        if timeout_on:
            t0_ = _clock()
            tstate0 = (t0_, t0_, jnp.zeros((), tdtype))
        else:
            tstate0 = ()
        ptimes0 = jnp.zeros((4,), tdt)
        carry0 = (init, jnp.asarray(0, jnp.int32), status0,
                  jnp.asarray(False), jnp.asarray(0, jnp.int32), stat0,
                  aa0, hist0, gstate0, zero4, tstate0, ptimes0)
        (it, k, status, done, qp_tot, stat, _aa, hist,
         _gs, res_last, _ts, ptimes) = jax.lax.while_loop(cond, body,
                                                          carry0)
        res_last = res_last[:4]

        if opts.rti:
            # RTI semantics (reference ocp_nlp_sqp_rti.c): no
            # re-linearization after the feedback step — the reported
            # residuals are the ones evaluated at the preparation
            # linearization point (one RTI call stale; identical at the
            # warm-started steady state the bench asserts). Saves a full
            # linearize per call.
            rs, re, ri, rc = res_last
        else:
            # final residuals at the returned iterate (reference SQP
            # evaluates residuals at the top of each iteration incl. the
            # exit one, ocp_nlp_sqp.c:556-568)
            qp = linearize(form, static_rows, data, it, lm)
            rs, re, ri, rc = _nlp_residuals(form, qp, it, soft_scaled)
        stat = stat.at[k, 0].set(rs).at[k, 1].set(re).at[k, 2].set(ri) \
                   .at[k, 3].set(rc)
        converged = ((rs < opts.tol_stat) & (re < opts.tol_eq)
                     & (ri < opts.tol_ineq) & (rc < opts.tol_comp))
        status = jnp.where(converged & (status != 7), 0, status)
        if opts.rti:
            # MAXITER / MINSTEP are success for the real-time iteration
            status = jnp.where((status == 2) | (status == 3), 0, status)
        cost = eval_cost(form, data, it.x, it.u, it.sl, it.su, soft_scaled)
        stats = SqpStats(status=status, sqp_iter=k, qp_iter_total=qp_tot,
                         res_stat=rs, res_eq=re, res_ineq=ri, res_comp=rc,
                         stat=stat, cost=cost,
                         iterates_x=hist[0] if opts.store_iterates
                         else None,
                         iterates_u=hist[1] if opts.store_iterates
                         else None,
                         phase_times=ptimes if collect_pt else None)
        return it, stats

    return jax.jit(solve)


def init_iterate(form: OcpNlpFormulation, dtype=jnp.float32,
                 x_traj=None, u_traj=None) -> NlpIterate:
    """Zero (or trajectory-warm-started) NLP iterate."""
    N, nx, nu, nc = form.N, form.nx, form.nu, form.nc
    x = jnp.zeros((N + 1, nx), dtype) if x_traj is None \
        else jnp.asarray(x_traj, dtype)
    u = jnp.zeros((N, nu), dtype) if u_traj is None \
        else jnp.asarray(u_traj, dtype)
    z = lambda *s: jnp.zeros(s, dtype)
    return NlpIterate(x=x, u=u, pi=z(N, nx), lam_l=z(N + 1, nc),
                      lam_u=z(N + 1, nc), sl=z(N + 1, nc), su=z(N + 1, nc))
