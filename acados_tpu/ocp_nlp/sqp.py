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
from acados_tpu.utils.struct import pytree_dataclass, static_field

# stats matrix columns (reference ocp_nlp_sqp.c:579-585)
STAT_COLS = ("res_stat", "res_eq", "res_ineq", "res_comp", "qp_status",
             "qp_iter", "alpha", "step_norm")


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
    levenberg_marquardt: float = 0.0
    regularize_method: str = static_field(default="NO_REGULARIZE")
    reg_epsilon: float = 1e-4  # reference default (acados_ocp_options.py)
    globalization: str = static_field(default="FIXED_STEP")
    alpha_min: float = 0.05
    alpha_reduction: float = 0.7
    full_step_dual: bool = static_field(default=False)
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


def _nlp_residuals(form, qp: OcpQp, it: NlpIterate, soft_scaled):
    """NLP KKT residual inf-norms at the current iterate, using the fresh
    linearization (the NLP KKT residual equals the QP KKT residual at zero
    step with current multipliers). Reference: ocp_nlp_res_compute
    (ocp_nlp_common.c:3680)."""
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    Zl, Zu, zl, zu = qp.Zl, qp.Zu, qp.zl, qp.zu  # already cost-scaled
    lam_d = ml * it.lam_l - mu_ * it.lam_u

    rx = qp.q - jnp.einsum("kij,ki->kj", qp.C, lam_d)
    rx = rx.at[:-1].add(jnp.einsum("kij,ki->kj", qp.A, it.pi))
    rx = rx.at[1:].add(-it.pi)
    ru = (qp.r + jnp.einsum("kij,ki->kj", qp.B, it.pi)
          - jnp.einsum("kij,ki->kj", qp.D, lam_d[:-1]))

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


def make_sqp_solver(form: OcpNlpFormulation, opts: SqpOpts):
    """Build the jitted SQP solve function.

    Returns solve(data: NlpData, init: NlpIterate) -> (NlpIterate, SqpStats).
    vmap it over a leading batch axis for batched solves; shard the batch
    axis over a device mesh for multi-chip.
    """

    def solve(data: NlpData, init: NlpIterate):
        with jax.default_matmul_precision(opts.matmul_precision):
            return _solve(data, init)

    def solve_qp(qp, warm=None):
        """QP backend dispatch: scaling front-end -> condensing front-end
        -> Riccati IPM."""
        scales = None
        if opts.qpscaling != "NO_SCALING":
            from acados_tpu.ocp_qp.qpscaling import scale_qp, unscale_sol
            qp, scales = scale_qp(qp)
            warm = None  # warm point is in unscaled units
        if opts.full_cond:
            sol, info = solve_ocp_qp_xcond(qp, opts.qp_opts,
                                           full_cond=True)
        elif opts.cond_N is not None:
            sol, info = solve_ocp_qp_xcond(qp, opts.qp_opts,
                                           cond_N=opts.cond_N, warm=warm)
        else:
            sol, info = solve_ocp_qp(qp, opts.qp_opts, warm=warm)
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

        def body(carry):
            it, k, status, _, qp_tot, stat, aa, hist = carry
            qp = linearize(form, static_rows, data, it, lm)
            rs, re, ri, rc = _nlp_residuals(form, qp, it, soft_scaled)
            stat = stat.at[k, 0].set(rs).at[k, 1].set(re) \
                       .at[k, 2].set(ri).at[k, 3].set(rc)

            converged = ((rs < opts.tol_stat) & (re < opts.tol_eq)
                         & (ri < opts.tol_ineq) & (rc < opts.tol_comp))

            # Hessian regularization before the QP (reference hook:
            # regularize->regularize, ocp_nlp_sqp.c:602); the NLP residuals
            # above use only gradients, so they see the true problem.
            qp_solve = regularize_qp(qp, opts.regularize_method,
                                     opts.reg_epsilon)
            sol, info = solve_qp(qp_solve)
            qp_ok = info.status <= 0
            # QP hit its iteration limit but may still be usable; only a
            # NaN QP is fatal (reference: QP failure propagation,
            # ocp_nlp_sqp.c:720-752).
            qp_fatal = info.status == 1
            qp_tot = qp_tot + info.num_iter
            stat = stat.at[k, 4].set(info.status.astype(dtype)) \
                       .at[k, 5].set(info.num_iter.astype(dtype))

            if opts.globalization == "FIXED_STEP":
                alpha = jnp.asarray(opts.step_length, dtype)
            else:
                w_pi = jnp.maximum(jnp.abs(it.pi), jnp.abs(sol.pi)) + 1e-4
                w_lam = (jnp.maximum(jnp.maximum(it.lam_l, sol.lam_lg),
                                     jnp.maximum(it.lam_u, sol.lam_ug))
                         + 1e-4) * static_rows["mask"]
                merit0 = _merit(form, data, soft_scaled, it.x, it.u,
                                it.sl, it.su, w_pi, w_lam, lb_m, ub_m)

                def ls_cond(ls):
                    alpha, accepted = ls
                    return jnp.logical_and(
                        jnp.logical_not(accepted),
                        alpha > opts.alpha_min)

                def ls_body(ls):
                    alpha, _ = ls
                    xt = it.x + alpha * sol.x
                    ut = it.u + alpha * sol.u
                    slt = it.sl + alpha * (sol.sl - it.sl)
                    sut = it.su + alpha * (sol.su - it.su)
                    mt = _merit(form, data, soft_scaled, xt, ut, slt, sut,
                                w_pi, w_lam, lb_m, ub_m)
                    ok = mt < merit0
                    alpha_next = jnp.where(ok, alpha,
                                           alpha * opts.alpha_reduction)
                    return (alpha_next, ok)

                alpha, _ = jax.lax.while_loop(
                    ls_cond, ls_body, (jnp.asarray(1.0, dtype),
                                       jnp.asarray(False)))

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
                jnp.where(nan | qp_fatal, jnp.where(qp_fatal, 4, 1),
                          jnp.where(small_step, 3, status)))
            done = converged | nan | qp_fatal | small_step
            # k advances only when we actually stepped
            k_new = jnp.where(converged, k, k + 1)
            return (it_new, k_new, new_status, done, qp_tot, stat, aa,
                    hist)

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
        carry0 = (init, jnp.asarray(0, jnp.int32), status0,
                  jnp.asarray(False), jnp.asarray(0, jnp.int32), stat0,
                  aa0, hist0)
        it, k, status, done, qp_tot, stat, _aa, hist = jax.lax.while_loop(
            cond, body, carry0)

        # final residuals at the returned iterate
        qp = linearize(form, static_rows, data, it, lm)
        rs, re, ri, rc = _nlp_residuals(form, qp, it, soft_scaled)
        stat = stat.at[k, 0].set(rs).at[k, 1].set(re).at[k, 2].set(ri) \
                   .at[k, 3].set(rc)
        converged = ((rs < opts.tol_stat) & (re < opts.tol_eq)
                     & (ri < opts.tol_ineq) & (rc < opts.tol_comp))
        status = jnp.where(converged, 0, status)
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
                         else None)
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
