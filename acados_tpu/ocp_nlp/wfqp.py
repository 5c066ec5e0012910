"""SQP with feasible QPs (Byrd-Omojokun style).

TPU-native counterpart of the reference solver
(/root/reference/acados/ocp_nlp/ocp_nlp_sqp_with_feasible_qp.c): per SQP
iteration the search direction is computed from two QPs —
  1. the *feasibility QP* (the reference's relaxed QP, :1240-1280): same
     constraints/dynamics, every constraint not slacked by the user gets an
     L1 slack (exceptions exactly as the reference: stage-0 state bounds
     and all control bounds, :1253-1257), objective = slack gradient only
     with a small-identity Hessian (feasibility_qp_hessian_scalar, :123);
  2. the *nominal QP* with bounds relaxed by the feasibility QP's optimal
     slacks times byrd_omojokon_slack_relaxation_factor
     (setup_byrd_omojokun_bounds, :1186-1160) — guaranteed feasible.

The reference starts in NOMINAL_QP mode and switches to BYRD_OMOJOKUN when
the nominal QP fails (:680,1078-1083). Detecting QP infeasibility inside a
jitted batched IPM is unreliable (no certificate), so this solver computes
the Byrd-Omojokun direction every iteration — deterministic control flow,
two Riccati-IPM solves per iteration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from acados_tpu.ocp_nlp.formulation import NlpData, OcpNlpFormulation
from acados_tpu.ocp_nlp.linearize import (NlpIterate, build_static_rows,
                                          eval_cost, linearize)
from acados_tpu.ocp_nlp.regularize import regularize_qp
from acados_tpu.ocp_nlp.sqp import (STAT_COLS, SqpOpts, SqpStats, _merit,
                                    _nlp_residuals)
from acados_tpu.ocp_qp.data import OcpQp
from acados_tpu.ocp_qp.ipm import solve_ocp_qp


def _slackable_rows(form: OcpNlpFormulation, dtype):
    """Rows that get an L1 slack in the feasibility QP (the reference's
    idxns sets, ocp_nlp_sqp_with_feasible_qp.c:600-667): everything except
    stage-0 state bounds, control bounds, and rows the user already
    softened."""
    nc, N = form.nc, form.N

    def cls_mask(spec, is_stage0):
        m = np.zeros(nc)
        if not is_stage0:
            m[:spec.nbx] = 1.0
        o = spec.nbx + spec.nbu
        m[o:o + spec.ng + spec.nh + spec.nphi] = 1.0
        for r in spec.soft_rows:
            m[r] = 0.0
        return m

    m0 = cls_mask(form.con_0, True)
    mp = cls_mask(form.con, False)
    me = cls_mask(form.con_e, False)
    return jnp.asarray(np.concatenate([m0[None], np.tile(mp, (N - 1, 1)),
                                       me[None]]), dtype)


def make_wfqp_solver(form: OcpNlpFormulation, opts: SqpOpts,
                     relaxation_factor: float = 1.00001,
                     feasibility_hessian_scalar: float = 1e-4):
    """Build the jitted SQP-WFQP solve function.

    solve(data: NlpData, init: NlpIterate) -> (NlpIterate, SqpStats).
    """

    def solve(data: NlpData, init: NlpIterate):
        with jax.default_matmul_precision(opts.matmul_precision):
            return _solve(data, init)

    def _feasibility_qp(qp: OcpQp, soft_new, dtype) -> OcpQp:
        nx, nu = form.nx, form.nu
        eps = jnp.asarray(feasibility_hessian_scalar, dtype)
        N1 = qp.Q.shape[0]
        return qp.replace(
            Q=jnp.tile(eps * jnp.eye(nx, dtype=dtype)[None], (N1, 1, 1)),
            R=jnp.tile(eps * jnp.eye(nu, dtype=dtype)[None],
                       (N1 - 1, 1, 1)),
            S=jnp.zeros_like(qp.S), q=jnp.zeros_like(qp.q),
            r=jnp.zeros_like(qp.r),
            soft_mask=jnp.maximum(qp.soft_mask, soft_new),
            zl=jnp.where(soft_new > 0, 1.0, qp.zl),
            zu=jnp.where(soft_new > 0, 1.0, qp.zu),
            Zl=jnp.where(soft_new > 0, 0.0, qp.Zl),
            Zu=jnp.where(soft_new > 0, 0.0, qp.Zu))

    def _byrd_omojokun_step(qp: OcpQp, soft_new, dtype):
        """Feasibility QP -> relaxed nominal QP -> direction."""
        qp_feas = _feasibility_qp(qp, soft_new, dtype)
        sol_f, info_f = solve_ocp_qp(qp_feas, opts.qp_opts)
        fac = jnp.asarray(relaxation_factor, dtype)
        lg_adj = qp.lg - fac * soft_new * qp.mask_l * sol_f.sl
        ug_adj = qp.ug + fac * soft_new * qp.mask_u * sol_f.su
        qp_adj = qp.replace(lg=lg_adj, ug=ug_adj)
        sol, info = solve_ocp_qp(qp_adj, opts.qp_opts)
        return sol, info, info_f

    def _solve(data: NlpData, init: NlpIterate):
        dtype = init.x.dtype
        static_rows = build_static_rows(form, dtype)
        soft_scaled = static_rows["soft"] * static_rows["mask"]
        soft_new = _slackable_rows(form, dtype) * static_rows["mask"]
        lm = jnp.asarray(opts.levenberg_marquardt, dtype)
        lb_all = jnp.concatenate([data.lb_0[None], data.lb,
                                  data.lb_e[None]])
        ub_all = jnp.concatenate([data.ub_0[None], data.ub,
                                  data.ub_e[None]])
        big = jnp.asarray(1e20, dtype)
        inf_thr = 0.5 * 1e10
        lb_m = jnp.where((static_rows["mask"] > 0) & (lb_all > -inf_thr),
                         lb_all, -big)
        ub_m = jnp.where((static_rows["mask"] > 0) & (ub_all < inf_thr),
                         ub_all, big)

        nstat = len(STAT_COLS)
        stat0 = jnp.zeros((opts.max_iter + 1, nstat), dtype)

        def cond(carry):
            it, k, status, done, qp_tot, stat = carry
            return jnp.logical_and(k < opts.max_iter,
                                   jnp.logical_not(done))

        def body(carry):
            it, k, status, _, qp_tot, stat = carry
            qp = linearize(form, static_rows, data, it, lm)
            rs, re, ri, rc = _nlp_residuals(form, qp, it, soft_scaled)
            stat = stat.at[k, 0].set(rs).at[k, 1].set(re) \
                       .at[k, 2].set(ri).at[k, 3].set(rc)
            converged = ((rs < opts.tol_stat) & (re < opts.tol_eq)
                         & (ri < opts.tol_ineq) & (rc < opts.tol_comp))

            qp_solve = regularize_qp(qp, opts.regularize_method,
                                     opts.reg_epsilon)
            sol, info, info_f = _byrd_omojokun_step(qp_solve, soft_new,
                                                    dtype)
            qp_fatal = (info.status == 1) | (info_f.status == 1)
            qp_tot = qp_tot + info.num_iter + info_f.num_iter
            stat = stat.at[k, 4].set(info.status.astype(dtype)) \
                       .at[k, 5].set((info.num_iter
                                      + info_f.num_iter).astype(dtype))

            if opts.globalization == "FIXED_STEP":
                alpha = jnp.asarray(1.0, dtype)
            else:
                w_pi = jnp.maximum(jnp.abs(it.pi), jnp.abs(sol.pi)) + 1e-4
                w_lam = (jnp.maximum(jnp.maximum(it.lam_l, sol.lam_lg),
                                     jnp.maximum(it.lam_u, sol.lam_ug))
                         + 1e-4) * static_rows["mask"]
                merit0 = _merit(form, data, soft_scaled, it.x, it.u,
                                it.sl, it.su, w_pi, w_lam, lb_m, ub_m)

                def ls_cond(ls):
                    alpha, accepted = ls
                    return jnp.logical_and(jnp.logical_not(accepted),
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
                    return (jnp.where(ok, alpha,
                                      alpha * opts.alpha_reduction), ok)

                alpha, _ = jax.lax.while_loop(
                    ls_cond, ls_body, (jnp.asarray(1.0, dtype),
                                       jnp.asarray(False)))

            step_norm = alpha * jnp.maximum(jnp.max(jnp.abs(sol.x)),
                                            jnp.max(jnp.abs(sol.u)))
            stat = stat.at[k, 6].set(alpha).at[k, 7].set(step_norm)

            it_new = NlpIterate(
                x=it.x + alpha * sol.x,
                u=it.u + alpha * sol.u,
                pi=(1 - alpha) * it.pi + alpha * sol.pi,
                lam_l=(1 - alpha) * it.lam_l + alpha * sol.lam_lg,
                lam_u=(1 - alpha) * it.lam_u + alpha * sol.lam_ug,
                sl=it.sl + alpha * (sol.sl - it.sl),
                su=it.su + alpha * (sol.su - it.su),
            )
            nan = jnp.logical_not(jnp.isfinite(
                jnp.sum(it_new.x) + jnp.sum(it_new.u)))
            it_new = jax.tree.map(lambda n, o: jnp.where(nan | converged,
                                                         o, n), it_new, it)
            small_step = step_norm < opts.tol_min_step_norm
            new_status = jnp.where(
                converged, 0,
                jnp.where(nan | qp_fatal, jnp.where(qp_fatal, 4, 1),
                          jnp.where(small_step, 3, status)))
            done = converged | nan | qp_fatal | small_step
            k_new = jnp.where(converged, k, k + 1)
            return (it_new, k_new, new_status, done, qp_tot, stat)

        status0 = jnp.asarray(2, jnp.int32)
        carry0 = (init, jnp.asarray(0, jnp.int32), status0,
                  jnp.asarray(False), jnp.asarray(0, jnp.int32), stat0)
        it, k, status, done, qp_tot, stat = jax.lax.while_loop(
            cond, body, carry0)

        qp = linearize(form, static_rows, data, it, lm)
        rs, re, ri, rc = _nlp_residuals(form, qp, it, soft_scaled)
        stat = stat.at[k, 0].set(rs).at[k, 1].set(re).at[k, 2].set(ri) \
                   .at[k, 3].set(rc)
        converged = ((rs < opts.tol_stat) & (re < opts.tol_eq)
                     & (ri < opts.tol_ineq) & (rc < opts.tol_comp))
        status = jnp.where(converged, 0, status)
        cost = eval_cost(form, data, it.x, it.u, it.sl, it.su, soft_scaled)
        stats = SqpStats(status=status, sqp_iter=k, qp_iter_total=qp_tot,
                         res_stat=rs, res_eq=re, res_ineq=ri, res_comp=rc,
                         stat=stat, cost=cost)
        return it, stats

    return jax.jit(solve)
