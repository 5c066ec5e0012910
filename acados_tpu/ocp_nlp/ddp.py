"""DDP: differential dynamic programming for unconstrained OCPs.

TPU-native counterpart of the reference DDP solver
(/root/reference/acados/ocp_nlp/ocp_nlp_ddp.c:548): per iteration,
linearize cost + dynamics at the current trajectory, backward Riccati for
the affine policy du = K dx + alpha*k, then a *nonlinear* forward rollout
u_i = u_bar_i + alpha k_i + K_i (x_i - x_bar_i), x_{i+1} = f(x_i, u_i)
(ocp_nlp_ddp_compute_trial_iterate, ocp_nlp_ddp.c:334-414) with merit
backtracking on the cost. Dynamics stay feasible after the first rollout,
so the merit is the objective itself. An infeasible initial guess is
handled like the reference (:788-795): the first rollout is accepted with
alpha = 1 to produce a feasible trajectory.

The reference restricts DDP to OCPs whose only constraint is the initial
state (penalty reformulation for the rest, mpc_utils/penalty_utils);
`make_ddp_solver` enforces the same.

Differences from SQP here: no IPM — the unconstrained QP *is* one Riccati
factor/solve; multipliers come from the costate identity
pi_k = P_{k+1} dx_{k+1} + p_{k+1}.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.ocp_nlp.formulation import NlpData, OcpNlpFormulation
from acados_tpu.ocp_nlp.linearize import (NlpIterate, build_static_rows,
                                          eval_cost, linearize)
from acados_tpu.ocp_nlp.regularize import regularize_qp
from acados_tpu.ocp_nlp.sqp import STAT_COLS, SqpOpts, SqpStats, \
    _nlp_residuals
from acados_tpu.ocp_qp.riccati import riccati_backward, riccati_factor
from acados_tpu.utils.struct import pytree_dataclass  # noqa: F401


def make_ddp_solver(form: OcpNlpFormulation, opts: SqpOpts):
    """Build the jitted DDP solve function.

    solve(data: NlpData, init: NlpIterate) -> (NlpIterate, SqpStats).
    init.u seeds the first forward rollout (ocp_nlp_ddp_precompute's
    forward-simulation initialization, ocp_nlp_ddp.c:865).
    """
    if form.con.nrows > 0 or form.con_e.nrows > 0:
        raise ValueError(
            "DDP supports unconstrained OCPs only (initial-state constraint"
            " aside); reformulate constraints via penalties "
            "(reference: ocp_nlp_ddp + penalty_utils)")
    if form.con_0.nbx != form.nx or (form.con_0.nbu or form.con_0.ng
                                     or form.con_0.nh):
        raise ValueError("DDP needs exactly a full initial-state constraint"
                         " at stage 0 (lbx_0 == ubx_0)")
    idxbx0 = tuple(form.con_0.idxbx)

    def solve(data: NlpData, init: NlpIterate):
        with jax.default_matmul_precision(opts.matmul_precision):
            return _solve(data, init)

    def _rollout(data, x0, u_bar, x_bar, K, kff, alpha):
        """Nonlinear forward sweep under the affine policy."""
        def step(xk, inp):
            u_b, x_b, K_k, k_k, pk, tk, dtk = inp
            uk = u_b + alpha * k_k + K_k @ (xk - x_b)
            xn = form.step_fn(xk, uk, pk, tk, dtk)
            return xn, (uk, xn)

        _, (u, x_rest) = jax.lax.scan(
            step, x0, (u_bar, x_bar[:-1], K, kff, data.p[:-1],
                       data.ts[:-1], data.dts))
        x = jnp.concatenate([x0[None], x_rest])
        return x, u

    def _solve(data: NlpData, init: NlpIterate):
        dtype = init.x.dtype
        static_rows = build_static_rows(form, dtype)
        soft_scaled = static_rows["soft"] * static_rows["mask"]
        lm = jnp.asarray(opts.levenberg_marquardt, dtype)
        # target initial state from the stage-0 bound rows
        x0_tgt = jnp.zeros((form.nx,), dtype) \
            .at[jnp.asarray(idxbx0)].set(
                0.5 * (data.lb_0[:form.nx] + data.ub_0[:form.nx]))

        # feasible initialization: forward-simulate init.u from the target
        # x0 (reference ocp_nlp_ddp_precompute forward-sim init,
        # ocp_nlp_ddp.c:865) — makes the first iterate dynamically
        # feasible and satisfies the initial-state constraint exactly.
        def roll0(xk, inp):
            uk, pk, tk, dtk = inp
            xn = form.step_fn(xk, uk, pk, tk, dtk)
            return xn, xn

        _, x_rest0 = jax.lax.scan(
            roll0, x0_tgt, (init.u, data.p[:-1], data.ts[:-1], data.dts))
        x_init = jnp.concatenate([x0_tgt[None], x_rest0])
        x_init = jnp.where(jnp.isfinite(x_init).all(), x_init, init.x)
        init = init.replace(x=x_init)

        nstat = len(STAT_COLS)
        stat0 = jnp.zeros((opts.max_iter + 1, nstat), dtype)

        def cond(carry):
            it, k, status, done, qp_tot, stat, first = carry
            return jnp.logical_and(k < opts.max_iter,
                                   jnp.logical_not(done))

        def body(carry):
            it, k, status, _, qp_tot, stat, first = carry
            qp = linearize(form, static_rows, data, it, lm)
            rs, re, ri, rc = _nlp_residuals(form, qp, it, soft_scaled)
            stat = stat.at[k, 0].set(rs).at[k, 1].set(re) \
                       .at[k, 2].set(ri).at[k, 3].set(rc)
            # ri covers the initial-state constraint (the only inequality
            # rows DDP admits are the stage-0 state bounds)
            converged = ((rs < opts.tol_stat) & (re < opts.tol_eq)
                         & (ri < opts.tol_ineq))

            qp = regularize_qp(qp, opts.regularize_method, opts.reg_epsilon)
            fact = riccati_factor(qp.Q, qp.R, qp.S, qp.A, qp.B,
                                  reg_eps=opts.qp_opts.reg_eps)
            kff, p = riccati_backward(fact, qp.A, qp.B, qp.q, qp.r, qp.b)

            cost0 = eval_cost(form, data, it.x, it.u, it.sl, it.su,
                              soft_scaled)

            def try_alpha(alpha):
                x_t, u_t = _rollout(data, it.x[0]
                                    + alpha * (x0_tgt - it.x[0]),
                                    it.u, it.x, fact.K, kff, alpha)
                c_t = eval_cost(form, data, x_t, u_t, it.sl, it.su,
                                soft_scaled)
                return x_t, u_t, c_t

            if opts.globalization == "FIXED_STEP":
                alpha = jnp.asarray(1.0, dtype)
                x_new, u_new, cost_t = try_alpha(alpha)
            else:
                def ls_cond(ls):
                    alpha, accepted = ls
                    return jnp.logical_not(accepted) \
                        & (alpha > opts.alpha_min)

                def ls_body(ls):
                    alpha, _ = ls
                    _, _, c_t = try_alpha(alpha)
                    ok = c_t < cost0
                    return (jnp.where(ok, alpha,
                                      alpha * opts.alpha_reduction), ok)

                alpha, _ = jax.lax.while_loop(
                    ls_cond, ls_body,
                    (jnp.asarray(1.0, dtype), jnp.asarray(False)))
                # reference: an infeasible initial guess forces a full
                # accepted rollout to gain feasibility (ocp_nlp_ddp.c:788)
                infeas = (re > opts.tol_eq) | (ri > opts.tol_ineq)
                alpha = jnp.where(first & infeas, 1.0, alpha)
                x_new, u_new, cost_t = try_alpha(alpha)

            # multipliers from the costate identity at the linear step
            dx_new = x_new - it.x
            pi_new = jnp.einsum("kij,kj->ki", fact.P[1:], dx_new[1:]) \
                + p[1:]
            # initial-state equality multiplier = value-function gradient
            # dV/dx0 = P_0 dx_0 + p_0 (stationarity at the fixed x_0; the
            # reference gets this from HPIPM's bound multipliers)
            lam0 = (fact.P[0] @ dx_new[0] + p[0])[jnp.asarray(idxbx0)]
            lam_l_new = it.lam_l.at[0, :form.nx].set(jnp.maximum(lam0, 0.0))
            lam_u_new = it.lam_u.at[0, :form.nx].set(jnp.maximum(-lam0,
                                                                 0.0))

            step_norm = jnp.maximum(jnp.max(jnp.abs(dx_new)),
                                    jnp.max(jnp.abs(u_new - it.u)))
            stat = stat.at[k, 4].set(0.0).at[k, 5].set(1.0) \
                       .at[k, 6].set(alpha).at[k, 7].set(step_norm)

            it_new = NlpIterate(x=x_new, u=u_new, pi=pi_new,
                                lam_l=lam_l_new, lam_u=lam_u_new,
                                sl=it.sl, su=it.su)
            nan = jnp.logical_not(jnp.isfinite(
                jnp.sum(it_new.x) + jnp.sum(it_new.u)))
            it_new = jax.tree.map(lambda n, o: jnp.where(nan | converged,
                                                         o, n), it_new, it)
            small_step = step_norm < opts.tol_min_step_norm
            new_status = jnp.where(
                converged, 0,
                jnp.where(nan, 1, jnp.where(small_step, 3, status)))
            done = converged | nan | small_step
            k_new = jnp.where(converged, k, k + 1)
            return (it_new, k_new, new_status, done, qp_tot + 1, stat,
                    jnp.asarray(False))

        status0 = jnp.asarray(2, jnp.int32)
        carry0 = (init, jnp.asarray(0, jnp.int32), status0,
                  jnp.asarray(False), jnp.asarray(0, jnp.int32), stat0,
                  jnp.asarray(True))
        it, k, status, done, qp_tot, stat, _ = jax.lax.while_loop(
            cond, body, carry0)

        qp = linearize(form, static_rows, data, it, lm)
        rs, re, ri, rc = _nlp_residuals(form, qp, it, soft_scaled)
        stat = stat.at[k, 0].set(rs).at[k, 1].set(re).at[k, 2].set(ri) \
                   .at[k, 3].set(rc)
        converged = ((rs < opts.tol_stat) & (re < opts.tol_eq)
                     & (ri < opts.tol_ineq))
        status = jnp.where(converged, 0, status)
        cost = eval_cost(form, data, it.x, it.u, it.sl, it.su, soft_scaled)
        stats = SqpStats(status=status, sqp_iter=k, qp_iter_total=qp_tot,
                         res_stat=rs, res_eq=re, res_ineq=ri, res_comp=rc,
                         stat=stat, cost=cost)
        return it, stats

    return jax.jit(solve)
