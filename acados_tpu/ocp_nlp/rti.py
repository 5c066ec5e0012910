"""SQP-RTI: real-time iteration with preparation / feedback split.

TPU-native counterpart of the reference RTI solver
(/root/reference/acados/ocp_nlp/ocp_nlp_sqp_rti.c): `preparation_step`
(:461) linearizes at the current iterate — everything that does not depend
on the yet-unknown state measurement — and `feedback_step` (:523) injects
the fresh x0 into the stage-0 bound rows, solves the QP and applies the
full Newton step (alpha = 1).

Mapping of the factorization-reuse idea (condense_lhs at preparation,
condense_rhs_and_solve at feedback, ocp_qp_xcond_solver.c:591,623): the
IPM's Riccati factorization is barrier-dependent so it cannot be cached
across the phase boundary; what crosses the boundary here is (a) the full
QP linearization (integrator sweeps + Jacobians + Hessians — the dominant
cost, reference time_lin vs time_qp) and (b) the *predicted* QP solution:
preparation solves the QP at the predicted x0, and feedback warm-starts
its IPM (primal + dual) from that solution, so the feedback solve only has
to correct for the x0 prediction error — the IPM analog of reusing the
condensed factorization.

AS-RTI levels A-D (preparation_advanced_step, ocp_nlp_sqp_rti.c:797-1139)
build on this split: between samples the problem is *advanced* to the
predicted next initial state (as_rti_advance_problem :711-740, SHIFT =
x_1 of the current trajectory, SIMULATE = phi(x_0, u_0)), and inner
iterations of increasing fidelity run at that predicted problem:
  LEVEL_A  one re-solve of the previous preparation's QP at the predicted
           x0 (vectors only, ocp_nlp_sqp_rti.c:842-899), from the
           *backed-up* preparation iterate (tmp_nlp_out, :1127-1131);
  LEVEL_B  as_rti_iter zero-order iterations: constraint/dynamics values
           refreshed, matrices AND gradients frozen with the Hessian
           gradient-correction q += H (w - w_lin)
           (ocp_nlp_zero_order_qp_update, ocp_nlp_common.c:3142);
  LEVEL_C  as_rti_iter adjoint/first-order iterations: values + exact cost
           gradient + stale-Jacobian adjoint correction
           (J_true - J_stale)' pi on the dynamics
           (ocp_nlp_level_c_update, ocp_nlp_common.c:3194);
  LEVEL_D  as_rti_iter full SQP iterations (relinearize everything,
           ocp_nlp_sqp_rti.c:1041-1100).
The functional mapping: `prepare(data, it, prev_cache)` — levels A-C reuse
prev_cache's QP matrices (the reference's persistent nlp_mem->qp_in);
level A restores prev_cache.it (the tmp_nlp_out backup), so after an
A-cycle the next prepare must receive the *feedback* iterate as `it` and
the previous cache as `prev_cache` exactly like the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.ocp_nlp.formulation import NlpData, OcpNlpFormulation
from acados_tpu.ocp_nlp.linearize import (NlpIterate, build_static_rows,
                                          eval_constraints, eval_cost,
                                          eval_dyn_gap, linearize)
from acados_tpu.ocp_nlp.regularize import regularize_qp
from acados_tpu.ocp_nlp.sqp import (SqpOpts, SqpStats, _nlp_residuals,
                                    adaptive_qp_tol, use_x0_elimination)
from acados_tpu.ocp_qp.data import OcpQp, OcpQpSol
from acados_tpu.ocp_qp.ipm import solve_ocp_qp
from acados_tpu.ocp_qp.xcond import solve_ocp_qp_xcond
from acados_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class RtiCache:
    """Preparation-phase output carried into the feedback phase."""

    qp: OcpQp            # full linearization at the preparation iterate
    g0: jnp.ndarray      # stage-0 constraint row values (for x0 injection)
    it: NlpIterate       # the iterate the linearization was taken at
    sol_pred: OcpQpSol   # QP solution at the predicted x0 (warm start)


def make_rti_solver(form: OcpNlpFormulation, opts: SqpOpts):
    """Build (prepare, feedback) jitted functions.

    prepare(data, it, prev_cache=None) -> RtiCache
      prev_cache enables the AS-RTI levels (A-C reuse its QP matrices, the
      reference's persistent nlp_mem->qp_in); pass the previous cycle's
      cache once warm. With level STANDARD or prev_cache=None this is the
      plain preparation step.
    feedback(cache, data, it) -> (NlpIterate, SqpStats)
      data's lb_0/ub_0 carry the fresh x0 (set via constraints_set before
      the feedback call, like the reference's x0 injection).
    """
    nbx0 = form.con_0.nbx
    idxbx0 = jnp.asarray(form.con_0.idxbx, jnp.int32) if nbx0 else None
    _x0f = use_x0_elimination(form, opts)

    def _advance_data(data: NlpData, it: NlpIterate) -> NlpData:
        """Set the stage-0 state bounds to the predicted next x0
        (as_rti_advance_problem, ocp_nlp_sqp_rti.c:711-740)."""
        if opts.as_rti_advancement == "NONE" or nbx0 == 0:
            return data
        if opts.as_rti_advancement == "SHIFT":
            x0p = it.x[1]
        elif opts.as_rti_advancement == "SIMULATE":
            x0p = form.step_fn(it.x[0], it.u[0], data.p[0], data.ts[0],
                               data.dts[0])
        else:
            raise ValueError(opts.as_rti_advancement)
        vals = x0p[idxbx0]
        return data.replace(lb_0=data.lb_0.at[:nbx0].set(vals),
                            ub_0=data.ub_0.at[:nbx0].set(vals))

    def _inject_x0(qp: OcpQp, g0, data: NlpData) -> OcpQp:
        """Replace stage-0 bound rows with data's (delta form)."""
        lg0 = jnp.where(qp.mask_l[0] > 0, data.lb_0 - g0, qp.lg[0])
        ug0 = jnp.where(qp.mask_u[0] > 0, data.ub_0 - g0, qp.ug[0])
        return qp.replace(lg=qp.lg.at[0].set(lg0),
                          ug=qp.ug.at[0].set(ug0))

    def _full_step(base: NlpIterate, sol: OcpQpSol) -> NlpIterate:
        it_new = NlpIterate(
            x=base.x + sol.x, u=base.u + sol.u, pi=sol.pi,
            lam_l=sol.lam_lg, lam_u=sol.lam_ug, sl=sol.sl, su=sol.su)
        nan = jnp.logical_not(jnp.isfinite(
            jnp.sum(it_new.x) + jnp.sum(it_new.u)))
        return jax.tree.map(lambda n, o: jnp.where(nan, o, n), it_new, base)

    def _refresh_vectors(qp0: OcpQp, it_lin: NlpIterate, data: NlpData,
                         it_i: NlpIterate, static_rows, level: str) -> OcpQp:
        """Inexact QP at it_i on qp0's (stale) matrices.

        level B: gradient frozen at the linearization point with the
        Hessian correction q += H (w_i - w_lin)
        (ocp_nlp_zero_order_qp_update, ocp_nlp_common.c:3142-3190).
        level C: exact cost gradient at it_i plus the stale-Jacobian
        dynamics adjoint correction (J_true(it_i) - J_stale)' pi
        (ocp_nlp_level_c_update, ocp_nlp_common.c:3194-3265; like the
        reference, inequality adjoints are left uncorrected).
        """
        b = eval_dyn_gap(form, data, it_i.x, it_i.u)
        g_all = eval_constraints(form, data, it_i.x, it_i.u)
        lb_all = jnp.concatenate([data.lb_0[None], data.lb,
                                  data.lb_e[None]])
        ub_all = jnp.concatenate([data.ub_0[None], data.ub,
                                  data.ub_e[None]])
        lg = jnp.where(qp0.mask_l > 0, lb_all - g_all, -1.0)
        ug = jnp.where(qp0.mask_u > 0, ub_all - g_all, 1.0)

        dx = it_i.x - it_lin.x
        du = it_i.u - it_lin.u
        if level == "B":
            # grad_x += Q dx + S' du (path only), grad_u += S dx + R du
            q = qp0.q + jnp.einsum("kij,kj->ki", qp0.Q, dx)
            q = q.at[:-1].add(jnp.einsum("kij,ki->kj", qp0.S, du))
            r = (qp0.r + jnp.einsum("kij,kj->ki", qp0.S, dx[:-1])
                 + jnp.einsum("kij,kj->ki", qp0.R, du))
        else:  # "C"
            soft_scaled = static_rows["soft"] * static_rows["mask"]
            cost_xu = lambda x_, u_: eval_cost(form, data, x_, u_, it_i.sl,
                                               it_i.su, soft_scaled)
            q, r = jax.grad(cost_xu, argnums=(0, 1))(it_i.x, it_i.u)
            # dynamics adjoint correction for the stale QP Jacobians
            nx = form.nx

            def adj_one(xk, uk, pk, tk, dtk, pik, Ak, Bk):
                phi = lambda x_, u_: form.step_fn(x_, u_, pk, tk, dtk)
                _, vjp = jax.vjp(phi, xk, uk)
                jx_pi, ju_pi = vjp(pik)
                return jx_pi - Ak.T @ pik, ju_pi - Bk.T @ pik

            cq, cr = jax.vmap(adj_one)(it_i.x[:-1], it_i.u, data.p[:-1],
                                       data.ts[:-1], data.dts, it_i.pi,
                                       qp0.A, qp0.B)
            q = q.at[:-1].add(cq)
            r = r + cr
        return qp0.replace(b=b, lg=lg, ug=ug, q=q, r=r)

    def _qp_opts_at(qp: OcpQp, it: NlpIterate, static_rows):
        """Per-call QP tolerances (nlp_qp_tol_strategy; sqp.adaptive_qp_tol)."""
        if opts.nlp_qp_tol_strategy != "ADAPTIVE_CURRENT_RES_JOINT":
            return opts.qp_opts
        soft_scaled = static_rows["soft"] * static_rows["mask"]
        rs, re, ri, rc = _nlp_residuals(form, qp, it, soft_scaled)
        return adaptive_qp_tol(opts, opts.qp_opts, rs, re, ri, rc)

    def _standard_prepare(data: NlpData, it: NlpIterate,
                          static_rows) -> RtiCache:
        dtype = it.x.dtype
        lm = jnp.asarray(opts.levenberg_marquardt, dtype)
        qp = linearize(form, static_rows, data, it, lm)
        qp = regularize_qp(qp, opts.regularize_method, opts.reg_epsilon)
        # recover absolute stage-0 row values g0 from the delta form:
        # lg = lb - g  ->  g = lb - lg on enabled rows (fall back to
        # ub - ug for upper-only rows)
        g0 = jnp.where(qp.mask_l[0] > 0, data.lb_0 - qp.lg[0],
                       jnp.where(qp.mask_u[0] > 0, data.ub_0 - qp.ug[0],
                                 0.0))
        # solve the QP at the predicted x0 (the bounds in `data` at
        # preparation time): its solution warm-starts the feedback IPM
        # (the analog of condense_lhs's cached factorization).
        sol_pred, _ = solve_ocp_qp(qp, _qp_opts_at(qp, it, static_rows),
                                   x0_fixed=_x0f)
        return RtiCache(qp=qp, g0=g0, it=it, sol_pred=sol_pred)

    def prepare(data: NlpData, it: NlpIterate,
                prev_cache: RtiCache | None = None) -> RtiCache:
        with jax.default_matmul_precision(opts.matmul_precision):
            static_rows = build_static_rows(form, it.x.dtype)
            level = opts.as_rti_level
            if level != "STANDARD" and prev_cache is not None:
                data = _advance_data(data, it)
                if level == "A":
                    # restore the preparation backup (tmp_nlp_out) and
                    # re-solve the previous QP at the predicted x0
                    it = prev_cache.it
                    qp_a = _inject_x0(prev_cache.qp, prev_cache.g0, data)
                    sol, _ = solve_ocp_qp(qp_a, opts.qp_opts,
                                          warm=prev_cache.sol_pred,
                                          x0_fixed=_x0f)
                    it = _full_step(it, sol)
                elif level in ("B", "C"):
                    for _ in range(opts.as_rti_iter):
                        qp_i = _refresh_vectors(prev_cache.qp,
                                                prev_cache.it, data, it,
                                                static_rows, level)
                        sol, _ = solve_ocp_qp(qp_i, opts.qp_opts,
                                              x0_fixed=_x0f)
                        it = _full_step(it, sol)
                elif level == "D":
                    lm = jnp.asarray(opts.levenberg_marquardt, it.x.dtype)
                    for _ in range(opts.as_rti_iter):
                        qp_i = linearize(form, static_rows, data, it, lm)
                        qp_i = regularize_qp(qp_i, opts.regularize_method,
                                             opts.reg_epsilon)
                        sol, _ = solve_ocp_qp(qp_i, opts.qp_opts,
                                              x0_fixed=_x0f)
                        it = _full_step(it, sol)
                else:
                    raise ValueError(f"unknown as_rti_level {level!r}")
            return _standard_prepare(data, it, static_rows)

    def feedback(cache: RtiCache, data: NlpData, it: NlpIterate):
        with jax.default_matmul_precision(opts.matmul_precision):
            dtype = it.x.dtype
            static_rows = build_static_rows(form, dtype)
            soft_scaled = static_rows["soft"] * static_rows["mask"]
            # inject current stage-0 bounds (fresh x0) into the delta rows
            qp = _inject_x0(cache.qp, cache.g0, data)

            rs, re, ri, rc = _nlp_residuals(form, qp, cache.it, soft_scaled)
            if opts.nlp_qp_tol_strategy == "ADAPTIVE_CURRENT_RES_JOINT":
                qp_opts_k = adaptive_qp_tol(opts, opts.qp_opts, rs, re,
                                            ri, rc)
            else:
                qp_opts_k = opts.qp_opts
            sol, info = solve_ocp_qp(qp, qp_opts_k,
                                     warm=cache.sol_pred, x0_fixed=_x0f)
            qp_fatal = info.status == 1

            base = cache.it
            it_new = NlpIterate(
                x=base.x + sol.x, u=base.u + sol.u, pi=sol.pi,
                lam_l=sol.lam_lg, lam_u=sol.lam_ug,
                sl=sol.sl, su=sol.su)
            nan = jnp.logical_not(jnp.isfinite(
                jnp.sum(it_new.x) + jnp.sum(it_new.u)))
            it_new = jax.tree.map(lambda n, o: jnp.where(nan, o, n),
                                  it_new, base)
            status = jnp.where(nan, 1, jnp.where(qp_fatal, 4, 0)) \
                .astype(jnp.int32)

            stat = jnp.zeros((opts.max_iter + 1, 8), dtype)
            stat = stat.at[0, 0].set(rs).at[0, 1].set(re) \
                       .at[0, 2].set(ri).at[0, 3].set(rc) \
                       .at[0, 4].set(info.status.astype(dtype)) \
                       .at[0, 5].set(info.num_iter.astype(dtype)) \
                       .at[0, 6].set(1.0)
            cost = eval_cost(form, data, it_new.x, it_new.u, it_new.sl,
                             it_new.su, soft_scaled)
            stats = SqpStats(status=status, sqp_iter=jnp.asarray(1,
                             jnp.int32),
                             qp_iter_total=info.num_iter,
                             res_stat=rs, res_eq=re, res_ineq=ri,
                             res_comp=rc, stat=stat, cost=cost)
            return it_new, stats

    return jax.jit(prepare), jax.jit(feedback)
