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
across the phase boundary; what crosses the boundary here is the full QP
linearization (integrator sweeps + Jacobians + Hessians — the dominant
cost, reference time_lin vs time_qp). The feedback phase is QP-solve-only,
warm-started from the preparation phase's predicted QP solution.

AS-RTI levels A-D (preparation_advanced_step, :797) build on this split:
between samples, additional inner iterations are run at the *predicted*
next state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.ocp_nlp.formulation import NlpData, OcpNlpFormulation
from acados_tpu.ocp_nlp.linearize import (NlpIterate, build_static_rows,
                                          eval_cost, linearize)
from acados_tpu.ocp_nlp.regularize import regularize_qp
from acados_tpu.ocp_nlp.sqp import SqpOpts, SqpStats, _nlp_residuals
from acados_tpu.ocp_qp.data import OcpQp
from acados_tpu.ocp_qp.ipm import solve_ocp_qp
from acados_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class RtiCache:
    """Preparation-phase output carried into the feedback phase."""

    qp: OcpQp            # full linearization at the preparation iterate
    g0: jnp.ndarray      # stage-0 constraint row values (for x0 injection)
    it: NlpIterate       # the iterate the linearization was taken at


def make_rti_solver(form: OcpNlpFormulation, opts: SqpOpts):
    """Build (prepare, feedback) jitted functions.

    prepare(data, it) -> RtiCache
    feedback(cache, data, it) -> (NlpIterate, SqpStats)
      data's lb_0/ub_0 carry the fresh x0 (set via constraints_set before
      the feedback call, like the reference's x0 injection).
    """

    def prepare(data: NlpData, it: NlpIterate) -> RtiCache:
        with jax.default_matmul_precision(opts.matmul_precision):
            dtype = it.x.dtype
            static_rows = build_static_rows(form, dtype)
            lm = jnp.asarray(opts.levenberg_marquardt, dtype)
            qp = linearize(form, static_rows, data, it, lm)
            qp = regularize_qp(qp, opts.regularize_method, opts.reg_epsilon)
            # recover absolute stage-0 row values g0 from the delta form:
            # lg = lb - g  ->  g = lb - lg on enabled rows (fall back to
            # ub - ug for upper-only rows)
            g0 = jnp.where(qp.mask_l[0] > 0, data.lb_0 - qp.lg[0],
                           jnp.where(qp.mask_u[0] > 0, data.ub_0 - qp.ug[0],
                                     0.0))
            return RtiCache(qp=qp, g0=g0, it=it)

    def feedback(cache: RtiCache, data: NlpData, it: NlpIterate):
        with jax.default_matmul_precision(opts.matmul_precision):
            dtype = it.x.dtype
            static_rows = build_static_rows(form, dtype)
            soft_scaled = static_rows["soft"] * static_rows["mask"]
            qp = cache.qp
            # inject current stage-0 bounds (fresh x0) into the delta rows
            lg0 = jnp.where(qp.mask_l[0] > 0, data.lb_0 - cache.g0,
                            qp.lg[0])
            ug0 = jnp.where(qp.mask_u[0] > 0, data.ub_0 - cache.g0,
                            qp.ug[0])
            qp = qp.replace(lg=qp.lg.at[0].set(lg0),
                            ug=qp.ug.at[0].set(ug0))

            rs, re, ri, rc = _nlp_residuals(form, qp, cache.it, soft_scaled)
            sol, info = solve_ocp_qp(qp, opts.qp_opts)
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
