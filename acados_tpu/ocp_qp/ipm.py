"""Primal-dual interior-point method for OCP-structured QPs.

TPU-native replacement for HPIPM's `d_ocp_qp_ipm_solve`
(/root/reference/acados/ocp_qp/ocp_qp_hpipm.c:347): an infeasible-start
Mehrotra predictor-corrector IPM whose per-iteration Newton systems are
reduced stage-wise (inequality duals and slacks eliminated analytically,
soft-constraint slacks eliminated in closed form — the diagonal "series
weight" trick HPIPM applies to its 2*ns soft slacks) and solved by one
backward-Riccati factorization plus two solves (predictor + corrector).

TPU-first properties:
- fixed shapes; per-row enable masks implement the reference's constraint
  masking (dmask) and stage-varying constraint counts;
- one `jax.lax.while_loop` with per-instance convergence — under `jax.vmap`
  JAX masks updates of converged instances, giving the batched early
  termination of SURVEY.md §7 hard part (b) for free;
- equality rows (lg == ug, e.g. initial-state conditions) are handled by the
  same two-sided barrier, as in HPIPM;
- the whole solve is differentiable-by-construction, though the NLP layer
  uses implicit differentiation at the KKT point instead (mirrors
  d_ocp_qp_ipm_sens_frw/adj, ocp_qp_hpipm.c:489,503).

Sign conventions: multiplier pi_k on (A x_k + B u_k + b_k - x_{k+1});
Lagrangian L = f - lam_lg'(g + sl - lg) - lam_ug'(ug - g + su)
              - lam_sl'sl - lam_su'su.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from acados_tpu.ocp_qp.data import OcpQp, OcpQpSol
from acados_tpu.ocp_qp.riccati import (parallel_riccati_factor,
                                       parallel_riccati_solve,
                                       riccati_factor, riccati_solve)
from acados_tpu.ops.smallmm import mTm, mTv, mv
from acados_tpu.utils.struct import pytree_dataclass, static_field


@pytree_dataclass
class IpmOpts:
    """IPM options. Defaults follow HPIPM's ROBUST-leaning settings; the
    reference exposes the analogous knobs via `hpipm_mode` + qp tolerances
    (acados_ocp_options.py: qp_solver_tol_*)."""

    iter_max: int = static_field(default=30)
    mu0: float = 1e2
    tol_stat: float = 1e-8
    tol_eq: float = 1e-8
    tol_ineq: float = 1e-8
    tol_comp: float = 1e-8
    tau: float = 0.995          # fraction-to-boundary
    reg_eps: float = 1e-11      # Cholesky diagonal regularization
    t0_min: float = 1e-1        # minimum initial slack distance (cold)
    warm_t_min: float = 1e-4    # floor for warm-start slacks/multipliers:
    # small enough to preserve the warm point's centrality (a 1e-1 floor
    # destroys it and costs the full cold re-centering path), large
    # enough that barrier weights lam/t stay representable in f32
    mu_min: float = 0.0         # hard floor on mu; the effective floor is
    # max(mu_min, 10*eps(dtype)): once the barrier is below machine
    # precision further iterations only amplify roundoff (relevant for the
    # f32 TPU production path; f64 oracles are unaffected).
    warm_comp_cap: float = -1.0
    # Cap on per-row complementarity products lam*t of a dual warm start.
    # -1 (auto): derive per instance from the warm point's own mean
    # complementarity — a steady-state warm point (mu ~ 1e-6) keeps its
    # centrality and converges in ~2 iterations instead of re-centering
    # from mu0 (measured on the chain model: qp_iter 7.0 -> 2.0, and the
    # batch max dropped 8 -> 2, which is what a lockstep vmapped
    # while_loop actually pays). Explicit value: use it directly. The
    # reference analog is HPIPM warm_start mode 2 (primal+dual,
    # ocp_qp_hpipm.c:147-160), which trusts the warm duals outright; the
    # cap exists because f32 lockstep batches cannot afford one
    # off-center instance re-centering for the whole batch.
    parallel_riccati: bool = static_field(default=False)
    # Log-depth associative-scan Riccati (riccati.py parallel_*): wins for
    # long horizons (N >> 64) where the sequential stage scan is
    # latency-bound; ~4x the FLOPs per sweep, so keep off for short N.
    matmul_precision: str = static_field(default="highest")
    # TPU MXU matmuls on f32 inputs default to bf16 passes, which destroys
    # the Newton directions (stationarity stalls ~1e-2); 'highest' uses
    # full-f32 accumulation. Set 'default' only for experimentation.
    riccati_unroll: int = static_field(default=1)
    # lax.scan unroll factor for the sequential Riccati sweeps: each stage
    # step is tiny (nx, nu) algebra, so per-step loop dispatch latency
    # dominates on TPU for small models; unrolling trades compile time
    # for fused stage kernels. 1 = plain scan.
    stall_max: int = 4
    # f32 ONLY (the batched TPU production path): in f64 the effective
    # limit is max(stall_max, iter_max) — the oracle keeps HPIPM's
    # semantics (run to tolerance or iter_max; a slow-but-converging QP
    # is never cut off), with the best-iterate return still applying.
    # stop after this many consecutive non-improving FULL-ish steps
    # (alpha > stall_alpha): a chattering active set (borderline
    # bang-bang instance) bounces between two points at large alpha
    # without improving and would otherwise burn iter_max iterations —
    # under a vmapped lockstep batch ONE such instance multiplies the
    # whole batch's solve time (measured: 1/4096 stalled instance made
    # the RTI batch 5x slower). Small-alpha iterations are exempt: the
    # two-sided-barrier treatment of equality rows legitimately crawls
    # at alpha ~ 1e-2 for many iterations before breaking through (the
    # non-eliminated-x0 path). The best iterate so far is returned
    # either way.
    stall_alpha: float = 0.5
    abs_form: bool = static_field(default=False)
    # HPIPM SPEED_ABS analog (ocp_qp_hpipm.c:147-160 mode dispatch): skip
    # the Mehrotra affine predictor — one Newton solve per iteration
    # toward the fixed centering target sigma_abs * mu. Halves the
    # per-iteration Riccati solves at the price of weaker centering.
    sigma_abs: float = 0.1


@pytree_dataclass
class IpmInfo:
    """Per-solve diagnostics (reference qp_info: ocp_qp_common.h:112-122)."""

    num_iter: jnp.ndarray
    mu: jnp.ndarray
    res_stat: jnp.ndarray
    res_eq: jnp.ndarray
    res_ineq: jnp.ndarray
    status: jnp.ndarray  # 0 success, 1 NaN, 2 max_iter


def _stage_g(qp: OcpQp, x, u):
    """g_k = C_k x_k + D_k u_k for all stages (D contributes for k < N)."""
    g = mv(qp.C, x)
    gu = mv(qp.D, u)
    return g.at[:-1].add(gu)


def _ct_vec(qp: OcpQp, v):
    """(C'v, D'v) stage-wise: v (N+1, nc) -> ((N+1, nx), (N, nu))."""
    cv = mTv(qp.C, v)
    dv = mTv(qp.D, v[:-1])
    return cv, dv


@pytree_dataclass
class _Iterate:
    x: jnp.ndarray
    u: jnp.ndarray
    pi: jnp.ndarray
    lam_l: jnp.ndarray
    lam_u: jnp.ndarray
    t_l: jnp.ndarray
    t_u: jnp.ndarray
    sl: jnp.ndarray
    su: jnp.ndarray
    lam_sl: jnp.ndarray
    lam_su: jnp.ndarray


def _residuals(qp: OcpQp, it: _Iterate, x0_fixed: bool = False):
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    g = _stage_g(qp, it.x, it.u)
    lam_d = ml * it.lam_l - mu_ * it.lam_u
    cv, dv = _ct_vec(qp, lam_d)

    rx = mv(qp.Q, it.x) + qp.q - cv
    rx = rx.at[:-1].add(mTv(qp.S, it.u))
    rx = rx.at[:-1].add(mTv(qp.A, it.pi))
    rx = rx.at[1:].add(-it.pi)

    ru = (mv(qp.S, it.x[:-1]) + mv(qp.R, it.u) + qp.r
          + mTv(qp.B, it.pi) - dv)

    r_dyn = mv(qp.A, it.x[:-1]) + mv(qp.B, it.u) + qp.b - it.x[1:]

    r_l = ml * (g + sml * it.sl - it.t_l - qp.lg)
    r_u = mu_ * (g - smu * it.su + it.t_u - qp.ug)
    r_sl = sml * (qp.zl + qp.Zl * it.sl - it.lam_l - it.lam_sl)
    r_su = smu * (qp.zu + qp.Zu * it.su - it.lam_u - it.lam_su)

    comp = (jnp.sum(ml * it.lam_l * it.t_l) + jnp.sum(mu_ * it.lam_u * it.t_u)
            + jnp.sum(sml * it.lam_sl * it.sl)
            + jnp.sum(smu * it.lam_su * it.su))
    ncomp = jnp.maximum(jnp.sum(ml) + jnp.sum(mu_)
                        + jnp.sum(sml) + jnp.sum(smu), 1.0)
    mu = comp / ncomp
    if x0_fixed:
        # eliminated initial state: stage-0 x-stationarity DEFINES the
        # (eliminated) x0-row multiplier instead of being a residual
        # (HPIPM d_ocp_qp_reduce_eq_dof; recovered in _x0_row_multiplier)
        rx = rx.at[0].set(0.0)
    return (rx, ru, r_dyn, r_l, r_u, r_sl, r_su), mu


def _x0_row_multiplier(qp: OcpQp, it: _Iterate):
    """Multiplier of the eliminated stage-0 equality rows: the value that
    makes stage-0 x-stationarity exact (reference
    d_ocp_qp_reduce_eq_dof_sol restores the same multiplier)."""
    lam_d = qp.mask_l * it.lam_l - qp.mask_u * it.lam_u
    return (qp.Q[0] @ it.x[0] + qp.q[0] + qp.S[0].T @ it.u[0]
            + qp.A[0].T @ it.pi[0] - qp.C[0].T @ lam_d[0])


def _comp_inf(qp: OcpQp, it: _Iterate):
    """Inf-norm of the complementarity products (HPIPM's res_m measure —
    the convergence check; the averaged mu is only used for centering)."""
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    return jnp.max(jnp.stack([
        jnp.max(ml * it.lam_l * it.t_l), jnp.max(mu_ * it.lam_u * it.t_u),
        jnp.max(sml * it.lam_sl * it.sl),
        jnp.max(smu * it.lam_su * it.su)]))


def _res_norms(res):
    rx, ru, r_dyn, r_l, r_u, r_sl, r_su = res
    inf = lambda a: (jnp.max(jnp.abs(a)) if a.size else jnp.zeros((), a.dtype))
    res_stat = jnp.maximum(jnp.maximum(inf(rx), inf(ru)),
                           jnp.maximum(inf(r_sl), inf(r_su)))
    res_eq = inf(r_dyn)
    res_ineq = jnp.maximum(inf(r_l), inf(r_u))
    return res_stat, res_eq, res_ineq


def _row_weights(qp: OcpQp, it: _Iterate):
    """Barrier weights per constraint row (rhs-independent -> one
    factorization serves predictor and corrector)."""
    sml, smu = qp.soft_mask * qp.mask_l, qp.soft_mask * qp.mask_u
    wl = it.lam_l / it.t_l
    wu = it.lam_u / it.t_u
    wsl = it.lam_sl / it.sl
    wsu = it.lam_su / it.su
    denom_l = qp.Zl + wl + wsl
    denom_u = qp.Zu + wu + wsu
    W_l = jnp.where(sml > 0, wl * (qp.Zl + wsl) / denom_l, wl)
    W_u = jnp.where(smu > 0, wu * (qp.Zu + wsu) / denom_u, wu)
    W = qp.mask_l * W_l + qp.mask_u * W_u
    return W, (wl, wu, wsl, wsu, denom_l, denom_u)


def _barrier_hessian(qp: OcpQp, W):
    """Qb, Rb, Sb = stage Hessian + G' diag(W) G."""
    WC = W[:, :, None] * qp.C
    Qb = qp.Q + mTm(qp.C, WC)
    WD = W[:-1, :, None] * qp.D
    Rb = qp.R + mTm(qp.D, WD)
    Sb = qp.S + mTm(qp.D, WC[:-1])
    return Qb, Rb, Sb


def _newton_step(qp: OcpQp, fact, it: _Iterate, res, weights,
                 rhs_cl, rhs_cu, rhs_csl, rhs_csu, parallel=False,
                 dx0=None, unroll=1):
    """One reduced Newton solve for given complementarity right-hand sides."""
    rx, ru, r_dyn, r_l, r_u, r_sl, r_su = res
    _, (wl, wu, wsl, wsu, denom_l, denom_u) = weights
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_

    a_l = rhs_cl / it.t_l - wl * r_l
    a_u = rhs_cu / it.t_u + wu * r_u
    c_l = -r_sl + rhs_csl / it.sl
    c_u = -r_su + rhs_csu / it.su

    gamma_l = jnp.where(sml > 0, a_l - wl * (a_l + c_l) / denom_l, a_l)
    gamma_u = jnp.where(smu > 0, a_u - wu * (a_u + c_u) / denom_u, a_u)
    gamma = ml * gamma_l - mu_ * gamma_u

    cg, dg_ = _ct_vec(qp, gamma)
    qb = rx - cg
    rb = ru - dg_
    if parallel:
        dx, du, dpi = parallel_riccati_solve(fact, qp.A, qp.B, qb, rb,
                                             r_dyn, dx0=dx0)
    else:
        dx, du, dpi = riccati_solve(fact, qp.A, qp.B, qb, rb, r_dyn,
                                    dx0=dx0, unroll=unroll)
    dg = mv(qp.C, dx)
    dg = dg.at[:-1].add(mv(qp.D, du))

    dsl = sml * (a_l + c_l - wl * dg) / denom_l
    dsu = smu * (a_u + c_u + wu * dg) / denom_u
    dt_l = ml * (dg + dsl + r_l)
    dt_u = mu_ * (dsu - dg - r_u)
    dlam_l = ml * (rhs_cl - it.lam_l * dt_l) / it.t_l
    dlam_u = mu_ * (rhs_cu - it.lam_u * dt_u) / it.t_u
    dlam_sl = sml * (rhs_csl - it.lam_sl * dsl) / it.sl
    dlam_su = smu * (rhs_csu - it.lam_su * dsu) / it.su

    return _Iterate(x=dx, u=du, pi=dpi, lam_l=dlam_l, lam_u=dlam_u,
                    t_l=dt_l, t_u=dt_u, sl=dsl, su=dsu,
                    lam_sl=dlam_sl, lam_su=dlam_su)


def _max_alpha(qp: OcpQp, it: _Iterate, d: _Iterate, tau):
    """Single fraction-to-boundary step length over all positive variables."""
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_

    def ratio(v, dv, mm):
        bad = (dv < 0) & (mm > 0)
        r = jnp.where(bad, -v / jnp.where(bad, dv, -1.0), jnp.inf)
        return jnp.min(r) if r.size else jnp.inf

    cands = jnp.stack([
        ratio(it.t_l, d.t_l, ml), ratio(it.t_u, d.t_u, mu_),
        ratio(it.lam_l, d.lam_l, ml), ratio(it.lam_u, d.lam_u, mu_),
        ratio(it.sl, d.sl, sml), ratio(it.su, d.su, smu),
        ratio(it.lam_sl, d.lam_sl, sml), ratio(it.lam_su, d.lam_su, smu),
    ])
    return jnp.minimum(tau * jnp.min(cands), 1.0)


def _apply(it: _Iterate, d: _Iterate, alpha) -> _Iterate:
    return jax.tree.map(lambda v, dv: v + alpha * dv, it, d)


def _mu_of(qp: OcpQp, it: _Iterate):
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    comp = (jnp.sum(ml * it.lam_l * it.t_l) + jnp.sum(mu_ * it.lam_u * it.t_u)
            + jnp.sum(sml * it.lam_sl * it.sl)
            + jnp.sum(smu * it.lam_su * it.su))
    ncomp = jnp.maximum(jnp.sum(ml) + jnp.sum(mu_)
                        + jnp.sum(sml) + jnp.sum(smu), 1.0)
    return comp / ncomp


def _init_iterate(qp: OcpQp, opts: IpmOpts, warm: OcpQpSol | None,
                  dx0=None) -> _Iterate:
    dt = qp.q.dtype
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    if warm is None:
        x = jnp.zeros_like(qp.q)
        u = jnp.zeros_like(qp.r)
        pi = jnp.zeros_like(qp.b)
    else:
        x, u, pi = warm.x, warm.u, warm.pi
    if dx0 is not None:
        x = x.at[0].set(dx0)
    g = _stage_g(qp, x, u)
    t0 = jnp.asarray(opts.t0_min, dt)
    t_l = jnp.where(ml > 0, jnp.maximum(g - qp.lg, t0), 1.0)
    t_u = jnp.where(mu_ > 0, jnp.maximum(qp.ug - g, t0), 1.0)
    if warm is None:
        lam_l = jnp.where(ml > 0, opts.mu0 / t_l, 0.0)
        lam_u = jnp.where(mu_ > 0, opts.mu0 / t_u, 0.0)
        sl = jnp.ones_like(t_l)
        su = jnp.ones_like(t_u)
        lam_sl = jnp.where(sml > 0, jnp.asarray(opts.mu0, dt), 1.0)
        lam_su = jnp.where(smu > 0, jnp.asarray(opts.mu0, dt), 1.0)
    else:
        # dual warm start (reference analog: HPIPM warm_start modes 1/2 —
        # primal, or primal+dual with clipped multipliers). Floors use
        # warm_t_min — small, to PRESERVE the warm point's centrality
        # (lam*t stays near the previous solve's mu; a large floor would
        # force the full cold re-centering path). Instances whose warm
        # duals are identically zero (e.g. the first call of an RTI loop,
        # before any QP has been solved) fall back to the cold init
        # per-instance: zero duals with a tiny floor give a barrier too
        # weak to control the first Newton step.
        wt = jnp.asarray(opts.warm_t_min, dt)
        sl_w = jnp.where(sml > 0, jnp.maximum(warm.sl, wt), 1.0)
        su_w = jnp.where(smu > 0, jnp.maximum(warm.su, wt), 1.0)
        t_l_w = jnp.where(ml > 0,
                          jnp.maximum(g + sml * sl_w - qp.lg, wt), 1.0)
        t_u_w = jnp.where(mu_ > 0,
                          jnp.maximum(qp.ug + smu * su_w - g, wt), 1.0)
        # complementarity-consistent clip: a warm multiplier on a row
        # whose NEW slack t is large (active set flipped since the warm
        # point) would start at lam*t >> mu and strand the IPM in an
        # off-center limit cycle — cap each product at `cap`. The cap is
        # the warm point's own mean complementarity (x10 headroom) so a
        # well-converged warm point KEEPS its centrality instead of
        # re-centering from mu0 (see IpmOpts.warm_comp_cap).
        mu0cap = jnp.asarray(opts.mu0, dt)
        # auto cap: slacks recomputed from the warm primal are floored at
        # wt, so a LEGITIMATE active row (true t ~ 0, multiplier lam)
        # shows a product of up to wt * lam — the cap must sit just above
        # that, so it clips only rows whose recomputed slack is LARGE
        # (active set flipped since the warm point) while leaving every
        # converged active dual untouched
        lam_max = jnp.maximum(jnp.max(ml * jnp.abs(warm.lam_lg)),
                              jnp.max(mu_ * jnp.abs(warm.lam_ug)))
        cap_auto = jnp.clip(10.0 * wt * jnp.maximum(lam_max, 1.0),
                            100 * jnp.finfo(dt).eps, mu0cap)
        cap_explicit = jnp.asarray(opts.warm_comp_cap, dt)
        cap = jnp.where(cap_explicit > 0, cap_explicit, cap_auto)
        lam_l_w = jnp.where(
            ml > 0, jnp.clip(warm.lam_lg, wt, cap / t_l_w), 0.0)
        lam_u_w = jnp.where(
            mu_ > 0, jnp.clip(warm.lam_ug, wt, cap / t_u_w), 0.0)
        lam_sl_w = jnp.where(
            sml > 0, jnp.maximum(qp.zl + qp.Zl * sl_w - lam_l_w, wt), 1.0)
        lam_su_w = jnp.where(
            smu > 0, jnp.maximum(qp.zu + qp.Zu * su_w - lam_u_w, wt), 1.0)
        is_warm = (jnp.max(ml * jnp.abs(warm.lam_lg))
                   + jnp.max(mu_ * jnp.abs(warm.lam_ug))) > 0
        lam_l = jnp.where(is_warm, lam_l_w,
                          jnp.where(ml > 0, opts.mu0 / t_l, 0.0))
        lam_u = jnp.where(is_warm, lam_u_w,
                          jnp.where(mu_ > 0, opts.mu0 / t_u, 0.0))
        sl = jnp.where(is_warm, sl_w, jnp.ones_like(t_l))
        su = jnp.where(is_warm, su_w, jnp.ones_like(t_u))
        t_l = jnp.where(is_warm, t_l_w, t_l)
        t_u = jnp.where(is_warm, t_u_w, t_u)
        lam_sl = jnp.where(
            is_warm, lam_sl_w,
            jnp.where(sml > 0, jnp.asarray(opts.mu0, dt), 1.0))
        lam_su = jnp.where(
            is_warm, lam_su_w,
            jnp.where(smu > 0, jnp.asarray(opts.mu0, dt), 1.0))
    return _Iterate(x=x, u=u, pi=pi, lam_l=lam_l, lam_u=lam_u,
                    t_l=t_l, t_u=t_u, sl=sl, su=su,
                    lam_sl=lam_sl, lam_su=lam_su)


@partial(jax.jit, static_argnames=("unroll", "x0_fixed", "x0_rows"))
def solve_ocp_qp(qp: OcpQp, opts: IpmOpts = None, warm: OcpQpSol | None = None,
                 unroll: bool = False, x0_fixed: bool = False,
                 x0_rows: tuple = None):
    """Solve one OCP-QP. vmap over a leading batch axis for batched solves.

    x0_fixed: eliminate the initial state (reference: HPIPM
    d_ocp_qp_reduce_eq_dof, applied unconditionally by the reference's
    partial-condensing front-end, ocp_qp_partial_condensing.c:542).
    Requires nx stage-0 rows that are identity state rows with lg == ug
    (the builder's x0 layout); those rows leave the barrier entirely —
    the IPM no longer pays iterations re-growing their stiff multipliers
    from the cold start — and their multipliers are recovered from
    stage-0 stationarity at the solution.

    x0_rows: static row indices of the identity rows (x0_rows[j] pins
    state component j). Default: the first nx rows. The condensing
    front-end passes the scattered positions its row re-blocking
    produces (xcond.solve_ocp_qp_xcond).

    Returns (OcpQpSol, IpmInfo).
    """
    if opts is None:
        opts = IpmOpts()
    with jax.default_matmul_precision(opts.matmul_precision):
        return _solve_ocp_qp_impl(qp, opts, warm, unroll, x0_fixed,
                                  x0_rows)


def _solve_ocp_qp_impl(qp: OcpQp, opts: IpmOpts, warm, unroll,
                       x0_fixed: bool = False, x0_rows: tuple = None):
    dt = qp.q.dtype
    nx = qp.q.shape[-1]
    if x0_fixed:
        rows = jnp.asarray(x0_rows if x0_rows is not None
                           else tuple(range(nx)), jnp.int32)
        dx0 = qp.lg[0, rows]
        dx0_zero = jnp.zeros_like(dx0)
        qp = qp.replace(mask_l=qp.mask_l.at[0, rows].set(0.0),
                        mask_u=qp.mask_u.at[0, rows].set(0.0))
    else:
        rows = None
        dx0 = dx0_zero = None
    it0 = _init_iterate(qp, opts, warm, dx0=dx0)
    mu_floor = jnp.maximum(jnp.asarray(opts.mu_min, dt),
                           10 * jnp.finfo(dt).eps)
    # stall detection is an f32 lockstep-batch mitigation; the f64
    # oracle path keeps HPIPM semantics (see IpmOpts.stall_max)
    stall_lim = (opts.stall_max if dt == jnp.float32
                 else jnp.maximum(opts.stall_max, opts.iter_max))

    def err_of(rs, re, ri, mu):
        """Worst residual-to-tolerance ratio; <= 1 means converged."""
        return jnp.max(jnp.stack([rs / opts.tol_stat, re / opts.tol_eq,
                                  ri / opts.tol_ineq, mu / opts.tol_comp]))

    def cond(carry):
        it, res, mu, best_it, best_err, no_imp, k, status, done = carry
        return jnp.logical_and(k < opts.iter_max, jnp.logical_not(done))

    def body(carry):
        # res/mu carried from the previous iteration's evaluation — one
        # _residuals per iteration instead of two
        it, res, mu, best_it, best_err, no_imp, k, status, _ = carry
        weights = _row_weights(qp, it)
        W = weights[0]
        Qb, Rb, Sb = _barrier_hessian(qp, W)
        if opts.parallel_riccati:
            fact = parallel_riccati_factor(Qb, Rb, Sb, qp.A, qp.B,
                                           reg_eps=opts.reg_eps)
        else:
            fact = riccati_factor(Qb, Rb, Sb, qp.A, qp.B,
                                  reg_eps=opts.reg_eps,
                                  unroll=opts.riccati_unroll)

        ml, mu_2 = qp.mask_l, qp.mask_u
        sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_2
        if opts.abs_form:
            # SPEED_ABS: single centered Newton solve toward sigma_abs*mu
            cmu = opts.sigma_abs * mu
            rhs_cl = ml * (cmu - it.lam_l * it.t_l)
            rhs_cu = mu_2 * (cmu - it.lam_u * it.t_u)
            rhs_csl = sml * (cmu - it.lam_sl * it.sl)
            rhs_csu = smu * (cmu - it.lam_su * it.su)
        else:
            # --- affine (predictor) step: rc = 0 -> rhs = -lam*t
            rhs_cl = -ml * it.lam_l * it.t_l
            rhs_cu = -mu_2 * it.lam_u * it.t_u
            rhs_csl = -sml * it.lam_sl * it.sl
            rhs_csu = -smu * it.lam_su * it.su
            d_aff = _newton_step(qp, fact, it, res, weights,
                                 rhs_cl, rhs_cu, rhs_csl, rhs_csu,
                                 parallel=opts.parallel_riccati,
                                 dx0=dx0_zero,
                                 unroll=opts.riccati_unroll)
            alpha_aff = _max_alpha(qp, it, d_aff, opts.tau)
            mu_aff = _mu_of(qp, _apply(it, d_aff, alpha_aff))
            sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3,
                             0.0, 1.0)

            # --- corrector: rc = sigma*mu - dlam_aff*dt_aff
            cmu = sigma * mu
            rhs_cl = ml * (cmu - it.lam_l * it.t_l
                           - d_aff.lam_l * d_aff.t_l)
            rhs_cu = mu_2 * (cmu - it.lam_u * it.t_u
                             - d_aff.lam_u * d_aff.t_u)
            rhs_csl = sml * (cmu - it.lam_sl * it.sl
                             - d_aff.lam_sl * d_aff.sl)
            rhs_csu = smu * (cmu - it.lam_su * it.su
                             - d_aff.lam_su * d_aff.su)
        d = _newton_step(qp, fact, it, res, weights,
                         rhs_cl, rhs_cu, rhs_csl, rhs_csu,
                         parallel=opts.parallel_riccati, dx0=dx0_zero,
                         unroll=opts.riccati_unroll)
        alpha = _max_alpha(qp, it, d, opts.tau)
        it_new = _apply(it, d, alpha)

        nan = jnp.logical_not(jnp.isfinite(
            jnp.sum(it_new.x) + jnp.sum(it_new.u) + jnp.sum(it_new.pi)))
        it_new = jax.tree.map(lambda new, old: jnp.where(nan, old, new),
                              it_new, it)

        res_new, mu_new = _residuals(qp, it_new, x0_fixed)
        rs, re, ri = _res_norms(res_new)
        err = err_of(rs, re, ri, _comp_inf(qp, it_new))
        improved = err < best_err
        best_it = jax.tree.map(lambda n, o: jnp.where(improved, n, o),
                               it_new, best_it)
        best_err = jnp.where(improved, err, best_err)
        no_imp = jnp.where(improved, 0,
                           jnp.where(alpha > opts.stall_alpha,
                                     no_imp + 1, no_imp))
        converged = err <= 1.0
        status = jnp.where(nan, 1, jnp.where(converged, 0, status))
        done = (converged | nan | (mu_new < mu_floor)
                | (no_imp >= stall_lim))
        return (it_new, res_new, mu_new, best_it, best_err, no_imp, k + 1,
                status, done)

    init_status = jnp.asarray(2, jnp.int32)  # max_iter unless proven otherwise
    res0, mu0_ = _residuals(qp, it0, x0_fixed)
    # best_err starts at +inf, NOT at the init point's error: the
    # infeasible-start Mehrotra path transiently RAISES the error while
    # recentering from a warm primal point, and counting the init point
    # as "best" would trip the stall detector during that plateau (and
    # return a zero step)
    err0 = jnp.asarray(jnp.inf, dt)
    carry0 = (it0, res0, mu0_, it0, err0, jnp.asarray(0, jnp.int32),
              jnp.asarray(0, jnp.int32), init_status, jnp.asarray(False))
    if unroll:
        carry = carry0
        for _ in range(opts.iter_max):
            carry = jax.lax.cond(cond(carry), body, lambda c: c, carry)
    else:
        carry = jax.lax.while_loop(cond, body, carry0)
    it_last, res, mu, best_it, best_err, _, k, status, _ = carry
    status = jnp.where(best_err <= 1.0, 0, status)
    # return the best iterate: for converged instances it coincides with
    # the final one; a stalled/oscillating instance returns its best
    # point instead of wherever the cycle happened to stop
    it = best_it
    res, mu = _residuals(qp, it, x0_fixed)
    rs, re, ri = _res_norms(res)
    lam_lg = it.lam_l * qp.mask_l
    lam_ug = it.lam_u * qp.mask_u
    t_lg, t_ug = it.t_l, it.t_u
    if x0_fixed:
        lam0 = _x0_row_multiplier(qp, it)
        lam_lg = lam_lg.at[0, rows].set(jnp.maximum(lam0, 0.0))
        lam_ug = lam_ug.at[0, rows].set(jnp.maximum(-lam0, 0.0))
        t_lg = t_lg.at[0, rows].set(0.0)
        t_ug = t_ug.at[0, rows].set(0.0)
    sol = OcpQpSol(x=it.x, u=it.u, pi=it.pi,
                   lam_lg=lam_lg, lam_ug=lam_ug,
                   t_lg=t_lg, t_ug=t_ug,
                   sl=it.sl * qp.soft_mask * qp.mask_l,
                   su=it.su * qp.soft_mask * qp.mask_u)
    info = IpmInfo(num_iter=k, mu=mu, res_stat=rs, res_eq=re, res_ineq=ri,
                   status=status)
    return sol, info


# ---------------------------------------------------------------------------
# QP-level solution sensitivities (seed API)
# ---------------------------------------------------------------------------

def _iterate_at_solution(qp: OcpQp, sol: OcpQpSol,
                         floor: float = 1e-12) -> _Iterate:
    """Converged solution -> strictly-positive iterate WITHOUT the warm
    start's t0_min centering floor (which would corrupt the barrier
    weights lam/t the implicit differentiation relies on)."""
    dt = qp.q.dtype
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    f = jnp.asarray(floor, dt)
    lam_l = jnp.where(ml > 0, jnp.maximum(sol.lam_lg, f), 0.0)
    lam_u = jnp.where(mu_ > 0, jnp.maximum(sol.lam_ug, f), 0.0)
    t_l = jnp.where(ml > 0, jnp.maximum(sol.t_lg, f), 1.0)
    t_u = jnp.where(mu_ > 0, jnp.maximum(sol.t_ug, f), 1.0)
    sl = jnp.where(sml > 0, jnp.maximum(sol.sl, f), 1.0)
    su = jnp.where(smu > 0, jnp.maximum(sol.su, f), 1.0)
    lam_sl = jnp.where(sml > 0,
                       jnp.maximum(qp.zl + qp.Zl * sl - lam_l, f), 1.0)
    lam_su = jnp.where(smu > 0,
                       jnp.maximum(qp.zu + qp.Zu * su - lam_u, f), 1.0)
    return _Iterate(x=sol.x, u=sol.u, pi=sol.pi, lam_l=lam_l,
                    lam_u=lam_u, t_l=t_l, t_u=t_u, sl=sl, su=su,
                    lam_sl=lam_sl, lam_su=lam_su)


def solve_ocp_qp_sens_frw(qp: OcpQp, sol: OcpQpSol, d_qp: OcpQp,
                          opts: IpmOpts = None):
    """Forward QP solution sensitivity in the data direction d_qp.

    Mirrors HPIPM's d_ocp_qp_ipm_sens_frw (reference ocp_qp_hpipm.c:489):
    implicit differentiation of the barrier-KKT system at the converged
    solution — K d(sol)/dtheta = -d(res)/dtheta. d_qp is an OcpQp tangent
    (seed the fields you differentiate against, zeros elsewhere; masks in
    d_qp are ignored — pass zeros).

    Returns (dx, du, dpi).
    """
    if opts is None:
        opts = IpmOpts()
    with jax.default_matmul_precision(opts.matmul_precision):
        it = _iterate_at_solution(qp, sol)
        res_of = lambda qp_: _residuals(qp_.replace(
            mask_l=qp.mask_l, mask_u=qp.mask_u,
            soft_mask=qp.soft_mask), it)[0]
        _, d_res = jax.jvp(res_of, (qp,), (d_qp,))
        weights = _row_weights(qp, it)
        Qb, Rb, Sb = _barrier_hessian(qp, weights[0])
        fact = riccati_factor(Qb, Rb, Sb, qp.A, qp.B,
                              reg_eps=opts.reg_eps)
        zl = jnp.zeros_like(qp.lg)
        d = _newton_step(qp, fact, it, d_res, weights, zl, zl, zl, zl)
        return d.x, d.u, d.pi


def solve_ocp_qp_sens_adj(qp: OcpQp, sol: OcpQpSol, seed_x, seed_u,
                          opts: IpmOpts = None) -> OcpQp:
    """Adjoint QP solution sensitivity: gradient of <seed, (x, u)> wrt the
    QP data fields. Mirrors d_ocp_qp_ipm_sens_adj (ocp_qp_hpipm.c:503).

    Returns an OcpQp pytree of gradients (masks/soft fields zero).
    """
    if opts is None:
        opts = IpmOpts()
    dt = qp.q.dtype
    # the forward sensitivity is LINEAR in the data tangent; the adjoint
    # is its exact transpose (jax.vjp of the forward map), so every data
    # field's contribution — including bounds and slack penalties routed
    # through the row elimination — is accounted for
    fwd = lambda d_qp: solve_ocp_qp_sens_frw(qp, sol, d_qp, opts)
    zero = jax.tree.map(jnp.zeros_like, qp)
    _, vjp = jax.vjp(fwd, zero)
    (grad,) = vjp((jnp.asarray(seed_x, dt), jnp.asarray(seed_u, dt),
                   jnp.zeros_like(qp.b)))
    return grad
