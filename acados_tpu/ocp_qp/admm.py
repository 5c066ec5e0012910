"""ADMM first-order fallback QP backend (OSQP-class).

TPU-native counterpart of the reference's OSQP backend
(/root/reference/acados/ocp_qp/ocp_qp_osqp.c): the alternative to the
interior point for problems where a cheap, robust first-order method is
preferred. Unlike the reference (which flattens the OCP into one sparse
CSC matrix, :64-217), the splitting here keeps the OCP structure: the
w-update is an equality-constrained LQ problem solved by the same Riccati
factor/solve kernel the IPM uses — the dynamics are satisfied EXACTLY at
every iterate; only the inequality rows are split.

    min 0.5 w'Hw + g'w   s.t. dynamics(w),  l <= Gw <= u
    ADMM on z = Gw:
      w+ = argmin 0.5 w'Hw + g'w + rho/2 ||Gw - z + y||^2  s.t. dynamics
      z+ = clip(Gw+ + y, l, u)
      y+ = y + Gw+ - z+

The w-update's Hessian H + rho G'G is row-structured exactly like the
IPM's barrier Hessian, so the same `_barrier_hessian` + Riccati path
applies, with a FIXED penalty rho -> the factorization is computed once
and reused for every iteration (a structural advantage over the IPM's
barrier-dependent factorization).

Soft rows use the exact prox of the L1+L2 slack penalty in the z-update
(closed form, below) — the same penalty the IPM eliminates analytically.
Termination is residual-based inside a `lax.while_loop` (true num_iter
in the info struct).

SCOPE (measured, round 4): this backend is a PARITY / ROBUSTNESS
FALLBACK, not a performance backend. The hypothesized niche — one
fixed-rho factorization at moderate accuracy — was benchmarked and does
NOT materialize on this hardware: at B=1024, N=16, nx=8, nc=24 with
1e-2 tolerances (large-nc, loose-tol — ADMM's best case), ADMM measured
278 ms vs the Riccati IPM's 16 ms (17x); on the pendulum RTI config the
gap is ~100x (bench admm_vs_ipm). The reason: the IPM's per-iteration
factorization cost collapsed once the stage algebra moved off the
padded MXU tile (ops/smallmm), so amortizing the factorization no
longer buys anything while ADMM's iteration count stays ~100. Keep for
API parity with the reference's OSQP/qpDUNES plans and as a fallback
for QPs where barrier methods struggle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from acados_tpu.ocp_qp.data import OcpQp, OcpQpSol
from acados_tpu.ocp_qp.ipm import IpmInfo, IpmOpts, _stage_g
from acados_tpu.ocp_qp.riccati import riccati_factor, riccati_solve
from acados_tpu.utils.struct import pytree_dataclass, static_field


@pytree_dataclass
class AdmmOpts:
    """ADMM options (names follow OSQP where they transfer)."""

    iter_max: int = static_field(default=1000)
    rho: float = 1e-1
    sigma: float = 1e-6        # primal regularization
    alpha_relax: float = 1.6   # over-relaxation
    tol_prim: float = 1e-6
    tol_dual: float = 1e-6
    # OSQP-style adaptive rho: every `rho_update_interval` iterations
    # rho is rescaled by sqrt(r_prim / r_dual) (clipped) and the Riccati
    # factorization is redone — keeps the fixed-penalty splitting
    # scale-free (reference ocp_qp_osqp.c wraps OSQP, which does the
    # same adaptation)
    adaptive_rho: bool = static_field(default=True)
    rho_update_interval: int = static_field(default=50)
    rho_min: float = 1e-6
    rho_max: float = 1e6
    matmul_precision: str = static_field(default="highest")


@partial(jax.jit, static_argnames=())
def solve_ocp_qp_admm(qp: OcpQp, opts: AdmmOpts = None):
    """Solve one OCP-QP with structure-exploiting ADMM.

    Returns (OcpQpSol, IpmInfo) — the same contract as solve_ocp_qp, so
    the backend registry can swap it in.
    """
    if opts is None:
        opts = AdmmOpts()
    with jax.default_matmul_precision(opts.matmul_precision):
        return _solve(qp, opts)


def _solve(qp: OcpQp, opts: AdmmOpts):
    dt = qp.q.dtype
    mask = jnp.maximum(qp.mask_l, qp.mask_u)      # rows with any bound
    big = jnp.asarray(1e20, dt)
    # absolute-row form: row value t = g(w); bounds l <= t <= u
    lo = jnp.where(qp.mask_l > 0, qp.lg, -big)
    hi = jnp.where(qp.mask_u > 0, qp.ug, big)
    # per-row penalty: equality rows (l == u, e.g. the x0 rows) get the
    # OSQP-style 1e3 boost — they must be satisfied tightly
    is_eq = (qp.mask_l > 0) & (qp.mask_u > 0) & (jnp.abs(qp.ug - qp.lg)
                                                 < 1e-12)
    rho = jnp.asarray(opts.rho, dt) * jnp.where(is_eq, 1e3, 1.0)

    eye_x = jnp.eye(qp.Q.shape[-1], dtype=dt) * opts.sigma
    eye_u = jnp.eye(qp.R.shape[-1], dtype=dt) * opts.sigma

    def factorize(rho_s):
        W = rho_s * rho * mask
        WC = W[:, :, None] * qp.C
        Qb = qp.Q + eye_x + jnp.einsum("kij,kil->kjl", qp.C, WC)
        Rb = qp.R + eye_u + jnp.einsum(
            "kij,kil->kjl", qp.D, W[:-1, :, None] * qp.D)
        Sb = qp.S + jnp.einsum("kij,kil->kjl", qp.D, WC[:-1])
        return riccati_factor(Qb, Rb, Sb, qp.A, qp.B, reg_eps=0.0)

    fact = factorize(jnp.ones((), dt))

    def row_op_T(v):
        """G' v by stage."""
        cv = jnp.einsum("kij,ki->kj", qp.C, v)
        dv = jnp.einsum("kij,ki->kj", qp.D, v[:-1])
        return cv, dv

    soft = qp.soft_mask * mask

    z0 = jnp.clip(jnp.zeros_like(qp.lg), lo, hi) * mask
    y0 = jnp.zeros_like(qp.lg)
    w0 = (jnp.zeros_like(qp.q), jnp.zeros_like(qp.r),
          jnp.zeros_like(qp.b))

    def cond(carry):
        r_prim, r_dual, k = carry[3], carry[4], carry[5]
        done = (r_prim < opts.tol_prim) & (r_dual < opts.tol_dual)
        return jnp.logical_and(k < opts.iter_max, jnp.logical_not(done))

    def z_prox_s(v, rho_v):
        z_hard = jnp.clip(v, lo, hi)
        z_low = (rho_v * v + qp.zl + qp.Zl * lo) / (rho_v + qp.Zl)
        z_up = (rho_v * v - qp.zu + qp.Zu * hi) / (rho_v + qp.Zu)
        z_soft = jnp.where(v < lo - qp.zl / rho_v, z_low,
                           jnp.where(v > hi + qp.zu / rho_v, z_up,
                                     z_hard))
        return jnp.where(soft > 0, z_soft, z_hard)

    def body(carry):
        z, y, w, _, _, k, rho_s, fct = carry
        rho_v = rho * rho_s
        cv, dv = row_op_T(rho_v * mask * (y - z))
        dx, du, dpi = riccati_solve(fct, qp.A, qp.B, qp.q + cv,
                                    qp.r + dv, qp.b)
        t = _stage_g(qp, dx, du) * mask
        t_rel = opts.alpha_relax * t + (1 - opts.alpha_relax) * z
        z_new = z_prox_s(t_rel + y, rho_v) * mask
        y_new = (y + t_rel - z_new) * mask
        r_prim = jnp.max(jnp.abs((t - z_new) * mask))
        r_dual = jnp.max(rho_v * jnp.abs(z_new - z))
        if opts.adaptive_rho:
            ratio = jnp.sqrt(r_prim / jnp.maximum(r_dual, 1e-30))
            scale = jnp.clip(ratio, 0.2, 5.0)
            due = ((k + 1) % opts.rho_update_interval == 0) \
                & ((scale > 2.0) | (scale < 0.5))
            rho_s_new = jnp.where(
                due, jnp.clip(rho_s * scale, opts.rho_min / opts.rho,
                              opts.rho_max / opts.rho), rho_s)
            # scaled dual y = lam / rho: rescale to keep lam continuous
            y_new = jnp.where(due, y_new * rho_s / rho_s_new, y_new)
            fct = jax.lax.cond(due, factorize, lambda _s: fct, rho_s_new)
            rho_s = rho_s_new
        return (z_new, y_new, (dx, du, dpi), r_prim, r_dual, k + 1,
                rho_s, fct)

    (z, y, (dx, du, dpi), r_prim, r_dual, k, rho_s, _f) = \
        jax.lax.while_loop(
            cond, body,
            (z0, y0, w0, jnp.asarray(jnp.inf, dt),
             jnp.asarray(jnp.inf, dt), jnp.asarray(0, jnp.int32),
             jnp.ones((), dt), fact))

    lam = rho * rho_s * y  # scaled dual -> row multipliers
    lam_l = jnp.maximum(-lam, 0.0) * qp.mask_l
    lam_u = jnp.maximum(lam, 0.0) * qp.mask_u
    t_val = _stage_g(qp, dx, du)
    sl = jnp.maximum(lo - z, 0.0) * soft
    su = jnp.maximum(z - hi, 0.0) * soft
    sol = OcpQpSol(x=dx, u=du, pi=dpi,
                   lam_lg=lam_l, lam_ug=lam_u,
                   t_lg=t_val - qp.lg, t_ug=qp.ug - t_val,
                   sl=sl, su=su)
    converged = (r_prim < opts.tol_prim) & (r_dual < opts.tol_dual)
    info = IpmInfo(num_iter=k, mu=r_prim, res_stat=r_dual,
                   res_eq=jnp.asarray(0.0, dt), res_ineq=r_prim,
                   status=jnp.where(converged, 0, 2).astype(jnp.int32))
    return sol, info
