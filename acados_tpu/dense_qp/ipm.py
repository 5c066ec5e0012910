"""Mehrotra predictor-corrector IPM for dense QPs.

TPU-native counterpart of the reference's dense interior-point backend
(/root/reference/acados/dense_qp/dense_qp_hpipm.c:46-428 wrapping HPIPM's
d_dense_qp_ipm_solve). Same algorithm family as the OCP-structured IPM
(acados_tpu/ocp_qp/ipm.py) — identical two-sided/mask/soft-slack
elimination — but the reduced Newton system is one (nv, nv) Cholesky of
H + G' diag(W) G instead of a Riccati recursion: the right backend once
full condensing has collapsed the horizon (nv = nx + N*nu small).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from acados_tpu.dense_qp.data import DenseQp, DenseQpSol
from acados_tpu.ocp_qp.ipm import IpmInfo, IpmOpts
from acados_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class _It:
    w: jnp.ndarray
    lam_l: jnp.ndarray
    lam_u: jnp.ndarray
    t_l: jnp.ndarray
    t_u: jnp.ndarray
    sl: jnp.ndarray
    su: jnp.ndarray
    lam_sl: jnp.ndarray
    lam_su: jnp.ndarray


def _residuals(qp: DenseQp, it: _It):
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    g = qp.G @ it.w
    lam_d = ml * it.lam_l - mu_ * it.lam_u
    rw = qp.H @ it.w + qp.h - qp.G.T @ lam_d
    r_l = ml * (g + sml * it.sl - it.t_l - qp.lg)
    r_u = mu_ * (g - smu * it.su + it.t_u - qp.ug)
    r_sl = sml * (qp.zl + qp.Zl * it.sl - it.lam_l - it.lam_sl)
    r_su = smu * (qp.zu + qp.Zu * it.su - it.lam_u - it.lam_su)
    comp = (jnp.sum(ml * it.lam_l * it.t_l) + jnp.sum(mu_ * it.lam_u * it.t_u)
            + jnp.sum(sml * it.lam_sl * it.sl)
            + jnp.sum(smu * it.lam_su * it.su))
    ncomp = jnp.maximum(jnp.sum(ml) + jnp.sum(mu_) + jnp.sum(sml)
                        + jnp.sum(smu), 1.0)
    return (rw, r_l, r_u, r_sl, r_su), comp / ncomp


def _comp_inf(qp: DenseQp, it: _It):
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    return jnp.max(jnp.stack([
        jnp.max(ml * it.lam_l * it.t_l), jnp.max(mu_ * it.lam_u * it.t_u),
        jnp.max(sml * it.lam_sl * it.sl),
        jnp.max(smu * it.lam_su * it.su)]))


def _row_weights(qp: DenseQp, it: _It):
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


def _newton(qp: DenseQp, chol, it: _It, res, weights,
            rhs_cl, rhs_cu, rhs_csl, rhs_csu):
    rw, r_l, r_u, r_sl, r_su = res
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

    rhs = -(rw - qp.G.T @ gamma)
    dw = jax.scipy.linalg.cho_solve((chol, True), rhs)
    dg = qp.G @ dw

    dsl = sml * (a_l + c_l - wl * dg) / denom_l
    dsu = smu * (a_u + c_u + wu * dg) / denom_u
    dt_l = ml * (dg + dsl + r_l)
    dt_u = mu_ * (dsu - dg - r_u)
    dlam_l = ml * (rhs_cl - it.lam_l * dt_l) / it.t_l
    dlam_u = mu_ * (rhs_cu - it.lam_u * dt_u) / it.t_u
    dlam_sl = sml * (rhs_csl - it.lam_sl * dsl) / it.sl
    dlam_su = smu * (rhs_csu - it.lam_su * dsu) / it.su
    return _It(w=dw, lam_l=dlam_l, lam_u=dlam_u, t_l=dt_l, t_u=dt_u,
               sl=dsl, su=dsu, lam_sl=dlam_sl, lam_su=dlam_su)


def _max_alpha(qp: DenseQp, it: _It, d: _It, tau):
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_

    def ratio(v, dv, mm):
        bad = (dv < 0) & (mm > 0)
        r = jnp.where(bad, -v / jnp.where(bad, dv, -1.0), jnp.inf)
        return jnp.min(r)

    cands = jnp.stack([
        ratio(it.t_l, d.t_l, ml), ratio(it.t_u, d.t_u, mu_),
        ratio(it.lam_l, d.lam_l, ml), ratio(it.lam_u, d.lam_u, mu_),
        ratio(it.sl, d.sl, sml), ratio(it.su, d.su, smu),
        ratio(it.lam_sl, d.lam_sl, sml), ratio(it.lam_su, d.lam_su, smu)])
    return jnp.minimum(tau * jnp.min(cands), 1.0)


def _mu_of(qp: DenseQp, it: _It):
    _, mu = _residuals(qp, it)
    return mu


def _init(qp: DenseQp, opts: IpmOpts, warm) -> _It:
    dt = qp.h.dtype
    ml, mu_ = qp.mask_l, qp.mask_u
    sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_
    w = jnp.zeros_like(qp.h) if warm is None else warm.w
    g = qp.G @ w
    t0 = jnp.asarray(opts.t0_min, dt)
    t_l = jnp.where(ml > 0, jnp.maximum(g - qp.lg, t0), 1.0)
    t_u = jnp.where(mu_ > 0, jnp.maximum(qp.ug - g, t0), 1.0)
    lam_l = jnp.where(ml > 0, opts.mu0 / t_l, 0.0)
    lam_u = jnp.where(mu_ > 0, opts.mu0 / t_u, 0.0)
    return _It(w=w, lam_l=lam_l, lam_u=lam_u, t_l=t_l, t_u=t_u,
               sl=jnp.ones_like(t_l), su=jnp.ones_like(t_u),
               lam_sl=jnp.where(sml > 0, jnp.asarray(opts.mu0, dt), 1.0),
               lam_su=jnp.where(smu > 0, jnp.asarray(opts.mu0, dt), 1.0))


@partial(jax.jit, static_argnames=())
def solve_dense_qp(qp: DenseQp, opts: IpmOpts = None,
                   warm: DenseQpSol | None = None):
    """Solve one dense QP; vmap over a leading batch axis to batch.

    Returns (DenseQpSol, IpmInfo) — same info surface as the OCP IPM
    (reference qp_info, ocp_qp_common.h:112-122).
    """
    if opts is None:
        opts = IpmOpts()
    with jax.default_matmul_precision(opts.matmul_precision):
        return _solve_impl(qp, opts, warm)


def _solve_impl(qp: DenseQp, opts: IpmOpts, warm):
    it0 = _init(qp, opts, warm)
    dt = qp.h.dtype
    nv = qp.h.shape[0]
    eye = jnp.eye(nv, dtype=dt)
    mu_floor = jnp.maximum(jnp.asarray(opts.mu_min, dt),
                           10 * jnp.finfo(dt).eps)

    def norms(res):
        rw, r_l, r_u, r_sl, r_su = res
        rs = jnp.maximum(jnp.max(jnp.abs(rw)),
                         jnp.maximum(jnp.max(jnp.abs(r_sl)),
                                     jnp.max(jnp.abs(r_su))))
        ri = jnp.maximum(jnp.max(jnp.abs(r_l)), jnp.max(jnp.abs(r_u)))
        return rs, ri

    def err_of(rs, ri, comp):
        return jnp.max(jnp.stack([rs / opts.tol_stat, ri / opts.tol_ineq,
                                  comp / opts.tol_comp]))

    def cond(carry):
        it, best_it, best_err, k, status, done = carry
        return jnp.logical_and(k < opts.iter_max, jnp.logical_not(done))

    def body(carry):
        it, best_it, best_err, k, status, _ = carry
        res, mu = _residuals(qp, it)
        weights = _row_weights(qp, it)
        W = weights[0]
        Hb = qp.H + (qp.G.T * W) @ qp.G + opts.reg_eps * eye
        if jax.default_backend() == "tpu":
            # lane-batched Pallas Cholesky (vmap-collapsing) where the
            # kernel fits VMEM; chol_any itself falls back to XLA's
            # cholesky above ops.batched_chol._CHOL_MAX_N
            from acados_tpu.ops.batched_chol import chol_any
            chol = chol_any(Hb)
        else:
            chol = jnp.linalg.cholesky(Hb)

        ml, mu_2 = qp.mask_l, qp.mask_u
        sml, smu = qp.soft_mask * ml, qp.soft_mask * mu_2
        rhs_cl = -ml * it.lam_l * it.t_l
        rhs_cu = -mu_2 * it.lam_u * it.t_u
        rhs_csl = -sml * it.lam_sl * it.sl
        rhs_csu = -smu * it.lam_su * it.su
        d_aff = _newton(qp, chol, it, res, weights,
                        rhs_cl, rhs_cu, rhs_csl, rhs_csu)
        alpha_aff = _max_alpha(qp, it, d_aff, opts.tau)
        mu_aff = _mu_of(qp, jax.tree.map(
            lambda v, dv: v + alpha_aff * dv, it, d_aff))
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        cmu = sigma * mu
        rhs_cl = ml * (cmu - it.lam_l * it.t_l - d_aff.lam_l * d_aff.t_l)
        rhs_cu = mu_2 * (cmu - it.lam_u * it.t_u - d_aff.lam_u * d_aff.t_u)
        rhs_csl = sml * (cmu - it.lam_sl * it.sl - d_aff.lam_sl * d_aff.sl)
        rhs_csu = smu * (cmu - it.lam_su * it.su - d_aff.lam_su * d_aff.su)
        d = _newton(qp, chol, it, res, weights,
                    rhs_cl, rhs_cu, rhs_csl, rhs_csu)
        alpha = _max_alpha(qp, it, d, opts.tau)
        it_new = jax.tree.map(lambda v, dv: v + alpha * dv, it, d)

        nan = jnp.logical_not(jnp.isfinite(jnp.sum(it_new.w)))
        it_new = jax.tree.map(lambda n, o: jnp.where(nan, o, n), it_new, it)

        res_new, mu_new = _residuals(qp, it_new)
        rs, ri = norms(res_new)
        err = err_of(rs, ri, _comp_inf(qp, it_new))
        improved = err < best_err
        best_it = jax.tree.map(lambda n, o: jnp.where(improved, n, o),
                               it_new, best_it)
        best_err = jnp.where(improved, err, best_err)
        converged = err <= 1.0
        status = jnp.where(nan, 1, jnp.where(converged, 0, status))
        done = converged | nan | (mu_new < mu_floor)
        return (it_new, best_it, best_err, k + 1, status, done)

    res0, _ = _residuals(qp, it0)
    rs0, ri0 = norms(res0)
    carry0 = (it0, it0, err_of(rs0, ri0, _comp_inf(qp, it0)),
              jnp.asarray(0, jnp.int32), jnp.asarray(2, jnp.int32),
              jnp.asarray(False))
    _, it, best_err, k, status, _ = jax.lax.while_loop(cond, body, carry0)
    status = jnp.where(best_err <= 1.0, 0, status)

    res, mu = _residuals(qp, it)
    rs, ri = norms(res)
    sol = DenseQpSol(w=it.w,
                     lam_lg=it.lam_l * qp.mask_l,
                     lam_ug=it.lam_u * qp.mask_u,
                     t_lg=it.t_l, t_ug=it.t_u,
                     sl=it.sl * qp.soft_mask * qp.mask_l,
                     su=it.su * qp.soft_mask * qp.mask_u)
    info = IpmInfo(num_iter=k, mu=mu, res_stat=rs,
                   res_eq=jnp.zeros((), dt), res_ineq=ri, status=status)
    return sol, info
