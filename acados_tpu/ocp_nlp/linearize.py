"""Per-iteration QP approximation of the NLP (the SQP hot path).

TPU-native counterpart of `ocp_nlp_approximate_qp_matrices` +
`_qp_vectors_sqp` (/root/reference/acados/ocp_nlp/ocp_nlp_common.c:3016,3106):
the reference dispatches per-stage module vtables inside an OpenMP loop
(:3027-3050); here the path stages are one `jax.vmap` over a fused
linearization closure — dynamics Jacobians via `jax.jacfwd` of the
integrator step (replacing the forward VDE + S_forw -> BAbt packing of
ocp_nlp_dynamics_cont.c:789-851), cost quadratics via autodiff (replacing
CasADi Gauss-Newton/exact-Hessian functions), constraint rows via one dense
block. The result is the delta-form OcpQp consumed by the Riccati IPM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from acados_tpu.ocp_nlp.formulation import (NlpData, OcpNlpFormulation,
                                            cost_data_path, cost_data_stage0,
                                            cost_data_term)
from acados_tpu.ocp_qp.data import OcpQp
from acados_tpu.utils.struct import pytree_dataclass
from acados_tpu.utils.types import ACADOS_INFTY


@pytree_dataclass
class NlpIterate:
    """Primal-dual NLP iterate (reference iterate fields: x, u, pi, lam, sl,
    su — acados_ocp_iterate.py:40; lam is split by bound side like HPIPM)."""

    x: jnp.ndarray      # (N+1, nx)
    u: jnp.ndarray      # (N, nu)
    pi: jnp.ndarray     # (N, nx)
    lam_l: jnp.ndarray  # (N+1, nc)
    lam_u: jnp.ndarray  # (N+1, nc)
    sl: jnp.ndarray     # (N+1, nc)
    su: jnp.ndarray     # (N+1, nc)


def _pad_rows(arr, nc, axis=0):
    """Pad a per-class row-block array up to the unified nc rows."""
    pad = nc - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


def _is_mp(form) -> bool:
    """Multi-phase formulations carry `segments`; the public entry points
    below dispatch so the NLP solvers are phase-agnostic."""
    return getattr(form, "segments", None) is not None


def build_static_rows(form: OcpNlpFormulation, dtype):
    """Constant row structure: base C/D blocks, row masks, soft masks.

    Computed once per formulation (numpy -> jnp constants at trace time);
    the reference equivalent data lives in the constraints module memory
    set up at create time (ocp_nlp_constraints_bgh.c:1216 initialize).
    """
    if _is_mp(form):
        from acados_tpu.ocp_nlp.multiphase import build_static_rows_mp
        return build_static_rows_mp(form, dtype)
    nc, N = form.nc, form.N

    def cls_const(spec):
        C0, D0 = spec.base_CD(dtype)
        mask = jnp.concatenate([jnp.ones(spec.nrows, dtype),
                                jnp.zeros(nc - spec.nrows, dtype)])
        return (_pad_rows(C0, nc), _pad_rows(D0, nc), mask,
                _pad_rows(spec.soft_row_mask(dtype), nc))

    C_0, D_0, m_0, s_0 = cls_const(form.con_0)
    C_p, D_p, m_p, s_p = cls_const(form.con)
    C_e, D_e, m_e, s_e = cls_const(form.con_e)

    mask = jnp.concatenate([m_0[None], jnp.tile(m_p[None], (N - 1, 1)),
                            m_e[None]])
    soft = jnp.concatenate([s_0[None], jnp.tile(s_p[None], (N - 1, 1)),
                            s_e[None]])
    return dict(C_0=C_0, D_0=D_0, C_p=C_p, D_p=D_p, C_e=C_e, D_e=D_e,
                mask=mask, soft=soft)


def linearize(form: OcpNlpFormulation, static_rows, data: NlpData,
              it: NlpIterate, lm: jnp.ndarray) -> OcpQp:
    """Assemble the delta-form QP at the current iterate.

    lm: Levenberg-Marquardt diagonal added to the Hessian (reference
    ocp_nlp_add_levenberg_marquardt_term, ocp_nlp_common.c:2971).
    """
    if _is_mp(form):
        from acados_tpu.ocp_nlp.multiphase import linearize_mp
        return linearize_mp(form, static_rows, data, it, lm)
    N, nx, nu, nc = form.N, form.nx, form.nu, form.nc
    dt = it.x.dtype
    x, u = it.x, it.u
    eyeW = jnp.eye(nx + nu, dtype=dt)

    # ---- dynamics: A, B, b over all N intervals (one vmap) ---------------
    use_z = form.nz > 0 and form.step_jac_fn is not None
    if use_z:
        # DAE: the fused path also yields z(t0) + dz/d(x,u) per interval
        # (reference dzduxt packing, ocp_nlp_dynamics_cont.c:847-851)
        def dyn_one(xk, uk, pk, tk, dtk, xk1):
            xnext, Ak, Bk, z0k, Jzk = form.step_jac_fn(xk, uk, pk, tk,
                                                       dtk)
            return Ak, Bk, xnext - xk1, z0k, Jzk

        A, B, b, z0s, Jzs = jax.vmap(dyn_one)(
            x[:-1], u, data.p[:-1], data.ts[:-1], data.dts, x[1:])
    elif form.step_jac_fn is not None:
        # fused step+Jacobian fast path (forward VDE: one factorized
        # stage system serves all sensitivity columns — see
        # sim.irk.make_irk_step_jac)
        def dyn_one(xk, uk, pk, tk, dtk, xk1):
            xnext, Ak, Bk = form.step_jac_fn(xk, uk, pk, tk, dtk)
            return Ak, Bk, xnext - xk1

        A, B, b = jax.vmap(dyn_one)(x[:-1], u, data.p[:-1],
                                    data.ts[:-1], data.dts, x[1:])
    else:
        def dyn_one(xk, uk, pk, tk, dtk, xk1):
            w = jnp.concatenate([xk, uk])
            phi = lambda w_: form.step_fn(w_[:nx], w_[nx:], pk, tk, dtk)
            xnext = phi(w)
            J = jax.jacfwd(phi)(w)
            return J[:, :nx], J[:, nx:], xnext - xk1

        A, B, b = jax.vmap(dyn_one)(x[:-1], u, data.p[:-1],
                                    data.ts[:-1], data.dts, x[1:])

    def mk_zlin(z0k, Jzk, xk, uk):
        """Affine z model around the linearization point; AD through it
        reproduces the reference's dzduxt chain rule exactly."""
        return lambda x_, u_: (z0k + Jzk[:, :nx] @ (x_ - xk)
                               + Jzk[:, nx:] @ (u_ - uk))

    # ---- cost quadratics per stage class ---------------------------------
    exact_cost = form.exact_hessian and form.exact_hess_cost

    def cost_one(spec, cdata, xk, uk, pk, tk, scale, zlin=None, dtk=None):
        H, g = spec.quad_approx(xk, uk, pk, tk, cdata,
                                exact_cost, zlin=zlin, dt_=dtk)
        return scale * H, scale * g

    zl0 = mk_zlin(z0s[0], Jzs[0], x[0], u[0]) if use_z else None
    H0, g0 = cost_one(form.cost_0, cost_data_stage0(data), x[0], u[0],
                      data.p[0], data.ts[0], data.cost_scale[0],
                      zlin=zl0, dtk=data.dts[0])
    if use_z:
        Hp, gp = jax.vmap(
            lambda xk, uk, pk, tk, sc, yr, Wk, z0k, Jzk, dtk: cost_one(
                form.cost, {"yref": yr, "W": Wk}, xk, uk, pk, tk, sc,
                zlin=mk_zlin(z0k, Jzk, xk, uk), dtk=dtk)
        )(x[1:N], u[1:N], data.p[1:N], data.ts[1:N],
          data.cost_scale[1:N], data.yref, data.W, z0s[1:N], Jzs[1:N],
          data.dts[1:N])
    else:
        Hp, gp = jax.vmap(
            lambda xk, uk, pk, tk, sc, yr, Wk, dtk: cost_one(
                form.cost, {"yref": yr, "W": Wk}, xk, uk, pk, tk, sc,
                dtk=dtk)
        )(x[1:N], u[1:N], data.p[1:N], data.ts[1:N], data.cost_scale[1:N],
          data.yref, data.W, data.dts[1:N])
    He, ge = cost_one(form.cost_e, cost_data_term(data), x[N],
                      jnp.zeros((nu,), dt), data.p[N], data.ts[N],
                      data.cost_scale[N])

    # BGP outer-curvature term: multiplier-weighted Jr' phi'' Jr added to
    # the stage Hessian (reference ocp_nlp_constraints_bgp.c
    # update_qp_matrices — the exploitable convexity of phi(r))
    def bgp_term(spec, xk, uk, pk, tk, lam_l_k, lam_u_k):
        off = spec.nbx + spec.nbu + spec.ng + spec.nh
        # SCQP: only the UPPER-side multiplier weights the outer Hessian
        # (reference bgp.c:1303 reads lam[2(nb+ng)+nphi+i]); phi convex and
        # lam_u >= 0 keep the contribution PSD. Lower-side-active rows add
        # nothing (exact-Hessian there would be concave).
        w_phi = lam_u_k[off:off + spec.nphi]
        return spec.bgp_hess(xk, uk, pk, tk, w_phi)

    if form.con_0.nphi:
        H0 = H0 + bgp_term(form.con_0, x[0], u[0], data.p[0], data.ts[0],
                           it.lam_l[0], it.lam_u[0])
    if form.con.nphi:
        Hp = Hp + jax.vmap(lambda xk, uk, pk, tk, ll, lu: bgp_term(
            form.con, xk, uk, pk, tk, ll, lu))(
            x[1:N], u[1:N], data.p[1:N], data.ts[1:N],
            it.lam_l[1:N], it.lam_u[1:N])
    if form.con_e.nphi:
        He = He + bgp_term(form.con_e, x[N], jnp.zeros((nu,), dt),
                           data.p[N], data.ts[N], it.lam_l[N],
                           it.lam_u[N])

    # ---- EXACT mode: dynamics + constraint curvature ---------------------
    # The reference's exact Hessian adds the pi-weighted dynamics Hessian
    # (IMPL_ODE_HESS -> S_hess packed by ocp_nlp_dynamics_cont.c; toggle
    # exact_hess_dyn) and the lam-weighted constraint Hessian
    # (ocp_nlp_constraints_bgh exact-Hessian path; toggle
    # exact_hess_constr) so the SQP takes true Newton steps. BGP phi rows
    # are excluded: their curvature enters through the SCQP outer term
    # above in both modes, like the reference BGP module.
    if form.exact_hessian and form.exact_hess_dyn:
        def dyn_hess_one(xk, uk, pk, tk, dtk, pik):
            w = jnp.concatenate([xk, uk])
            f = lambda w_: pik @ form.step_fn(w_[:nx], w_[nx:], pk, tk,
                                              dtk)
            return jax.hessian(f)(w)

        Hd = jax.vmap(dyn_hess_one)(x[:-1], u, data.p[:-1], data.ts[:-1],
                                    data.dts, it.pi)
        H0 = H0 + Hd[0]
        Hp = Hp + Hd[1:]

    if form.exact_hessian and form.exact_hess_constr:
        lam_d_all = it.lam_l - it.lam_u

        def con_hess_one(spec, xk, uk, pk, tk, lam_d_k, zlin=None):
            off = spec.nbx + spec.nbu + spec.ng
            wh = lam_d_k[off:off + spec.nh]
            w = jnp.concatenate([xk, uk])

            def f(w_):
                return -jnp.dot(wh, spec._call_h(w_[:nx], w_[nx:], pk,
                                                 tk, zlin))

            return jax.hessian(f)(w)

        if form.con_0.nh:
            H0 = H0 + con_hess_one(form.con_0, x[0], u[0], data.p[0],
                                   data.ts[0], lam_d_all[0], zlin=zl0)
        if form.con.nh:
            if use_z:
                Hc = jax.vmap(
                    lambda xk, uk, pk, tk, ld, z0k, Jzk: con_hess_one(
                        form.con, xk, uk, pk, tk, ld,
                        zlin=mk_zlin(z0k, Jzk, xk, uk)))(
                    x[1:N], u[1:N], data.p[1:N], data.ts[1:N],
                    lam_d_all[1:N], z0s[1:N], Jzs[1:N])
            else:
                Hc = jax.vmap(lambda xk, uk, pk, tk, ld: con_hess_one(
                    form.con, xk, uk, pk, tk, ld))(
                    x[1:N], u[1:N], data.p[1:N], data.ts[1:N],
                    lam_d_all[1:N])
            Hp = Hp + Hc
        if form.con_e.nh:
            He = He + con_hess_one(form.con_e, x[N],
                                   jnp.zeros((nu,), dt), data.p[N],
                                   data.ts[N], lam_d_all[N])

    H_path = jnp.concatenate([H0[None], Hp], axis=0) + lm * eyeW
    g_path = jnp.concatenate([g0[None], gp], axis=0)
    Q = jnp.concatenate([H_path[:, :nx, :nx], (He[:nx, :nx] + lm *
                                               jnp.eye(nx, dtype=dt))[None]])
    S = H_path[:, nx:, :nx]
    R = H_path[:, nx:, nx:]
    q = jnp.concatenate([g_path[:, :nx], ge[:nx][None]])
    r = g_path[:, nx:]

    # ---- constraint rows ---------------------------------------------------
    def rows_one(spec, Cb, Db, xk, uk, pk, tk, zlin=None):
        gval = _pad_rows(spec.eval_rows(xk, uk, pk, tk, zlin=zlin), nc)
        C, D = Cb, Db
        if spec.nh or spec.nphi:
            Jx, Ju = spec.h_jac(xk, uk, pk, tk, zlin=zlin)
            o = spec.nbx + spec.nbu + spec.ng
            C = jax.lax.dynamic_update_slice(C, Jx, (o, 0))
            D = jax.lax.dynamic_update_slice(D, Ju, (o, 0))
        return gval, C, D

    g0v, C0, D0 = rows_one(form.con_0, static_rows["C_0"],
                           static_rows["D_0"], x[0], u[0], data.p[0],
                           data.ts[0], zlin=zl0)
    if use_z:
        gpv, Cp, Dp = jax.vmap(lambda xk, uk, pk, tk, z0k, Jzk: rows_one(
            form.con, static_rows["C_p"], static_rows["D_p"], xk, uk,
            pk, tk, zlin=mk_zlin(z0k, Jzk, xk, uk))
        )(x[1:N], u[1:N], data.p[1:N], data.ts[1:N], z0s[1:N], Jzs[1:N])
    else:
        gpv, Cp, Dp = jax.vmap(lambda xk, uk, pk, tk: rows_one(
            form.con, static_rows["C_p"], static_rows["D_p"], xk, uk,
            pk, tk)
        )(x[1:N], u[1:N], data.p[1:N], data.ts[1:N])
    gev, Ce, _De = rows_one(form.con_e, static_rows["C_e"],
                            static_rows["D_e"], x[N], jnp.zeros((nu,), dt),
                            data.p[N], data.ts[N])

    g_all = jnp.concatenate([g0v[None], gpv, gev[None]])
    C = jnp.concatenate([C0[None], Cp, Ce[None]])
    D = jnp.concatenate([D0[None], Dp])

    lb_all = jnp.concatenate([data.lb_0[None], data.lb, data.lb_e[None]])
    ub_all = jnp.concatenate([data.ub_0[None], data.ub, data.ub_e[None]])
    # per-side enables: a row is one-sided when the other bound is at
    # +-ACADOS_INFTY; in f32 a 1e10 bound absorbs O(1) updates, so the
    # absent side is masked out instead of kept at a huge value.
    exists = static_rows["mask"]
    inf_thresh = 0.5 * ACADOS_INFTY
    mask_l = exists * (lb_all > -inf_thresh)
    mask_u = exists * (ub_all < inf_thresh)
    lg = jnp.where(mask_l > 0, lb_all - g_all, -1.0)  # delta form
    ug = jnp.where(mask_u > 0, ub_all - g_all, 1.0)

    sc_all = data.cost_scale[:, None]
    Zl = jnp.concatenate([data.Zl_0[None], data.Zl, data.Zl_e[None]]) * sc_all
    Zu = jnp.concatenate([data.Zu_0[None], data.Zu, data.Zu_e[None]]) * sc_all
    zl = jnp.concatenate([data.zl_0[None], data.zl, data.zl_e[None]]) * sc_all
    zu = jnp.concatenate([data.zu_0[None], data.zu, data.zu_e[None]]) * sc_all

    return OcpQp(Q=Q, R=R, S=S, q=q, r=r, A=A, B=B, b=b, C=C, D=D,
                 lg=lg, ug=ug, mask_l=mask_l, mask_u=mask_u,
                 Zl=Zl, Zu=Zu, zl=zl, zu=zu, soft_mask=static_rows["soft"])


def _z_exact(form: OcpNlpFormulation, data: NlpData, x, u):
    """Exact z(t0) per interval for merit/trial evaluations (the
    reference updates z along dzduxt — here the stage system is
    re-solved, which is at least as accurate)."""
    return jax.vmap(lambda xk, uk, pk, tk, dtk: form.z_fun(
        xk, uk, pk, tk, dtk))(x[:-1], u, data.p[:-1], data.ts[:-1],
                              data.dts)


def _needs_z(form) -> bool:
    return form.nz > 0 and form.z_fun is not None and (
        form.con_0.with_z or form.con.with_z or form.cost_0.with_z
        or form.cost.with_z)


def eval_constraints(form: OcpNlpFormulation, data: NlpData, x, u):
    """Row values g_k(x_k, u_k) for all stages (merit / residual eval)."""
    if _is_mp(form):
        from acados_tpu.ocp_nlp.multiphase import eval_constraints_mp
        return eval_constraints_mp(form, data, x, u)
    N, nc, nu = form.N, form.nc, form.nu
    dt = x.dtype
    if _needs_z(form):
        zs = _z_exact(form, data, x, u)
        zconst = lambda zk: (lambda *_: zk)
        g0 = _pad_rows(form.con_0.eval_rows(
            x[0], u[0], data.p[0], data.ts[0], zlin=zconst(zs[0])), nc)
        gp = jax.vmap(lambda xk, uk, pk, tk, zk: _pad_rows(
            form.con.eval_rows(xk, uk, pk, tk, zlin=zconst(zk)), nc))(
            x[1:N], u[1:N], data.p[1:N], data.ts[1:N], zs[1:N])
    else:
        g0 = _pad_rows(form.con_0.eval_rows(x[0], u[0], data.p[0],
                                            data.ts[0]), nc)
        gp = jax.vmap(lambda xk, uk, pk, tk: _pad_rows(
            form.con.eval_rows(xk, uk, pk, tk), nc))(
            x[1:N], u[1:N], data.p[1:N], data.ts[1:N])
    ge = _pad_rows(form.con_e.eval_rows(x[N], jnp.zeros((nu,), dt),
                                        data.p[N], data.ts[N]), nc)
    return jnp.concatenate([g0[None], gp, ge[None]])


def eval_cost(form: OcpNlpFormulation, data: NlpData, x, u, sl, su,
              soft_mask):
    """Total NLP objective incl. soft-slack penalties (reference
    compute_fun family, e.g. ocp_nlp_cost_ls.c:1016)."""
    if _is_mp(form):
        from acados_tpu.ocp_nlp.multiphase import eval_cost_mp
        return eval_cost_mp(form, data, x, u, sl, su, soft_mask)
    N, nu = form.N, form.nu
    dt = x.dtype
    if _needs_z(form):
        zs = _z_exact(form, data, x, u)
        zconst = lambda zk: (lambda *_: zk)
        c0 = form.cost_0.value(
            x[0], u[0], data.p[0], data.ts[0], cost_data_stage0(data),
            zlin=zconst(zs[0])) * data.cost_scale[0]
        cp = jax.vmap(lambda xk, uk, pk, tk, yr, Wk, zk: form.cost.value(
            xk, uk, pk, tk, {"yref": yr, "W": Wk}, zlin=zconst(zk)))(
            x[1:N], u[1:N], data.p[1:N], data.ts[1:N], data.yref,
            data.W, zs[1:N])
    else:
        c0 = form.cost_0.value(
            x[0], u[0], data.p[0], data.ts[0], cost_data_stage0(data),
            dt_=data.dts[0]) * data.cost_scale[0]
        cp = jax.vmap(lambda xk, uk, pk, tk, yr, Wk, dtk: form.cost.value(
            xk, uk, pk, tk, {"yref": yr, "W": Wk}, dt_=dtk))(
            x[1:N], u[1:N], data.p[1:N], data.ts[1:N], data.yref, data.W,
            data.dts[1:N])
    cp = jnp.sum(cp * data.cost_scale[1:N])
    ce = form.cost_e.value(x[N], jnp.zeros((nu,), dt), data.p[N],
                           data.ts[N], cost_data_term(data)) \
        * data.cost_scale[N]
    Zl = jnp.concatenate([data.Zl_0[None], data.Zl, data.Zl_e[None]])
    Zu = jnp.concatenate([data.Zu_0[None], data.Zu, data.Zu_e[None]])
    zl = jnp.concatenate([data.zl_0[None], data.zl, data.zl_e[None]])
    zu = jnp.concatenate([data.zu_0[None], data.zu, data.zu_e[None]])
    sc = data.cost_scale[:, None] * soft_mask
    slack_cost = jnp.sum(sc * (zl * sl + 0.5 * Zl * sl ** 2
                               + zu * su + 0.5 * Zu * su ** 2))
    return c0 + cp + ce + slack_cost


def eval_dyn_gap(form: OcpNlpFormulation, data: NlpData, x, u):
    """phi(x_k, u_k) - x_{k+1} for all intervals."""
    if _is_mp(form):
        from acados_tpu.ocp_nlp.multiphase import eval_dyn_gap_mp
        return eval_dyn_gap_mp(form, data, x, u)
    nx = form.nx

    def one(xk, uk, pk, tk, dtk, xk1):
        return form.step_fn(xk, uk, pk, tk, dtk) - xk1

    return jax.vmap(one)(x[:-1], u, data.p[:-1], data.ts[:-1], data.dts,
                         x[1:])
