"""Parametric solution sensitivities of the NLP solution (differentiable MPC).

TPU-native counterpart of the reference's solution-sensitivity stack:
`ocp_nlp_common_eval_param_sens` (forward, /root/reference/acados/ocp_nlp/
ocp_nlp_common.c:4039), `eval_solution_sens_adj_p` (adjoint, :4108) and the
QP-level HPIPM seeds `d_ocp_qp_ipm_sens_frw/adj` (ocp_qp_hpipm.c:489,503),
exposed in Python as AcadosOcpSolver.eval_solution_sensitivity /
eval_adjoint_solution_sensitivity / eval_param_sens
(acados_ocp_solver.py) and batched for RL in AcadosOcpBatchSolver.

Method — implicit function theorem on the primal-dual barrier-smoothed KKT
system at the solved point (exactly HPIPM's formulation: the final
interior-point system with complementarity lam.t = mu held fixed;
`solution_sens_qp_t_lam_min` analog: lam/t clipped below for
conditioning):

  variables v = (x, u, sl, su, pi, lam_l, lam_u, t_l, t_u, lam_sl, lam_su)
  F1 (primal rows) = grad_{x,u,sl,su} L, with L the Lagrangian at fixed
     multipliers, plus the dynamics rows; F2 = inequality-definition and
     complementarity rows.
  dv/dtheta = -F_v^{-1} F_theta: eliminating the (lam, t) block turns F_v
  into the SYMMETRIC reduced KKT matrix H_bar = H_lagr + J' W J (W = lam/t
  row weights) over (x, u, pi) — one Riccati factor+solve, the same kernel
  the IPM uses. Forward sensitivities push F_theta tangents (jax.jvp)
  through the elimination; the adjoint solves the same symmetric system and
  reconstructs the (lam, t)-row cotangents analytically:
      z_comp  = -c_lam / t,     z_ineq = -W c_lam,
  where c_lam = (A12' z1)_lam is the multiplier-column component of the
  primal cotangent (derivation in repo notes; A22 = [[0,-1],[t,lam]] per
  row). Gradients w.r.t. problem data then come from one jax.vjp of the
  residual functions — every NlpData leaf (p, yref, W, bounds, slack
  penalties) is differentiable-through in one shot, where the reference
  supports parameter seeds only.

Exactness requires the exact Lagrangian Hessian (reference: solution sens
requires EXACT hessian_approx): `lagrangian_hessian` includes cost, dynamics
(pi' d2 step) and constraint (lam' d2 h) curvature via stage-wise
jax.hessian.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.ocp_nlp.formulation import (NlpData, OcpNlpFormulation,
                                            cost_data_path, cost_data_stage0,
                                            cost_data_term)
from acados_tpu.ocp_nlp.linearize import (NlpIterate, build_static_rows,
                                          eval_constraints, linearize)
from acados_tpu.ocp_qp.riccati import riccati_factor, riccati_solve
from acados_tpu.utils.struct import pytree_dataclass, static_field


@pytree_dataclass
class SensOpts:
    """t_lam_min mirrors the reference's solution_sens_qp_t_lam_min
    (ocp_nlp_common.h:337): slack/multiplier floor for the smoothed
    active-set weights."""

    t_lam_min: float = 1e-9
    reg_eps: float = 1e-11


# ---------------------------------------------------------------------------
# Exact Lagrangian Hessian (stage-separable)
# ---------------------------------------------------------------------------

def lagrangian_hessian(form: OcpNlpFormulation, data: NlpData,
                       it: NlpIterate):
    """Stage-blocked exact Hessian of the Lagrangian over w_k = (x_k, u_k).

    L_k = scale_k * cost_k(x,u) + pi_k' step_k(x,u)  (k < N)
          - (lam_l,k - lam_u,k)' g_k(x,u)
    Cross-stage terms (pi_k' x_{k+1}) are linear -> block-diagonal Hessian.
    Returns (N+1, nx+nu, nx+nu); the terminal block's u-part is zero.
    """
    N, nx, nu = form.N, form.nx, form.nu
    dt = it.x.dtype
    lam_d = it.lam_l - it.lam_u  # (N+1, nc)

    def stage_scalar(cost_spec, con_spec, cdata, pk, tk, dtk, scale,
                     pi_k, lam_k, with_dyn):
        def f(w):
            xk, uk = w[:nx], w[nx:]
            val = scale * cost_spec.value(xk, uk, pk, tk, cdata)
            if with_dyn:
                val = val + pi_k @ form.step_fn(xk, uk, pk, tk, dtk)
            g = con_spec.eval_rows(xk, uk, pk, tk)
            if g.shape[0]:
                val = val - lam_k[:g.shape[0]] @ g
            return val
        return f

    def hess_of(f, w):
        return jax.hessian(f)(w)

    w0 = jnp.concatenate([it.x[0], it.u[0]])
    H0 = hess_of(stage_scalar(form.cost_0, form.con_0, cost_data_stage0(data),
                              data.p[0], data.ts[0], data.dts[0],
                              data.cost_scale[0], it.pi[0], lam_d[0], True),
                 w0)

    def path_one(xk, uk, pk, tk, dtk, sc, yr, Wk, pik, lamk):
        w = jnp.concatenate([xk, uk])
        return hess_of(stage_scalar(form.cost, form.con,
                                    {"yref": yr, "W": Wk}, pk, tk, dtk, sc,
                                    pik, lamk, True), w)

    Hp = jax.vmap(path_one)(it.x[1:N], it.u[1:N], data.p[1:N], data.ts[1:N],
                            data.dts[1:N], data.cost_scale[1:N], data.yref,
                            data.W, it.pi[1:N], lam_d[1:N])

    wN = jnp.concatenate([it.x[N], jnp.zeros((nu,), dt)])
    HN = hess_of(stage_scalar(form.cost_e, form.con_e, cost_data_term(data),
                              data.p[N], data.ts[N], data.dts[N - 1],
                              data.cost_scale[N], jnp.zeros((nx,), dt),
                              lam_d[N], False), wN)
    return jnp.concatenate([H0[None], Hp, HN[None]])


# ---------------------------------------------------------------------------
# Residual functions of the smoothed KKT system (for jvp/vjp wrt data)
# ---------------------------------------------------------------------------

def _primal_residuals(form, static_rows, data: NlpData, it: NlpIterate):
    """F1: stationarity rows over (x, u) and dynamics rows, at fixed
    multipliers. Built from the QP linearization at the iterate (first
    derivatives only; exactness of d(F1)/d(theta) follows because
    linearize() is itself differentiated by jvp/vjp)."""
    qp = linearize(form, static_rows, data, it,
                   jnp.zeros((), it.x.dtype))
    lam_d = qp.mask_l * it.lam_l - qp.mask_u * it.lam_u
    rx = qp.q - jnp.einsum("kij,ki->kj", qp.C, lam_d)
    rx = rx.at[:-1].add(jnp.einsum("kij,ki->kj", qp.A, it.pi))
    rx = rx.at[1:].add(-it.pi)
    ru = (qp.r + jnp.einsum("kij,ki->kj", qp.B, it.pi)
          - jnp.einsum("kij,ki->kj", qp.D, lam_d[:-1]))
    r_dyn = qp.b  # step(x,u) - x_next
    # soft-slack stationarity rows: zl + Zl sl - lam_l - lam_sl
    # (lam_sl treated as eliminated unknown; theta-dependence via Zl/zl)
    r_sl = qp.zl + qp.Zl * it.sl - it.lam_l
    r_su = qp.zu + qp.Zu * it.su - it.lam_u
    return rx, ru, r_dyn, r_sl, r_su


def _ineq_values(form, data: NlpData, it: NlpIterate):
    """F2 inequality rows' theta-dependent part: g(x,u;p) - bounds."""
    g = eval_constraints(form, data, it.x, it.u)
    lb = jnp.concatenate([data.lb_0[None], data.lb, data.lb_e[None]])
    ub = jnp.concatenate([data.ub_0[None], data.ub, data.ub_e[None]])
    r_l = g - lb   # + sl - t_l = 0 defines t_l
    r_u = ub - g   # + su - t_u = 0 defines t_u
    return r_l, r_u


# ---------------------------------------------------------------------------
# The factorized smoothed-KKT solver
# ---------------------------------------------------------------------------

class KktFactor:
    """Riccati-factorized reduced KKT system at the solution, plus the row
    weights needed for elimination/reconstruction."""

    def __init__(self, form, opts: SensOpts, data: NlpData, it: NlpIterate):
        dt = it.x.dtype
        static_rows = build_static_rows(form, dt)
        self.form, self.data, self.it = form, data, it
        self.static_rows = static_rows
        qp = linearize(form, static_rows, data, it, jnp.zeros((), dt))
        self.qp = qp
        tmin = jnp.asarray(opts.t_lam_min, dt)

        r_l, r_u = _ineq_values(form, data, it)
        soft = static_rows["soft"]
        t_l = jnp.maximum(r_l + soft * it.sl, tmin)
        t_u = jnp.maximum(r_u + soft * it.su, tmin)
        lam_l = jnp.maximum(it.lam_l, tmin)
        lam_u = jnp.maximum(it.lam_u, tmin)
        ml, mu_ = qp.mask_l, qp.mask_u
        self.ml, self.mu_ = ml, mu_
        sml, smu = soft * ml, soft * mu_
        self.sml, self.smu = sml, smu
        self.t_l, self.t_u = t_l, t_u
        self.lam_l, self.lam_u = lam_l, lam_u

        wl = lam_l / t_l
        wu = lam_u / t_u
        # soft slacks: lam_sl = max(zl + Zl sl - lam_l, tmin)/... use the
        # smoothed pairing lam_sl*sl = mu -> w_sl = lam_sl/sl with
        # lam_sl from slack stationarity (>=0 at solution)
        sl_c = jnp.maximum(it.sl, tmin)
        su_c = jnp.maximum(it.su, tmin)
        lam_sl = jnp.maximum(qp.zl + qp.Zl * it.sl - lam_l, tmin)
        lam_su = jnp.maximum(qp.zu + qp.Zu * it.su - lam_u, tmin)
        wsl = lam_sl / sl_c
        wsu = lam_su / su_c
        self.denom_l = qp.Zl + wl + wsl
        self.denom_u = qp.Zu + wu + wsu
        self.wl, self.wu = wl, wu
        W_l = jnp.where(sml > 0, wl * (qp.Zl + wsl) / self.denom_l, wl)
        W_u = jnp.where(smu > 0, wu * (qp.Zu + wsu) / self.denom_u, wu)
        self.W = ml * W_l + mu_ * W_u

        # exact Lagrangian Hessian + barrier rows
        nx = form.nx
        H = lagrangian_hessian(form, data, it)
        WC = self.W[:, :, None] * qp.C
        Qb = H[:, :nx, :nx] + jnp.einsum("kij,kil->kjl", qp.C, WC)
        Rb = H[:-1, nx:, nx:] + jnp.einsum(
            "kij,kil->kjl", qp.D, self.W[:-1, :, None] * qp.D)
        Sb = H[:-1, nx:, :nx] + jnp.einsum("kij,kil->kjl", qp.D, WC[:-1])
        self.fact = riccati_factor(Qb, Rb, Sb, qp.A, qp.B,
                                   reg_eps=opts.reg_eps)

    def solve_reduced(self, rx, ru, rb):
        """Solve the symmetric reduced system K [dx;du;dpi] = -[rx;ru;rb]."""
        return riccati_solve(self.fact, self.qp.A, self.qp.B, rx, ru, rb)

    def row_gap(self, dx, du):
        dg = jnp.einsum("kij,kj->ki", self.qp.C, dx)
        return dg.at[:-1].add(jnp.einsum("kij,kj->ki", self.qp.D, du))


def forward_sensitivity(kf: KktFactor, d_data: NlpData):
    """d(solution)/d(theta) in direction d_data (a NlpData tangent).

    Mirrors d_ocp_qp_ipm_sens_frw (ocp_qp_hpipm.c:489) but for the NLP via
    IFT; returns (dx, du, dpi, dlam_l, dlam_u)."""
    form, data, it = kf.form, kf.data, kf.it

    # theta-tangents of the primal residual rows
    f1 = lambda d: _primal_residuals(form, kf.static_rows, d, it)
    rx, ru, rdyn, rsl, rsu = jax.jvp(f1, (data,), (d_data,))[1]
    f2 = lambda d: _ineq_values(form, d, it)
    dr_l, dr_u = jax.jvp(f2, (data,), (d_data,))[1]

    ml, mu_, sml, smu = kf.ml, kf.mu_, kf.sml, kf.smu
    # eliminate (dlam, dt, dslack-duals): tangent of comp rows is
    # lam dt + t dlam = 0; ineq rows: dr + J dw + dsl - dt = 0.
    # Lower side: a_l collects the constant part: dlam_l = -wl (dr_l + dg
    # + dsl); soft elimination mirrors ipm._newton_step with rhs_c = 0.
    # a_* in the IPM's row-residual convention (ipm._newton_step): the
    # upper row residual there is g - ug + ... = -(ub - g), so dr_u flips.
    a_l = -kf.wl * dr_l
    a_u = -kf.wu * dr_u
    c_l = -rsl
    c_u = -rsu
    gamma_l = jnp.where(sml > 0, a_l - kf.wl * (a_l + c_l) / kf.denom_l,
                        a_l)
    gamma_u = jnp.where(smu > 0, a_u - kf.wu * (a_u + c_u) / kf.denom_u,
                        a_u)
    gamma = ml * gamma_l - mu_ * gamma_u
    cg = jnp.einsum("kij,ki->kj", kf.qp.C, gamma)
    dgm = jnp.einsum("kij,ki->kj", kf.qp.D, gamma[:-1])
    qb = rx - cg
    rb = ru - dgm
    dx, du, dpi = kf.solve_reduced(qb, rb, rdyn)
    dg = kf.row_gap(dx, du)
    dsl = sml * (a_l + c_l - kf.wl * dg) / kf.denom_l
    dsu = smu * (a_u + c_u + kf.wu * dg) / kf.denom_u
    dt_l = ml * (dr_l + dg + dsl)
    dt_u = mu_ * (dr_u - dg + dsu)
    dlam_l = -ml * kf.wl * dt_l
    dlam_u = -mu_ * kf.wu * dt_u
    return dx, du, dpi, dlam_l, dlam_u


def adjoint_sensitivity(kf: KktFactor, seed_x, seed_u):
    """Gradient of seed_x' x*(theta) + seed_u' u*(theta) wrt all NlpData
    leaves. Mirrors eval_solution_sens_adj_p (ocp_nlp_common.c:4108) /
    d_ocp_qp_ipm_sens_adj, generalized to every data field.

    Returns an NlpData cotangent pytree."""
    form, data, it = kf.form, kf.data, kf.it

    # symmetric solve with the seed in the primal slots: solve_reduced
    # returns -K^{-1} [input], so pass -seed to get z1 = K^{-1} seed.
    z_x, z_u, z_pi = kf.solve_reduced(-seed_x, -seed_u,
                                      jnp.zeros_like(it.pi))

    # cotangent reconstruction for the eliminated rows:
    #   c_lam = (A12' z1)_lam = -(J z1)_row (- z1_sl rows for softs)
    #   z_comp = -c_lam / t,   z_ineq = -W c_lam  (per side)
    zg = kf.row_gap(z_x, z_u)
    ml, mu_, sml, smu = kf.ml, kf.mu_, kf.sml, kf.smu
    # soft-slack primal cotangents (z1 components on the sl/su stationarity
    # rows): K_red's (xu, sl) cross block is +w_l J' (lower) / -w_u J'
    # (upper) with diagonal sl block denom_l/denom_u, so
    zsl = -sml * (kf.wl * zg) / kf.denom_l
    zsu = smu * (kf.wu * zg) / kf.denom_u
    # multiplier-column components of the primal cotangent, per side
    c_lam_l = -ml * zg - sml * zsl
    c_lam_u = mu_ * zg - smu * zsu
    z_ineq_l = -kf.wl * c_lam_l * ml
    z_ineq_u = -kf.wu * c_lam_u * mu_
    # soft comp rows cotangent: z_compsl = z1_sl / sl (not needed: comp
    # rows have no theta dependence)

    # pull back through the theta-dependence of F1 and F2:
    f1 = lambda d: _primal_residuals(form, kf.static_rows, d, it)
    _, vjp1 = jax.vjp(f1, data)
    (g1,) = vjp1((z_x, z_u, z_pi, zsl, zsu))
    f2 = lambda d: _ineq_values(form, d, it)
    _, vjp2 = jax.vjp(f2, data)
    (g2,) = vjp2((z_ineq_l, z_ineq_u))
    grad = jax.tree.map(lambda a, b: -(a + b), g1, g2)
    return grad


# ---------------------------------------------------------------------------
# Differentiable solver (jax.grad through the solve)
# ---------------------------------------------------------------------------

def make_diff_solver(form: OcpNlpFormulation, opts, sens_opts=None):
    """Build solve_diff(data, init) -> (x, u) with a custom VJP.

    The TPU-native generalization of the reference's differentiable-MPC
    surface (eval_adjoint_solution_sensitivity,
    acados_ocp_batch_solver.py:227): the solver becomes a jax-transformable
    layer — `jax.grad`/`jax.vmap`/`jax.jit` compose with it, with the
    backward pass one Riccati-factored adjoint IFT solve instead of
    differentiating through SQP iterations.
    """
    from acados_tpu.ocp_nlp.sqp import make_sqp_solver

    sens_opts = sens_opts or SensOpts()
    solve = make_sqp_solver(form, opts)

    @jax.custom_vjp
    def solve_diff(data: NlpData, init: NlpIterate):
        it, _ = solve(data, init)
        return it.x, it.u

    def fwd(data, init):
        it, _ = solve(data, init)
        return (it.x, it.u), (data, it, init)

    def bwd(res, ct):
        data, it, init = res
        ct_x, ct_u = ct
        kf = KktFactor(form, sens_opts, data, it)
        grad = adjoint_sensitivity(kf, ct_x, ct_u)
        # solution is independent of the warm start at convergence
        return grad, jax.tree.map(jnp.zeros_like, init)

    solve_diff.defvjp(fwd, bwd)
    return solve_diff


# ---------------------------------------------------------------------------
# Optimal-value gradient (envelope theorem)
# ---------------------------------------------------------------------------

def eval_lagrange_grad_p(form: OcpNlpFormulation, data: NlpData,
                         it: NlpIterate):
    """Gradient of the Lagrangian wrt the stage parameters at fixed
    primal-dual point — by the envelope theorem this equals the optimal-
    value gradient dV/dp when `it` is a converged KKT point.

    Mirrors `eval_lagr_grad_p` (/root/reference/acados/ocp_nlp/
    ocp_nlp_common.c:4181, Python: AcadosOcpSolver.
    eval_and_get_optimal_value_gradient). Returns (N+1, np) per-stage
    gradients; sum over stages for a global parameter.
    """
    from acados_tpu.ocp_nlp.linearize import eval_cost, eval_dyn_gap
    from acados_tpu.utils.types import ACADOS_INFTY

    dt = it.x.dtype
    static_rows = build_static_rows(form, dt)
    soft_scaled = static_rows["soft"] * static_rows["mask"]
    lb_all = jnp.concatenate([data.lb_0[None], data.lb, data.lb_e[None]])
    ub_all = jnp.concatenate([data.ub_0[None], data.ub, data.ub_e[None]])
    thr = 0.5 * ACADOS_INFTY
    ml = static_rows["mask"] * (lb_all > -thr)
    mu_ = static_rows["mask"] * (ub_all < thr)
    lam_d = ml * it.lam_l - mu_ * it.lam_u

    def lagr(p_all):
        d = data.replace(p=p_all)
        cost = eval_cost(form, d, it.x, it.u, it.sl, it.su, soft_scaled)
        gap = eval_dyn_gap(form, d, it.x, it.u)
        g = eval_constraints(form, d, it.x, it.u)
        # L = f + pi'(phi - x+) - lam_l'(g - lb) - lam_u'(ub - g)
        return (cost + jnp.sum(it.pi * gap) - jnp.sum(lam_d * g))

    return jax.grad(lagr)(data.p)


def optimal_value_grad_x0(form: OcpNlpFormulation, data: NlpData,
                          it: NlpIterate):
    """dV/dx0 at the solution: the multipliers of the initial-state
    equality rows (reference eval_and_get_optimal_value_gradient with
    with_respect_to='initial_state'). Requires idxbx_0 == full state."""
    nbx0 = len(form.con_0.idxbx)
    lam = (it.lam_l[0, :nbx0] - it.lam_u[0, :nbx0])
    return lam
