"""Regularization module tests.

Reference behavior being matched: the regularize hook runs between
linearization and the QP solve (ocp_nlp_sqp.c:602) and makes indefinite
exact/EXTERNAL-cost Hessians usable — MIRROR (reg_mirror.c:369), PROJECT
(reg_project.c:367), GLM (reg_glm.c:321).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acados_tpu.ocp_nlp.regularize import regularize_qp
from test_ocp_qp import random_ocp_qp


def _stage_blocks(qp):
    H = np.concatenate([
        np.concatenate([np.asarray(qp.Q[:-1]),
                        np.swapaxes(np.asarray(qp.S), -1, -2)], axis=-1),
        np.concatenate([np.asarray(qp.S), np.asarray(qp.R)], axis=-1),
    ], axis=-2)
    return H, np.asarray(qp.Q[-1])


def _make_indefinite_qp():
    qp = random_ocp_qp(jax.random.PRNGKey(0), N=6, nx=3, nu=2, nc=2)
    # flip the sign of the R block at every stage -> indefinite coupled block
    return qp.replace(R=-qp.R, Q=qp.Q.at[-1].set(-qp.Q[-1]))


class TestMatrixLevel:
    @pytest.mark.parametrize("method", ["MIRROR", "PROJECT", "GLM"])
    def test_output_positive_definite(self, method):
        qp = _make_indefinite_qp()
        out = regularize_qp(qp, method, 1e-4)
        H, Qe = _stage_blocks(out)
        for k in range(H.shape[0]):
            assert np.min(np.linalg.eigvalsh(H[k])) >= 1e-4 - 1e-10, (
                method, k)
        assert np.min(np.linalg.eigvalsh(Qe)) >= 1e-4 - 1e-10

    def test_project_keeps_psd_matrix(self):
        """PROJECT must not perturb an already-sufficiently-PD Hessian."""
        qp = random_ocp_qp(jax.random.PRNGKey(1), N=5, nx=3, nu=2, nc=2)
        out = regularize_qp(qp, "PROJECT", 1e-6)
        np.testing.assert_allclose(np.asarray(out.Q), np.asarray(qp.Q),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(out.R), np.asarray(qp.R),
                                   atol=1e-10)

    def test_mirror_flips_eigenvalues(self):
        qp = _make_indefinite_qp()
        H0, _ = _stage_blocks(qp)
        out = regularize_qp(qp, "MIRROR", 1e-8)
        H1, _ = _stage_blocks(out)
        w0 = np.linalg.eigvalsh(H0[0])
        w1 = np.sort(np.linalg.eigvalsh(H1[0]))
        np.testing.assert_allclose(w1, np.sort(np.abs(w0)), atol=1e-8)

    def test_unknown_method_raises(self):
        qp = _make_indefinite_qp()
        with pytest.raises(ValueError, match="regularize_method"):
            regularize_qp(qp, "NOT_A_METHOD", 1e-4)


def _make_nonconvex_ocp(regularize_method):
    """EXTERNAL-cost OCP with an exact Hessian that is indefinite away from
    the optimum: cost has a -cos coupling term (reference pattern:
    exact-Hessian EXTERNAL cost problems, ocp_nlp_cost_external.c)."""
    from acados_tpu import AcadosOcp

    ocp = AcadosOcp()
    m = ocp.model
    m.name = "nonconvex"
    m.x = 2
    m.u = 1
    # double integrator
    m.f_expl_expr = lambda x, u: jnp.array([x[1], u[0]])

    ocp.cost.cost_type = "EXTERNAL"
    ocp.cost.cost_type_e = "EXTERNAL"
    # nonconvex: cos(3 x0) has Hessian -9 cos(3 x0) — strongly indefinite
    m.cost_expr_ext_cost = lambda x, u: (
        x[0] ** 2 + 0.1 * x[1] ** 2 + 1e-2 * u[0] ** 2
        + 2.0 * jnp.cos(3.0 * x[0]))
    m.cost_expr_ext_cost_e = lambda x: x[0] ** 2 + 0.1 * x[1] ** 2

    ocp.constraints.x0 = np.array([1.5, 0.0])
    ocp.constraints.idxbu = np.array([0])
    ocp.constraints.lbu = np.array([-10.0])
    ocp.constraints.ubu = np.array([10.0])

    so = ocp.solver_options
    so.N_horizon = 20
    so.tf = 2.0
    so.hessian_approx = "EXACT"
    so.nlp_solver_type = "SQP"
    so.nlp_solver_max_iter = 100
    so.globalization = "MERIT_BACKTRACKING"
    so.regularize_method = regularize_method
    so.dtype = "float64"
    return ocp


class TestNlpLevel:
    @pytest.mark.parametrize("method", ["MIRROR", "PROJECT", "GLM",
                                        "CONVEXIFY"])
    def test_indefinite_external_cost_converges(self, method):
        from acados_tpu import AcadosOcpSolver

        ocp = _make_nonconvex_ocp(method)
        solver = AcadosOcpSolver(ocp)
        status = solver.solve()
        assert status == 0, (method, solver.get_residuals())
        res = solver.get_residuals()
        assert res[0] < 1e-6, (method, res)

    def test_no_regularization_fails(self):
        """The same problem NaNs (or stalls) without regularization —
        the indefinite Hessian reaches the Riccati Cholesky."""
        from acados_tpu import AcadosOcpSolver

        ocp = _make_nonconvex_ocp("NO_REGULARIZE")
        solver = AcadosOcpSolver(ocp)
        status = solver.solve()
        assert status != 0


class TestConvexify:
    def test_identity_when_reduced_hessian_convex(self):
        """The structure-preserving property (reference reg_convexify.c:
        936): stage-wise INDEFINITE Hessians whose backward cost-to-go
        blocks M_k = H_k + [A B]' P [A B] are PSD pass through CONVEXIFY
        UNCHANGED, while PROJECT modifies them."""
        from acados_tpu.ocp_nlp.regularize import regularize_qp

        qp = random_ocp_qp(jax.random.PRNGKey(3), N=4, nx=3, nu=2, nc=2)
        # indefinite stage Q blocks, heavily convex terminal: the
        # propagated P dominates, so M_k stays PSD
        Q = qp.Q.at[:-1].add(-1.8 * jnp.eye(3))
        Q = Q.at[-1].set(60.0 * jnp.eye(3))
        qp = qp.replace(Q=Q)
        Hc = regularize_qp(qp, "CONVEXIFY", 1e-8)
        Hp = regularize_qp(qp, "PROJECT", 1e-8)
        np.testing.assert_allclose(np.asarray(Hc.Q[:-1]),
                                   np.asarray(qp.Q[:-1]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(Hc.R), np.asarray(qp.R),
                                   atol=1e-8)
        # sanity: the stage blocks really are indefinite (PROJECT acts)
        assert np.max(np.abs(np.asarray(Hp.Q[:-1])
                             - np.asarray(qp.Q[:-1]))) > 1e-3

    def test_riccati_feasible_after_convexify(self):
        """After CONVEXIFY, the QP's Riccati recursion has positive
        definite Huu at every stage (solvable by the IPM)."""
        from acados_tpu.ocp_nlp.regularize import regularize_qp
        from acados_tpu.ocp_qp.ipm import IpmOpts, solve_ocp_qp

        qp = _make_indefinite_qp()
        qp_r = regularize_qp(qp, "CONVEXIFY", 1e-6)
        sol, info = solve_ocp_qp(qp_r, IpmOpts(iter_max=60))
        assert int(info.status) == 0
        assert np.all(np.isfinite(np.asarray(sol.x)))


class TestProjectReducHess:
    def test_only_R_modified_and_solvable(self):
        """PROJECT_REDUC_HESS touches only the R blocks (reference
        reg_project_reduc_hess.c applies the eigenvalue lift to RSQ's uu
        part alone) and the result solves. Scope note (shared with the
        reference): only the REDUCED (control) curvature is certified —
        terminal/state blocks pass through, so the test flips R only."""
        from acados_tpu.ocp_nlp.regularize import regularize_qp
        from acados_tpu.ocp_qp.ipm import IpmOpts, solve_ocp_qp

        qp = random_ocp_qp(jax.random.PRNGKey(0), N=6, nx=3, nu=2, nc=2)
        qp = qp.replace(R=-qp.R)    # indefinite control curvature
        qr = regularize_qp(qp, "PROJECT_REDUC_HESS", 1e-4)
        # interior S blocks untouched; R blocks lifted; Q carries only
        # the true-vs-regularized Schur gap (reference :475-479)
        np.testing.assert_array_equal(np.asarray(qr.S[1:]),
                                      np.asarray(qp.S[1:]))
        assert np.max(np.abs(np.asarray(qr.R) - np.asarray(qp.R))) > 1e-6
        assert np.all(np.isfinite(np.asarray(qr.R)))
        assert np.all(np.isfinite(np.asarray(qr.Q)))
        sol, info = solve_ocp_qp(qr, IpmOpts(iter_max=60))
        assert int(info.status) == 0
        assert np.all(np.isfinite(np.asarray(sol.x)))

    def test_identity_when_reduced_convex(self):
        """When the reduced uu blocks are already PD the method is the
        identity (same structure-preservation selling point)."""
        from acados_tpu.ocp_nlp.regularize import regularize_qp

        qp = random_ocp_qp(jax.random.PRNGKey(4), N=4, nx=3, nu=2, nc=2)
        Q = qp.Q.at[:-1].add(-1.5 * jnp.eye(3))   # indefinite Q blocks
        Q = Q.at[-1].set(50.0 * jnp.eye(3))
        qp2 = qp.replace(Q=Q)
        qr = regularize_qp(qp2, "PROJECT_REDUC_HESS", 1e-8)
        np.testing.assert_allclose(np.asarray(qr.R), np.asarray(qp2.R),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(qr.Q[1:-1]),
                                   np.asarray(qp2.Q[1:-1]), atol=1e-7)

    def test_nlp_level_converges(self):
        """u-nonconvex EXTERNAL cost (the regime PRH certifies: negative
        control curvature away from the optimum) converges with
        PROJECT_REDUC_HESS; without regularization it fails."""
        import jax.numpy as jnp

        from acados_tpu import AcadosOcpSolver
        from acados_tpu.interface.acados_ocp import AcadosModel, AcadosOcp

        def build(method):
            ocp = AcadosOcp()
            m = AcadosModel()
            m.name = "uncvx_u"
            m.x, m.u = 2, 1
            m.f_expl_expr = lambda x, u: jnp.concatenate([x[1:2], u])
            m.cost_expr_ext_cost = lambda x, u: (
                x @ x + 4.0 * (1.0 - jnp.cos(2.0 * u[0])) + 0.05 * u[0] ** 2)
            m.cost_expr_ext_cost_e = lambda x: 5.0 * (x @ x)
            ocp.model = m
            ocp.cost.cost_type = "EXTERNAL"
            ocp.cost.cost_type_e = "EXTERNAL"
            so = ocp.solver_options
            so.N_horizon = 15
            so.tf = 1.5
            so.hessian_approx = "EXACT"
            so.nlp_solver_type = "SQP"
            so.nlp_solver_max_iter = 200
            so.globalization = "MERIT_BACKTRACKING"
            so.regularize_method = method
            so.dtype = "float64"
            ocp.constraints.x0 = np.array([1.5, 0.0])
            return ocp

        s = AcadosOcpSolver(build("PROJECT_REDUC_HESS"))
        assert s.solve() == 0, s.get_residuals()
        assert s.get_residuals()[0] < 1e-6
