"""ADMM fallback backend + QP backend registry tests (reference: OSQP
backend ocp_qp_osqp.c + the qp_solver plan enum,
ocp_qp_interface.h:60-106)."""
import numpy as np

import jax
import jax.numpy as jnp

from acados_tpu.interface.acados_ocp import AcadosModel, AcadosOcp
from acados_tpu.interface.builder import build_ocp, data_to_jax
from acados_tpu.ocp_nlp.linearize import build_static_rows, linearize
from acados_tpu.ocp_nlp.sqp import SqpOpts, init_iterate, make_sqp_solver
from acados_tpu.ocp_qp.admm import AdmmOpts, solve_ocp_qp_admm
from acados_tpu.ocp_qp.ipm import IpmOpts, solve_ocp_qp
from acados_tpu.ocp_qp.registry import (available_qp_backends,
                                        get_qp_backend,
                                        register_qp_backend)


def make_di_qp(ubu=0.5):
    """Well-conditioned double-integrator QP with an active u bound."""
    ocp = AcadosOcp()
    m = AcadosModel()
    m.name = "di"
    m.x = 2
    m.u = 1
    m.f_expl_expr = lambda x, u: jnp.array([x[1], u[0]])
    ocp.model = m
    ocp.solver_options.N_horizon = 10
    ocp.solver_options.tf = 1.0
    ocp.cost.cost_type = "NONLINEAR_LS"
    m.cost_y_expr = lambda x, u: jnp.concatenate([x, u])
    ocp.cost.yref = np.zeros(3)
    ocp.cost.W = np.diag([1.0, 1.0, 0.1])
    ocp.cost.cost_type_e = "NONLINEAR_LS"
    m.cost_y_expr_e = lambda x: x
    ocp.cost.yref_e = np.zeros(2)
    ocp.cost.W_e = np.eye(2)
    ocp.constraints.x0 = np.array([1.0, 0.0])
    ocp.constraints.lbu = np.array([-ubu])
    ocp.constraints.ubu = np.array([ubu])
    ocp.constraints.idxbu = np.array([0])
    ocp.solver_options.dtype = "float64"
    form, dnp, _ = build_ocp(ocp)
    data = data_to_jax(dnp, jnp.float64)
    init = init_iterate(form, jnp.float64,
                        x_traj=np.tile([1.0, 0.0], (11, 1)))
    qp = linearize(form, build_static_rows(form, jnp.float64), data,
                   init, jnp.asarray(0.0, jnp.float64))
    return form, data, init, qp


class TestAdmm:
    def test_matches_ipm(self):
        _, _, _, qp = make_di_qp()
        sol_ipm, info_ipm = solve_ocp_qp(qp)
        sol_admm, info_admm = solve_ocp_qp_admm(
            qp, AdmmOpts(iter_max=3000, rho=1.0))
        assert int(info_ipm.status) == 0
        np.testing.assert_allclose(np.asarray(sol_admm.x),
                                   np.asarray(sol_ipm.x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(sol_admm.u),
                                   np.asarray(sol_ipm.u), atol=1e-3)
        # the active u bound is respected
        assert np.max(np.abs(np.asarray(sol_admm.u))) <= 0.5 + 1e-6

    def test_dynamics_exact_every_iterate(self):
        """The structural claim: ADMM's w-update satisfies the dynamics
        exactly (split only over inequality rows)."""
        _, _, _, qp = make_di_qp()
        sol, _ = solve_ocp_qp_admm(qp, AdmmOpts(iter_max=50))
        gap = (np.einsum("kij,kj->ki", np.asarray(qp.A),
                         np.asarray(sol.x[:-1]))
               + np.einsum("kij,kj->ki", np.asarray(qp.B),
                           np.asarray(sol.u))
               + np.asarray(qp.b) - np.asarray(sol.x[1:]))
        assert np.max(np.abs(gap)) < 1e-10


class TestRegistry:
    def test_builtins_and_aliases(self):
        assert "RICCATI_IPM" in available_qp_backends()
        assert "ADMM" in available_qp_backends()
        # reference plan-enum names resolve
        assert get_qp_backend("PARTIAL_CONDENSING_HPIPM") is \
            get_qp_backend("RICCATI_IPM")
        assert get_qp_backend("PARTIAL_CONDENSING_OSQP") is \
            get_qp_backend("ADMM")

    def test_custom_backend_through_sqp(self):
        calls = []
        ipm = get_qp_backend("RICCATI_IPM")

        def spy(qp, opts=None, warm=None):
            calls.append(1)
            return ipm(qp, opts, warm=warm)

        register_qp_backend("SPY", spy)
        form, data, init, _ = make_di_qp()
        it, st = make_sqp_solver(
            form, SqpOpts(max_iter=30, qp_solver_name="SPY"))(data, init)
        assert int(st.status) == 0
        assert calls  # the registry backend was used


class TestScipyCrossCheck:
    def test_matches_sqp_on_pendulum(self):
        """User-facing independent cross-check solver (reference
        AcadosCasadiOcpSolver analog, acados_casadi_ocp_solver.py:41):
        same AcadosOcp, independent optimizer, same solution."""
        from acados_tpu.interface.scipy_solver import AcadosScipyOcpSolver
        from acados_tpu.interface.solver import AcadosOcpSolver
        from acados_tpu.models.pendulum import make_pendulum_ocp

        ocp = make_pendulum_ocp(dtype="float64", nlp_solver_type="SQP")
        s = AcadosOcpSolver(ocp)
        assert s.solve() == 0
        x_sqp = np.array([s.get(k, "x") for k in range(21)])

        # warm-start the oracle at the SQP solution (the reference
        # cross-check pattern): an independent optimizer started at a
        # true KKT point must stay there
        u_sqp = np.array([s.get(k, "u") for k in range(20)])
        oracle = AcadosScipyOcpSolver(ocp)
        assert oracle.solve(x_init=x_sqp, u_init=u_sqp) == 0
        x_orc = np.array([oracle.get(k, "x") for k in range(21)])
        np.testing.assert_allclose(x_sqp, x_orc, atol=1e-4)


class TestAdmmHonest:
    def test_early_termination_true_num_iter(self):
        """Residual-based while_loop: num_iter reports the ACTUAL count
        (round-2 review: the scan version always reported iter_max)."""
        _, _, _, qp = make_di_qp()
        sol, info = solve_ocp_qp_admm(qp, AdmmOpts(iter_max=3000,
                                                   rho=1.0))
        k = int(np.asarray(info.num_iter))
        assert int(np.asarray(info.status)) == 0
        assert 0 < k < 3000, k
        # a looser tolerance terminates strictly earlier
        _, info2 = solve_ocp_qp_admm(qp, AdmmOpts(
            iter_max=3000, rho=1.0, tol_prim=1e-3, tol_dual=1e-3))
        assert int(np.asarray(info2.num_iter)) < k

    def test_soft_rows_match_ipm(self):
        """Soft rows use the exact L1+L2 slack prox; solution matches
        the IPM's closed-form slack elimination."""
        from test_ocp_qp import random_ocp_qp
        qp = random_ocp_qp(jax.random.PRNGKey(11), N=6, nx=3, nu=2,
                           nc=2, soft=True, seed_scale=5.0)
        sol_ipm, info_ipm = solve_ocp_qp(qp, IpmOpts(iter_max=60))
        assert int(info_ipm.status) == 0
        sol_admm, info_admm = solve_ocp_qp_admm(
            qp, AdmmOpts(iter_max=20000, rho=1.0, tol_prim=1e-8,
                         tol_dual=1e-8))
        np.testing.assert_allclose(np.asarray(sol_admm.x),
                                   np.asarray(sol_ipm.x), atol=5e-4)
        np.testing.assert_allclose(np.asarray(sol_admm.u),
                                   np.asarray(sol_ipm.u), atol=5e-4)
        np.testing.assert_allclose(np.asarray(sol_admm.sl),
                                   np.asarray(sol_ipm.sl), atol=5e-4)
        np.testing.assert_allclose(np.asarray(sol_admm.su),
                                   np.asarray(sol_ipm.su), atol=5e-4)
