"""Formulation-taxonomy oracle tests (VERDICT round-1 item 7): every
formulation the API accepts needs a test. Covers BGP constraints
(reference ocp_nlp_constraints_bgp.c), CONL cost (ocp_nlp_cost_conl.c),
EXTERNAL cost (ocp_nlp_cost_external.c), DISCRETE dynamics
(ocp_nlp_dynamics_disc.c) — each cross-checked against an equivalent
already-tested formulation of the same NLP."""
import numpy as np

import jax.numpy as jnp

from acados_tpu.interface.acados_ocp import AcadosModel, AcadosOcp
from acados_tpu.interface.builder import build_ocp, data_to_jax
from acados_tpu.models.pendulum import make_pendulum_ocp, pendulum_ode
from acados_tpu.ocp_nlp.sqp import SqpOpts, init_iterate, make_sqp_solver
from acados_tpu.ocp_nlp.wfqp import make_wfqp_solver


def _solve(ocp, opts=None, init_x0=None, solver="sqp"):
    form, dnp, _ = build_ocp(ocp)
    data = data_to_jax(dnp, jnp.float64)
    if init_x0 is not None:
        init = init_iterate(form, jnp.float64,
                            x_traj=np.tile(init_x0, (form.N + 1, 1)))
    else:
        init = init_iterate(form, jnp.float64)
    opts = opts or SqpOpts(max_iter=100,
                           globalization="MERIT_BACKTRACKING")
    mk = make_wfqp_solver if solver == "wfqp" else make_sqp_solver
    it, st = mk(form, opts)(data, init)
    return it, st


def make_obstacle_ocp(bgp: bool):
    """Point-mass obstacle avoidance; constraint ||x||^2 >= 1 expressed
    as BGP phi(r) = r1^2 + r2^2, r = x (bgp=True) or as plain BGH h
    (bgp=False) — identical NLPs, two constraint modules."""
    ocp = AcadosOcp()
    m = AcadosModel()
    m.name = "pt"
    m.x = 2
    m.u = 2
    m.f_expl_expr = lambda x, u: u
    ocp.model = m
    ocp.solver_options.N_horizon = 20
    ocp.solver_options.tf = 4.0
    ocp.cost.cost_type = "NONLINEAR_LS"
    m.cost_y_expr = lambda x, u: jnp.concatenate(
        [x - jnp.array([2.0, 0.0]), 0.3 * u])
    ocp.cost.yref = np.zeros(4)
    ocp.cost.W = np.eye(4)
    ocp.cost.cost_type_e = "NONLINEAR_LS"
    m.cost_y_expr_e = lambda x: x - jnp.array([2.0, 0.0])
    ocp.cost.yref_e = np.zeros(2)
    ocp.cost.W_e = 10 * np.eye(2)
    ocp.constraints.x0 = np.array([-2.0, 0.01])
    if bgp:
        m.con_phi_expr = lambda r: jnp.array([r[0] ** 2 + r[1] ** 2])
        m.con_r_expr = lambda x, u: x
        ocp.constraints.lphi = np.array([1.0])
        ocp.constraints.uphi = np.array([1e10])
        m.con_phi_expr_e = m.con_phi_expr
        m.con_r_expr_e = lambda x: x
        ocp.constraints.lphi_e = np.array([1.0])
        ocp.constraints.uphi_e = np.array([1e10])
    else:
        m.con_h_expr = lambda x, u: jnp.array([x[0] ** 2 + x[1] ** 2])
        ocp.constraints.lh = np.array([1.0])
        ocp.constraints.uh = np.array([1e10])
        m.con_h_expr_e = lambda x: jnp.array([x[0] ** 2 + x[1] ** 2])
        ocp.constraints.lh_e = np.array([1.0])
        ocp.constraints.uh_e = np.array([1e10])
    ocp.solver_options.dtype = "float64"
    return ocp


class TestBgp:
    def test_matches_bgh(self):
        it_h, st_h = _solve(make_obstacle_ocp(False), solver="wfqp")
        it_p, st_p = _solve(make_obstacle_ocp(True), solver="wfqp")
        assert int(st_h.status) == 0 and int(st_p.status) == 0
        np.testing.assert_allclose(np.asarray(it_p.x), np.asarray(it_h.x),
                                   atol=1e-5)
        # constraint satisfied
        d2 = np.sum(np.asarray(it_p.x) ** 2, axis=1)
        assert np.all(d2 >= 1.0 - 1e-8)

    def test_soft_bgp(self):
        ocp = make_obstacle_ocp(True)
        ocp.constraints.idxsphi = np.array([0])
        ocp.cost.Zl = np.array([1.0])
        ocp.cost.Zu = np.array([1.0])
        ocp.cost.zl = np.array([50.0])
        ocp.cost.zu = np.array([50.0])
        it, st = _solve(ocp, solver="wfqp")
        assert int(st.status) == 0
        # with a soft obstacle the path may cut the disc slightly but the
        # penalty keeps it close
        d2 = np.sum(np.asarray(it.x) ** 2, axis=1)
        assert np.min(d2) > 0.5


def _pendulum_base(cost_type):
    ocp = make_pendulum_ocp(dtype="float64")
    nx, nu = 4, 1
    Q = 2 * np.diag([1e3, 1e3, 1e-2, 1e-2])
    R = 2 * np.diag([1e-2])
    W = np.block([[Q, np.zeros((nx, nu))], [np.zeros((nu, nx)), R]])
    m = ocp.model
    if cost_type == "CONL":
        ocp.cost.cost_type = "CONL"
        ocp.cost.cost_type_e = "CONL"
        Wj = jnp.asarray(W)
        Qj = jnp.asarray(Q)
        m.cost_psi_expr = lambda r, p: 0.5 * r @ Wj @ r
        m.cost_psi_expr_e = lambda r, p: 0.5 * r @ Qj @ r
    elif cost_type == "EXTERNAL":
        ocp.cost.cost_type = "EXTERNAL"
        ocp.cost.cost_type_e = "EXTERNAL"
        Wj = jnp.asarray(W)
        Qj = jnp.asarray(Q)
        m.cost_expr_ext_cost = lambda x, u: 0.5 * jnp.concatenate(
            [x, u]) @ Wj @ jnp.concatenate([x, u])
        m.cost_expr_ext_cost_e = lambda x: 0.5 * x @ Qj @ x
    return ocp


class TestCostModules:
    """CONL and EXTERNAL instantiations of the *same* quadratic objective
    must reproduce the NONLINEAR_LS solution (generalized GN == GN == the
    exact Hessian for a quadratic psi)."""

    def test_conl_matches_nls(self):
        x0 = np.array([0.0, np.pi, 0.0, 0.0])
        it_ref, st_ref = _solve(make_pendulum_ocp(dtype="float64"),
                                init_x0=x0)
        it_c, st_c = _solve(_pendulum_base("CONL"), init_x0=x0)
        assert int(st_ref.status) == 0 and int(st_c.status) == 0
        np.testing.assert_allclose(np.asarray(it_c.x),
                                   np.asarray(it_ref.x), atol=1e-6)

    def test_external_matches_nls(self):
        x0 = np.array([0.0, np.pi, 0.0, 0.0])
        it_ref, st_ref = _solve(make_pendulum_ocp(dtype="float64"),
                                init_x0=x0)
        it_e, st_e = _solve(_pendulum_base("EXTERNAL"), init_x0=x0)
        assert int(st_ref.status) == 0 and int(st_e.status) == 0
        np.testing.assert_allclose(np.asarray(it_e.x),
                                   np.asarray(it_ref.x), atol=1e-6)


class TestDiscreteDynamics:
    def test_discrete_rk4_matches_erk(self):
        """disc_dyn_expr = hand-rolled classical RK4 step must equal the
        ERK integrator with 4 stages / 1 step (same discretization)."""
        x0 = np.array([0.0, np.pi, 0.0, 0.0])
        ocp_c = make_pendulum_ocp(dtype="float64")
        ocp_c.solver_options.sim_method_num_stages = 4
        ocp_c.solver_options.sim_method_num_steps = 1
        it_c, st_c = _solve(ocp_c, init_x0=x0)

        dt = 1.0 / 20

        def rk4(x, u):
            f = lambda x_: pendulum_ode(x_, u, None, 0.0)
            k1 = f(x)
            k2 = f(x + 0.5 * dt * k1)
            k3 = f(x + 0.5 * dt * k2)
            k4 = f(x + dt * k3)
            return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

        ocp_d = make_pendulum_ocp(dtype="float64")
        ocp_d.model.disc_dyn_expr = rk4
        ocp_d.solver_options.integrator_type = "DISCRETE"
        it_d, st_d = _solve(ocp_d, init_x0=x0)
        assert int(st_c.status) == 0 and int(st_d.status) == 0
        np.testing.assert_allclose(np.asarray(it_d.x), np.asarray(it_c.x),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(it_d.u), np.asarray(it_c.u),
                                   atol=1e-8)
