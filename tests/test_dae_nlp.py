"""Algebraic variables z in the NLP layer (DAE-constrained OCP).

Reference: cost/constraints may reference z; the dynamics module passes
z + dzduxt into the QP (ocp_nlp_dynamics_cont.c:847-851, S_algebraic
sim_common.h:102-117; cost Vz ocp_nlp_cost_ls.c:243).

Oracle construction: an index-1 DAE whose algebraic equation has a
closed form (z = c * v^3) — the DAE-formulated OCP with z-dependent
cost/constraints must match the equivalent substituted ODE OCP solved
(a) by the same SQP and (b) by the independent scipy cross-check solver.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from acados_tpu.interface.acados_ocp import AcadosModel, AcadosOcp
from acados_tpu.interface.solver import AcadosOcpSolver

C_FRIC = 0.7
N, TF = 20, 2.0
X0 = np.array([1.0, 0.0])
UMAX = 2.5
ZBOUND = 0.12   # |z| bound — active along the optimized trajectory
W = np.diag([1.0, 0.5, 0.05, 0.3])  # x (2), u, z-ish term
YREF = np.zeros(4)


def _base_ocp():
    ocp = AcadosOcp()
    ocp.solver_options.N_horizon = N
    ocp.solver_options.tf = TF
    ocp.solver_options.nlp_solver_type = "SQP"
    ocp.solver_options.nlp_solver_max_iter = 60
    ocp.solver_options.dtype = "float64"
    ocp.constraints.x0 = X0
    ocp.constraints.idxbu = np.array([0])
    ocp.constraints.lbu = np.array([-UMAX])
    ocp.constraints.ubu = np.array([UMAX])
    ocp.cost.cost_type = "NONLINEAR_LS"
    ocp.cost.cost_type_e = "LINEAR_LS"
    ocp.cost.W = W
    ocp.cost.yref = YREF
    ocp.cost.Vx_e = np.eye(2)
    ocp.cost.W_e = 5.0 * np.eye(2)
    ocp.cost.yref_e = np.zeros(2)
    return ocp


def make_dae_ocp():
    """z defined by 0 = z - c v^3; cost and h reference z."""
    ocp = _base_ocp()
    m = AcadosModel()
    m.name = "dae_fric"
    m.x, m.u, m.z = 2, 1, 1

    def f_impl(xdot, x, z, u, p, t):
        return jnp.concatenate([
            xdot[:1] - x[1:2],
            xdot[1:2] - (u - z),
            z - C_FRIC * x[1:2] ** 3,
        ])

    m.f_impl_expr = f_impl
    m.cost_y_expr = lambda x, u, z: jnp.concatenate([x, u, z])
    m.con_h_expr = lambda x, u, z: z
    ocp.model = m
    ocp.constraints.lh = np.array([-ZBOUND])
    ocp.constraints.uh = np.array([ZBOUND])
    ocp.solver_options.integrator_type = "IRK"
    ocp.solver_options.sim_method_num_stages = 3
    ocp.solver_options.sim_method_num_steps = 2
    return ocp


def make_ode_ocp():
    """Equivalent ODE with z = c v^3 substituted everywhere."""
    ocp = _base_ocp()
    m = AcadosModel()
    m.name = "ode_fric"
    m.x, m.u = 2, 1

    def f_expl(x, u, p, t):
        z = C_FRIC * x[1:2] ** 3
        return jnp.concatenate([x[1:2], u - z])

    m.f_expl_expr = f_expl
    m.cost_y_expr = lambda x, u: jnp.concatenate(
        [x, u, C_FRIC * x[1:2] ** 3])
    m.con_h_expr = lambda x, u: C_FRIC * x[1:2] ** 3
    ocp.model = m
    ocp.constraints.lh = np.array([-ZBOUND])
    ocp.constraints.uh = np.array([ZBOUND])
    ocp.solver_options.integrator_type = "IRK"
    ocp.solver_options.sim_method_num_stages = 3
    ocp.solver_options.sim_method_num_steps = 2
    return ocp


class TestDaeNlp:
    def test_dae_matches_substituted_ode(self):
        s_dae = AcadosOcpSolver(make_dae_ocp())
        assert s_dae.solve() == 0
        s_ode = AcadosOcpSolver(make_ode_ocp())
        assert s_ode.solve() == 0
        x_d = np.array([s_dae.get(k, "x") for k in range(N + 1)])
        x_o = np.array([s_ode.get(k, "x") for k in range(N + 1)])
        u_d = np.array([s_dae.get(k, "u") for k in range(N)])
        u_o = np.array([s_ode.get(k, "u") for k in range(N)])
        np.testing.assert_allclose(x_d, x_o, atol=1e-5)
        np.testing.assert_allclose(u_d, u_o, atol=1e-5)
        # the z bound is genuinely active (the test exercises the z rows)
        z = np.array([s_dae.get(k, "z")[0] for k in range(N)])
        assert np.max(np.abs(z)) > 0.9 * ZBOUND
        # get(stage, 'z') is consistent with the algebraic equation up
        # to the collocation-polynomial extrapolation error at tau=0
        # (the reference's z output is the same extrapolation unless
        # exact_z_output is requested)
        v = x_d[:N, 1]
        np.testing.assert_allclose(z, C_FRIC * v ** 3, atol=1e-4)

    def test_dae_vs_scipy_oracle(self):
        """Independent general-purpose optimizer on the substituted ODE
        confirms the DAE-formulated KKT point (reference cross-check
        pattern: AcadosCasadiOcpSolver vs acados)."""
        from acados_tpu.interface.scipy_solver import AcadosScipyOcpSolver
        s_dae = AcadosOcpSolver(make_dae_ocp())
        assert s_dae.solve() == 0
        x_d = np.array([s_dae.get(k, "x") for k in range(N + 1)])
        u_d = np.array([s_dae.get(k, "u") for k in range(N)])
        oracle = AcadosScipyOcpSolver(make_ode_ocp())
        assert oracle.solve(x_init=x_d, u_init=u_d) == 0
        x_orc = np.array([oracle.get(k, "x") for k in range(N + 1)])
        np.testing.assert_allclose(x_d, x_orc, atol=1e-4)

    def test_soft_z_constraint(self):
        """Softened z rows route through the same slack machinery."""
        ocp = make_dae_ocp()
        ocp.constraints.uh = np.array([0.5 * ZBOUND])  # tighter: violated
        ocp.constraints.lh = np.array([-0.5 * ZBOUND])
        ocp.constraints.idxsh = np.array([0])
        ocp.cost.Zl = np.array([1e2])
        ocp.cost.Zu = np.array([1e2])
        ocp.cost.zl = np.array([1e1])
        ocp.cost.zu = np.array([1e1])
        s = AcadosOcpSolver(ocp)
        assert s.solve() == 0
