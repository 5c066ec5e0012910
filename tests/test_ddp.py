"""DDP solver tests (reference ocp_nlp_ddp.c; plan enum DDP,
ocp_nlp_interface.h:51-59). Oracle style: LQR one-step exactness, DDP ==
SQP solution parity on an unconstrained swing-up, feasible-by-rollout
invariant, and rejection of constrained formulations."""
import numpy as np
import pytest

import jax.numpy as jnp

from acados_tpu.interface.acados_ocp import AcadosModel, AcadosOcp
from acados_tpu.interface.builder import build_ocp, data_to_jax
from acados_tpu.ocp_nlp.ddp import make_ddp_solver
from acados_tpu.ocp_nlp.sqp import SqpOpts, init_iterate, make_sqp_solver

from acados_tpu.models.pendulum import pendulum_ode


def make_lqr_ocp(N=10):
    ocp = AcadosOcp()
    m = AcadosModel()
    m.name = "dint"
    m.x = 2
    m.u = 1
    m.f_expl_expr = lambda x, u: jnp.array([x[1], u[0]])
    ocp.model = m
    ocp.solver_options.N_horizon = N
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
    ocp.solver_options.dtype = "float64"
    return ocp


def make_unconstrained_pendulum_ocp():
    ocp = AcadosOcp()
    m = AcadosModel()
    m.name = "pend"
    m.x = 4
    m.u = 1
    m.f_expl_expr = lambda x, u: pendulum_ode(x, u, None, 0.0)
    ocp.model = m
    ocp.solver_options.N_horizon = 20
    ocp.solver_options.tf = 1.0
    Q = 2 * np.diag([1e3, 1e3, 1e-2, 1e-2])
    ocp.cost.cost_type = "NONLINEAR_LS"
    m.cost_y_expr = lambda x, u: jnp.concatenate([x, u])
    ocp.cost.yref = np.zeros(5)
    W = np.zeros((5, 5))
    W[:4, :4] = Q
    W[4, 4] = 2.0  # meaningful control weight -> small-residual GN
    ocp.cost.W = W
    ocp.cost.cost_type_e = "NONLINEAR_LS"
    m.cost_y_expr_e = lambda x: x
    ocp.cost.yref_e = np.zeros(4)
    ocp.cost.W_e = Q
    ocp.constraints.x0 = np.array([0.0, np.pi, 0.0, 0.0])
    ocp.solver_options.sim_method_num_steps = 2
    ocp.solver_options.dtype = "float64"
    return ocp


class TestDdp:
    def test_lqr_one_iteration(self):
        """On an LQ problem DDP is exact after one backward/forward
        sweep (the Riccati step IS the solution)."""
        ocp = make_lqr_ocp()
        form, dnp, _ = build_ocp(ocp)
        data = data_to_jax(dnp, jnp.float64)
        init = init_iterate(form, jnp.float64,
                            x_traj=np.tile([1.0, 0.0], (11, 1)))
        solve = make_ddp_solver(form, SqpOpts(max_iter=30))
        it, st = solve(data, init)
        assert int(st.status) == 0
        assert int(st.sqp_iter) <= 2
        assert float(st.res_stat) < 1e-8

    def test_matches_sqp_on_swingup(self):
        """DDP and SQP must find the same KKT point on the unconstrained
        pendulum swing-up (reference test family: DDP vs SQP)."""
        ocp = make_unconstrained_pendulum_ocp()
        form, dnp, _ = build_ocp(ocp)
        data = data_to_jax(dnp, jnp.float64)
        x0 = np.array([0.0, np.pi, 0.0, 0.0])
        init = init_iterate(form, jnp.float64,
                            x_traj=np.tile(x0, (form.N + 1, 1)))
        opts = SqpOpts(max_iter=100, globalization="MERIT_BACKTRACKING")
        it_s, st_s = make_sqp_solver(form, opts)(data, init)
        it_d, st_d = make_ddp_solver(form, opts)(data, init)
        assert int(st_s.status) == 0
        assert int(st_d.status) == 0
        np.testing.assert_allclose(np.asarray(it_d.x), np.asarray(it_s.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(it_d.u), np.asarray(it_s.u),
                                   atol=1e-6)

    def test_iterates_dynamically_feasible(self):
        """After the first rollout every DDP iterate satisfies the
        discrete dynamics exactly (res_eq == 0 up to roundoff) — the
        defining DDP property (forward rollout through the true model,
        ocp_nlp_ddp.c:334-414)."""
        ocp = make_unconstrained_pendulum_ocp()
        form, dnp, _ = build_ocp(ocp)
        data = data_to_jax(dnp, jnp.float64)
        x0 = np.array([0.0, np.pi, 0.0, 0.0])
        # infeasible init: zero trajectory but x0 constraint at pi
        init = init_iterate(form, jnp.float64)
        solve = make_ddp_solver(
            form, SqpOpts(max_iter=100, globalization="MERIT_BACKTRACKING"))
        it, st = solve(data, init)
        assert float(st.res_eq) < 1e-10
        # x0 exactly at the target after the first rollout
        np.testing.assert_allclose(np.asarray(it.x[0]), x0, atol=1e-12)

    def test_rejects_constrained(self):
        ocp = make_unconstrained_pendulum_ocp()
        ocp.constraints.lbu = np.array([-80.0])
        ocp.constraints.ubu = np.array([80.0])
        ocp.constraints.idxbu = np.array([0])
        form, dnp, _ = build_ocp(ocp)
        with pytest.raises(ValueError, match="unconstrained"):
            make_ddp_solver(form, SqpOpts())
