"""zoRO custom-update tests (reference zoro_description.py:42-103 +
custom_update_function_zoro_template.in.c): covariance propagation
matches a hand-rolled recursion and the bound backoff tightens
monotonically along the horizon."""
import numpy as np

import jax.numpy as jnp

from acados_tpu.interface.acados_ocp import AcadosModel, AcadosOcp
from acados_tpu.interface.solver import AcadosOcpSolver
from acados_tpu.interface.zoro import ZoroDescription


def make_di_ocp():
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
    # path state bound on the position (the tightened constraint)
    ocp.constraints.idxbx = np.array([0])
    ocp.constraints.lbx = np.array([-2.0])
    ocp.constraints.ubx = np.array([2.0])
    ocp.solver_options.dtype = "float64"
    return ocp


class TestZoro:
    def test_backoff_matches_hand_recursion(self):
        ocp = make_di_ocp()
        W = 1e-4 * np.eye(2)
        K = np.array([[-1.0, -1.5]])
        ocp.zoro_description = ZoroDescription(
            backoff_scaling_gamma=2.0, P0_mat=np.zeros((2, 2)), W_mat=W,
            fdbk_K_mat=K)
        s = AcadosOcpSolver(ocp)
        assert s.solve() == 0
        ub_before = s._data["ub"].copy()
        s.custom_update()
        ub_after = s._data["ub"].copy()

        # hand recursion with the exact discrete dynamics linearization
        dt = 0.1
        A = np.array([[1.0, dt], [0.0, 1.0]])
        B = np.array([[dt ** 2 / 2], [dt]])
        # the ERK4 discretization of the double integrator is exact, so
        # A, B above are the true Jacobians
        Acl = A + B @ K
        P = np.zeros((2, 2))
        backoffs = []
        for k in range(10):
            P = Acl @ P @ Acl.T + W
            backoffs.append(2.0 * np.sqrt(P[0, 0]))
        # stage k bound row 0 is the position bound; data rows 1..N-1
        got = ub_before[:, 0] - ub_after[:, 0]
        np.testing.assert_allclose(got, backoffs[:9], rtol=1e-6)
        # monotone growth of the backoff along the horizon
        assert np.all(np.diff(got) > 0)

    def test_tightened_solve_is_conservative(self):
        ocp = make_di_ocp()
        ocp.zoro_description = ZoroDescription(
            backoff_scaling_gamma=3.0, P0_mat=1e-3 * np.eye(2),
            W_mat=1e-3 * np.eye(2),
            fdbk_K_mat=np.array([[-1.0, -1.5]]))
        s = AcadosOcpSolver(ocp)
        assert s.solve() == 0
        x_nom = np.array([s.get(k, "x")[0] for k in range(11)])
        s.custom_update()
        assert s.solve() == 0
        x_rob = np.array([s.get(k, "x")[0] for k in range(11)])
        # both feasible; the robust one respects the tightened bound
        ub = 2.0
        assert np.max(x_nom) <= ub + 1e-8
        assert np.max(x_rob) <= np.max(s._data["ub"][:, 0]) + 1e-8
