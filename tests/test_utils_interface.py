"""Tests for the interface utility modules: penalty_utils, mpc_utils,
param_manager, plot_utils, and the standalone QP-only solver class.

Oracle style follows the reference's python example-tests
(/root/reference/examples/acados_python/tests/): exact-value checks against
independent computations.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_interface import make_ocp


class TestPenaltyUtils:
    """Reference penalty_utils.py:34,49,93 semantics."""

    def test_huber_loss_regions(self):
        from acados_tpu.interface.penalty_utils import huber_loss
        delta, tau = 0.5, 2.0
        loss, xgn = huber_loss(delta, tau)
        # quadratic region: (tau/delta) * v^2/2
        v = jnp.asarray(0.2)
        assert abs(float(loss(v)) - (tau / delta) * 0.5 * 0.04) < 1e-12
        # linear region: slope tau
        g = jax.grad(loss)(jnp.asarray(3.0))
        assert abs(float(g) - tau) < 1e-12
        g = jax.grad(loss)(jnp.asarray(-3.0))
        assert abs(float(g) + tau) < 1e-12
        # continuity at the switch
        eps = 1e-7
        assert abs(float(loss(jnp.asarray(delta - eps)))
                   - float(loss(jnp.asarray(delta + eps)))) < 1e-5

    def test_one_sided_penalty(self):
        from acados_tpu.interface.penalty_utils import one_sided_huber_penalty
        pen, grad, hess, xgn = one_sided_huber_penalty(delta=0.3, tau=1.5)
        # zero at zero, asymptotically slope ~tau for large violation
        assert abs(float(pen(jnp.asarray(0.0)))) < 1e-12
        g = float(grad(jnp.asarray(10.0)))
        assert abs(g - 1.5) < 1e-6
        # penalty negligible for satisfied constraint (u << 0)
        assert float(pen(jnp.asarray(-5.0))) < 1e-6
        # hessian positive in the ramp
        assert float(hess(jnp.asarray(0.3))[0]) > 0
        # w <-> tau equivalence: tau = 2 w delta
        pen2, *_ = one_sided_huber_penalty(delta=0.3, w=2.5)
        pen3, *_ = one_sided_huber_penalty(delta=0.3, tau=2 * 2.5 * 0.3)
        v = jnp.asarray(1.7)
        assert abs(float(pen2(v)) - float(pen3(v))) < 1e-12

    def test_symmetric_penalty(self):
        from acados_tpu.interface.penalty_utils import symmetric_huber_penalty
        pen, grad, hess, xgn = symmetric_huber_penalty(delta=0.2, tau=1.0)
        # ~zero inside the band
        assert abs(float(pen(jnp.asarray(0.0)))) < 1e-12
        inside = float(pen(jnp.asarray(0.5)))
        outside = float(pen(jnp.asarray(2.0)))
        assert outside > inside
        # symmetric
        assert abs(float(pen(jnp.asarray(1.7)))
                   - float(pen(jnp.asarray(-1.7)))) < 1e-12
        # asymptotic slope tau
        assert abs(float(grad(jnp.asarray(10.0))) - 1.0) < 1e-6
        assert float(hess(jnp.asarray(1.1))[0]) >= 0

    def test_min_hess_floor(self):
        from acados_tpu.interface.penalty_utils import one_sided_huber_penalty
        _, _, hess, xgn = one_sided_huber_penalty(delta=0.3, tau=1.0,
                                                  min_hess=0.07)
        assert float(hess(jnp.asarray(-10.0))[0]) >= 0.07
        assert float(xgn(jnp.asarray(-10.0))[0]) >= 0.07


class TestMpcUtils:
    def test_j_to_idx(self):
        from acados_tpu.interface.mpc_utils import J_to_idx
        J = np.array([[0, 1, 0], [0, 0, 1.0]])
        np.testing.assert_array_equal(J_to_idx(J), [1, 2])
        with pytest.raises(ValueError):
            J_to_idx(np.array([[0.5, 0, 0]]))

    def test_evaluator_matches_solver_cost(self):
        """evaluate_ocp_cost(solution iterate) == solver.get_cost()
        (reference mpc_utils.py:43 contract)."""
        from acados_tpu import AcadosOcpSolver
        from acados_tpu.interface.mpc_utils import \
            AcadosCostConstraintEvaluator
        ocp = make_ocp(N=10)
        solver = AcadosOcpSolver(ocp)
        assert solver.solve() == 0
        ev = AcadosCostConstraintEvaluator(make_ocp(N=10))
        xs = np.stack([solver.get(k, "x") for k in range(11)])
        us = np.stack([solver.get(k, "u") for k in range(10)])
        cost_ev = ev.evaluate_ocp_cost({"x": xs, "u": us})
        np.testing.assert_allclose(cost_ev, solver.get_cost(),
                                   rtol=1e-6, atol=1e-8)

    def test_evaluator_stage_violation(self):
        from acados_tpu.interface.mpc_utils import \
            AcadosCostConstraintEvaluator
        ev = AcadosCostConstraintEvaluator(make_ocp(N=10))
        # |u| <= 80: u = 100 violates by 20
        out = ev.evaluate(np.zeros(4), np.array([100.0]), step=1)
        assert out["violation"].max() == pytest.approx(20.0)
        out = ev.evaluate(np.zeros(4), np.array([50.0]), step=1)
        assert out["violation"].max() == pytest.approx(0.0)

    def test_create_model_with_cost_state(self):
        """Augmented cost state integrates to ~ the Lagrange cost term."""
        from acados_tpu.interface.mpc_utils import \
            create_model_with_cost_state
        from acados_tpu.sim.integrator import SimOpts, make_step_fn
        ocp = make_ocp(N=10)
        model, pv = create_model_with_cost_state(ocp)
        assert model.x == 5
        step = make_step_fn(f_expl=model.f_expl_expr, nx=5,
                            opts=SimOpts(integrator_type="ERK",
                                         num_steps=50))
        x0 = np.array([0.0, 0.1, 0.0, 0.0, 0.0])
        u0 = np.array([1.0])
        dt = 0.1
        xa = step(jnp.asarray(x0), jnp.asarray(u0), None, 0.0, dt)
        # independent quadrature of the NONLINEAR_LS running cost
        Q = 2 * np.diag([1e3, 1e3, 1e-2, 1e-2])
        R = 2 * np.diag([1e-2])

        from scipy.integrate import solve_ivp
        from test_sim import pendulum_ode

        def ode(t, s):
            xd = np.asarray(pendulum_ode(jnp.asarray(s[:4]),
                                         jnp.asarray(u0), None, t))
            y = np.concatenate([s[:4], u0])
            W = np.block([[Q, np.zeros((4, 1))], [np.zeros((1, 4)), R]])
            return np.concatenate([xd, [0.5 * y @ W @ y]])

        ref = solve_ivp(ode, (0, dt), np.concatenate([x0[:4], [0.0]]),
                        rtol=1e-10, atol=1e-10).y[:, -1]
        np.testing.assert_allclose(np.asarray(xa), ref, atol=1e-6)

    def test_detect_constraint_structure(self):
        """Linear h rows migrate to bounds / general-linear rows."""
        from acados_tpu.interface.mpc_utils import \
            detect_constraint_structure
        ocp = make_ocp(N=5)
        m, con = ocp.model, ocp.constraints
        # h = [x_2 (pure bound), x_0 + 2 u_0 (linear), sin(x_1) (nonlinear)]
        m.con_h_expr = lambda x, u: jnp.stack(
            [x[2], x[0] + 2.0 * u[0], jnp.sin(x[1])])
        con.lh = np.array([-1.0, -2.0, -0.5])
        con.uh = np.array([1.0, 2.0, 0.5])
        detect_constraint_structure(m, con, "path")
        np.testing.assert_array_equal(con.idxbx, [2])
        np.testing.assert_allclose(con.lbx, [-1.0])
        assert np.asarray(con.C).shape == (1, 4)
        np.testing.assert_allclose(np.asarray(con.C)[0], [1, 0, 0, 0])
        np.testing.assert_allclose(np.asarray(con.D)[0], [2.0])
        # one nonlinear row kept
        h = m.con_h_expr(jnp.arange(4.0), jnp.zeros(1))
        assert h.shape == (1,)
        assert abs(float(h[0]) - np.sin(1.0)) < 1e-12
        np.testing.assert_allclose(con.lh, [-0.5])


class TestParamManager:
    def test_layout_and_access(self):
        from acados_tpu.interface.param_manager import (AcadosParam,
                                                        AcadosParamManager)
        pm = AcadosParamManager([AcadosParam("mass", np.array([1.5])),
                                 AcadosParam("target", np.zeros(3))],
                                N_horizon=4)
        assert pm.np_total == 4
        pm.set_value("target", [1.0, 2.0, 3.0], stage=2)
        np.testing.assert_allclose(pm.get_value("target", 2), [1, 2, 3])
        np.testing.assert_allclose(pm.get_value("target", 1), 0)
        pm.set_value("mass", 2.0)  # all stages
        assert pm.stage_values().shape == (5, 4)
        np.testing.assert_allclose(pm.stage_values()[:, 0], 2.0)
        slc = pm.slice_fn()
        d = slc(jnp.asarray(pm.stage_values()[2]))
        np.testing.assert_allclose(np.asarray(d["target"]), [1, 2, 3])

    def test_horizon_resize(self):
        from acados_tpu.interface.param_manager import (AcadosParam,
                                                        AcadosParamManager)
        pm = AcadosParamManager([AcadosParam("a", np.array([7.0]))],
                                N_horizon=2)
        pm.N_horizon = 5
        assert pm.stage_values().shape == (6, 1)
        np.testing.assert_allclose(pm.stage_values()[:, 0], 7.0)
        pm.N_horizon = 1
        assert pm.stage_values().shape == (2, 1)


class TestOcpQpSolverClass:
    def test_solve_matches_direct_ipm(self):
        from acados_tpu.interface.ocp_qp_solver import (AcadosOcpQp,
                                                        AcadosOcpQpSolver)
        from acados_tpu.ocp_qp.ipm import IpmOpts, solve_ocp_qp
        N, nx, nu, nc = 8, 2, 1, 3
        rng = np.random.default_rng(0)
        desc = AcadosOcpQp(N, nx, nu, nc)
        A = np.array([[1.0, 0.1], [0.0, 1.0]])
        B = np.array([[0.005], [0.1]])
        for k in range(N + 1):
            desc.set(k, "Q", np.eye(nx))
            desc.set(k, "q", rng.normal(size=nx) * 0.1)
            # rows: bounds on x plus one on u
            C = np.zeros((nc, nx))
            C[0, 0] = 1.0
            C[1, 1] = 1.0
            desc.set(k, "C", C)
            desc.set(k, "lg", np.array([-1.0, -1.0, -0.5]))
            desc.set(k, "ug", np.array([1.0, 1.0, 0.5]))
            desc.set(k, "mask_l", np.ones(nc))
            desc.set(k, "mask_u", np.ones(nc))
        for k in range(N):
            desc.set(k, "R", 0.1 * np.eye(nu))
            desc.set(k, "A", A)
            desc.set(k, "B", B)
            D = np.zeros((nc, nu))
            D[2, 0] = 1.0
            desc.set(k, "D", D)
        # initial state as equality rows is implicit via lg==ug on x rows
        desc.set(0, "lg", np.array([0.8, 0.0, -0.5]))
        desc.set(0, "ug", np.array([0.8, 0.0, 0.5]))

        solver = AcadosOcpQpSolver(desc, solver="RICCATI_IPM",
                                   opts=IpmOpts())
        assert solver.solve() == 0
        sol_ref, _ = solve_ocp_qp(desc.qp, IpmOpts())
        np.testing.assert_allclose(solver.get(0, "x"),
                                   np.asarray(sol_ref.x[0]), atol=1e-10)
        np.testing.assert_allclose(solver.get(0, "x"), [0.8, 0.0],
                                   atol=1e-6)
        # ADMM backend agrees loosely
        from acados_tpu.ocp_qp.admm import AdmmOpts
        s2 = AcadosOcpQpSolver(desc, solver="ADMM",
                               opts=AdmmOpts(iter_max=3000, rho=1.0))
        assert s2.solve() == 0
        np.testing.assert_allclose(s2.get(2, "x"), solver.get(2, "x"),
                                   atol=1e-3)


class TestPlotUtils:
    def test_smoke_headless(self, tmp_path):
        mpl = pytest.importorskip("matplotlib")
        mpl.use("Agg")
        from acados_tpu.interface.plot_utils import (latexify_plot,
                                                     plot_contraction_rates,
                                                     plot_convergence,
                                                     plot_trajectories)
        latexify_plot()
        res = np.array([[1e2, 1e1], [1e0, 1e-1], [1e-4, 1e-5]])
        f1 = plot_convergence(res, labels=["stat", "eq"], show=False,
                              fig_filename=str(tmp_path / "conv.png"))
        assert (tmp_path / "conv.png").exists()
        f2 = plot_contraction_rates([res[:, 0]], labels=["run"], show=False)
        ts = np.linspace(0, 1, 11)
        X = np.random.default_rng(0).normal(size=(11, 3))
        U = np.random.default_rng(1).normal(size=(10, 1))
        f3 = plot_trajectories(ts, X, U, lbu=[-1], ubu=[1], show=False,
                               fig_filename=str(tmp_path / "traj.png"))
        assert (tmp_path / "traj.png").exists()
        import matplotlib.pyplot as plt
        plt.close("all")


class TestControlHorizon:
    def test_create_ocp_with_control_horizon(self):
        """Move-blocking (reference mpc_utils.py:665): the held-phase
        control equals the transition stage's decision variable, and the
        blocked problem costs at least as much as the free one."""
        from acados_tpu import AcadosOcpSolver
        from acados_tpu.interface.mpc_utils import \
            create_ocp_with_control_horizon
        ocp = make_ocp(N=20)
        mocp = create_ocp_with_control_horizon(make_ocp(N=20), Nc=5)
        s_free = AcadosOcpSolver(ocp)
        assert s_free.solve() == 0
        s_blk = AcadosOcpSolver(mocp)
        assert s_blk.solve() == 0
        u_t = s_blk.get(5, "u")           # transition decision
        for k in (7, 10, 15):
            np.testing.assert_allclose(s_blk.get(k, "x")[4:], u_t,
                                       atol=1e-8)
        assert s_blk.get_cost() >= s_free.get_cost() - 1e-6

    def test_nc_equals_np_passthrough(self):
        from acados_tpu.interface.mpc_utils import \
            create_ocp_with_control_horizon
        from acados_tpu.interface.acados_ocp import AcadosOcp
        out = create_ocp_with_control_horizon(make_ocp(N=10), Nc=10)
        assert isinstance(out, AcadosOcp)
        with pytest.raises(ValueError):
            create_ocp_with_control_horizon(make_ocp(N=10), Nc=11)


class TestDebugChecks:
    """Developer debug checks (reference ACADOS_DEVELOPER_DEBUG_CHECKS,
    CMakeLists.txt:81): host-side data validation before each solve."""

    def _solver(self):
        from acados_tpu.interface.solver import AcadosOcpSolver
        from acados_tpu.models.pendulum import make_pendulum_ocp

        ocp = make_pendulum_ocp(N=10, dtype="float64",
                                nlp_solver_type="SQP")
        ocp.solver_options.with_debug_checks = True
        return AcadosOcpSolver(ocp)

    def test_clean_problem_passes(self):
        s = self._solver()
        assert s.solve() == 0

    def test_nan_in_yref_caught(self):
        import numpy as np
        import pytest

        from acados_tpu.utils.debug_checks import AcadosDebugCheckError

        s = self._solver()
        yref = np.asarray(s._data["yref"]).copy()
        yref[2, 0] = np.nan
        s._data["yref"] = yref
        with pytest.raises(AcadosDebugCheckError, match="yref"):
            s.solve()

    def test_empty_box_caught(self):
        import numpy as np
        import pytest

        from acados_tpu.utils.debug_checks import AcadosDebugCheckError

        s = self._solver()
        s.set(0, "lbx", np.array([1.0, 0.0, 0.0, 0.0]))
        s.set(0, "ubx", np.array([-1.0, 0.0, 0.0, 0.0]))
        with pytest.raises(AcadosDebugCheckError, match="lb_0 > ub_0"):
            s.solve()
