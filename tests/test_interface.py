"""Interface tests: the reference getting-started example translated
mechanically to acados_tpu (minimal_example_ocp.py /
minimal_example_sim.py / minimal_example_closed_loop.py patterns)."""
import numpy as np
import pytest

import jax.numpy as jnp

from acados_tpu import (AcadosOcp, AcadosOcpBatchSolver, AcadosOcpSolver,
                        AcadosSim, AcadosSimSolver)

from test_sim import pendulum_ode


def export_pendulum_model():
    from acados_tpu import AcadosModel
    model = AcadosModel()
    model.name = "pendulum_ode"
    model.x = 4
    model.u = 1
    model.f_expl_expr = lambda x, u: pendulum_ode(x, u, None, 0.0)
    return model


def make_ocp(N=20, Tf=1.0, dtype="float64", nlp_solver_type="SQP"):
    ocp = AcadosOcp()
    model = export_pendulum_model()
    ocp.model = model
    nx, nu = 4, 1

    ocp.solver_options.N_horizon = N
    ocp.solver_options.tf = Tf

    Q_mat = 2 * np.diag([1e3, 1e3, 1e-2, 1e-2])
    R_mat = 2 * np.diag([1e-2])

    ocp.cost.cost_type = "NONLINEAR_LS"
    ocp.model.cost_y_expr = lambda x, u: jnp.concatenate([x, u])
    ocp.cost.yref = np.zeros(nx + nu)
    ocp.cost.W = np.block([[Q_mat, np.zeros((nx, nu))],
                           [np.zeros((nu, nx)), R_mat]])

    ocp.cost.cost_type_e = "NONLINEAR_LS"
    ocp.cost.yref_e = np.zeros(nx)
    ocp.model.cost_y_expr_e = lambda x: x
    ocp.cost.W_e = Q_mat

    Fmax = 80.0
    ocp.constraints.lbu = np.array([-Fmax])
    ocp.constraints.ubu = np.array([+Fmax])
    ocp.constraints.idxbu = np.array([0])
    ocp.constraints.x0 = np.array([0.0, np.pi, 0.0, 0.0])

    ocp.solver_options.hessian_approx = "GAUSS_NEWTON"
    ocp.solver_options.integrator_type = "ERK"
    ocp.solver_options.sim_method_num_steps = 2
    ocp.solver_options.nlp_solver_type = nlp_solver_type
    ocp.solver_options.dtype = dtype
    return ocp


class TestGettingStarted:
    def test_minimal_example_ocp(self):
        ocp = make_ocp()
        solver = AcadosOcpSolver(ocp)
        status = solver.solve()
        assert status == 0
        solver.print_statistics()
        # trajectory endpoints
        x0 = solver.get(0, "x")
        np.testing.assert_allclose(x0, [0, np.pi, 0, 0], atol=1e-7)
        u0 = solver.get(0, "u")
        assert abs(u0[0]) <= 80.0 + 1e-6
        res = solver.get_residuals()
        assert res[0] < 1e-6 and res[1] < 1e-6
        assert solver.get_cost() > 0

    def test_solve_for_x0_closed_loop(self):
        """Closed-loop MPC + plant sim (minimal_example_closed_loop.py)."""
        ocp = make_ocp(nlp_solver_type="SQP_RTI")
        solver = AcadosOcpSolver(ocp)

        sim = AcadosSim()
        sim.model = export_pendulum_model()
        sim.solver_options.T = 1.0 / 20
        sim.solver_options.num_steps = 4
        plant = AcadosSimSolver(sim)

        x = np.array([0.0, 0.3, 0.0, 0.0])  # small angle stabilization
        for step in range(40):
            u = solver.solve_for_x0(x, fail_on_nonzero_status=False)
            x = plant.simulate(x=x, u=u)
        # stabilized upright
        assert np.abs(x[1]) < 1e-2, x
        assert np.linalg.norm(x) < 0.1, x

    def test_iterate_roundtrip(self, tmp_path):
        ocp = make_ocp()
        solver = AcadosOcpSolver(ocp)
        assert solver.solve() == 0
        fn = str(tmp_path / "it.json")
        solver.store_iterate(fn)
        obj = solver.store_iterate_to_obj()
        solver.reset()
        solver.load_iterate(fn)
        it2 = solver.store_iterate_to_obj()
        for k in obj:
            np.testing.assert_allclose(obj[k], it2[k])
        # warm-started re-solve converges immediately
        assert solver.solve() == 0
        assert solver.get_stats("sqp_iter") <= 1

    def test_cost_and_constraint_set(self):
        ocp = make_ocp()
        solver = AcadosOcpSolver(ocp)
        solver.solve()
        u_ref = solver.get(5, "u")
        # tighten the input bound and re-solve
        solver.constraints_set(5, "lbu", np.array([-10.0]))
        solver.constraints_set(5, "ubu", np.array([10.0]))
        assert solver.solve() == 0
        u5 = solver.get(5, "u")
        assert abs(u5[0]) <= 10.0 + 1e-6
        # yref update changes the solution
        for k in range(1, 20):
            solver.cost_set(k, "yref", np.array([0.5, 0, 0, 0, 0]))
        assert solver.solve() == 0


class TestSimSolver:
    def test_minimal_example_sim(self):
        sim = AcadosSim()
        sim.model = export_pendulum_model()
        sim.solver_options.T = 0.1
        sim.solver_options.num_steps = 10
        sim.solver_options.sens_adj = True
        solver = AcadosSimSolver(sim)
        x0 = np.array([0.0, np.pi / 4, 0.0, 0.0])
        u0 = np.array([1.0])
        solver.set("seed_adj", np.ones(4))
        xn = solver.simulate(x=x0, u=u0)
        from scipy.integrate import solve_ivp
        ref = solve_ivp(lambda t, x: np.asarray(pendulum_ode(
            jnp.asarray(x), jnp.asarray(u0), None, t)), (0, 0.1), x0,
            rtol=1e-12, atol=1e-12).y[:, -1]
        np.testing.assert_allclose(xn, ref, atol=1e-8)
        S = solver.get("S_forw")
        assert S.shape == (4, 5)
        np.testing.assert_allclose(solver.get("S_adj"),
                                   np.ones(4) @ S, atol=1e-10)


class TestBatchSolver:
    def test_batch_matches_serial(self):
        """Reference parity test pattern: test_batch_solvers.py."""
        ocp = make_ocp()
        ocp.solver_options.globalization = "MERIT_BACKTRACKING"
        B = 4
        batch = AcadosOcpBatchSolver(ocp, N_batch=B)
        serial = AcadosOcpSolver(ocp)
        x0s = [np.array([0.0, np.pi, 0.0, 0.0]),
               np.array([0.1, 2.0, 0.0, 0.0]),
               np.array([0.0, 2.8, 0.1, 0.0]),
               np.array([-0.1, 2.5, 0.0, 0.1])]
        for i, x0 in enumerate(x0s):
            v = batch.ocp_solvers[i]
            # bounds + init trajectory
            v.set(0, "lbx", x0)
            v.set(0, "ubx", x0)
            for k in range(21):
                v.set(k, "x", x0)
        statuses = batch.solve()
        assert np.all(statuses == 0), statuses
        for i, x0 in enumerate(x0s):
            serial.reset()
            serial.set(0, "lbx", x0)
            serial.set(0, "ubx", x0)
            for k in range(21):
                serial.set(k, "x", x0)
            assert serial.solve() == 0
            np.testing.assert_allclose(batch.ocp_solvers[i].get(3, "x"),
                                       serial.get(3, "x"), atol=1e-8)


class TestRtiPhases:
    def test_prepare_feedback_split(self):
        """Reference RTI pattern: options_set('rti_phase', 1) -> solve()
        (preparation), inject x0, rti_phase 2 -> solve() (feedback).
        Closed loop must match the fused rti_phase=0 path."""
        ocp = make_ocp(nlp_solver_type="SQP_RTI")
        split = AcadosOcpSolver(ocp)
        fused = AcadosOcpSolver(ocp)

        sim = AcadosSim()
        sim.model = export_pendulum_model()
        sim.solver_options.T = 1.0 / 20
        sim.solver_options.num_steps = 4
        plant_a = AcadosSimSolver(sim)
        plant_b = AcadosSimSolver(sim)

        xa = xb = np.array([0.0, 0.3, 0.0, 0.0])
        for step in range(40):
            # split-phase solver (x0 set before preparation so the split
            # and fused paths see identical problems)
            split.set(0, "lbx", xa)
            split.set(0, "ubx", xa)
            split.options_set("rti_phase", 1)
            assert split.solve() == 0
            split.options_set("rti_phase", 2)
            assert split.solve() == 0
            assert split.get_stats("time_preparation") > 0
            assert split.get_stats("time_feedback") > 0
            ua = split.get(0, "u")
            # fused solver
            ub = fused.solve_for_x0(xb, fail_on_nonzero_status=False)
            xa = plant_a.simulate(x=xa, u=ua)
            xb = plant_b.simulate(x=xb, u=ub)
        assert np.abs(xa[1]) < 1e-2, xa
        np.testing.assert_allclose(xa, xb, atol=1e-6)


class TestAsRti:
    """AS-RTI levels A-D (reference ocp_nlp_sqp_rti.c:711-1139, levels
    enum ocp_nlp_sqp_rti.h:70-77): closed-loop pendulum swing-up with the
    *delayed* preparation pattern (prepare before the next measurement is
    known) — the setting the advanced-step method exists for."""

    @pytest.mark.parametrize("level,as_iter", [
        ("A", 1), ("B", 2), ("C", 1), ("D", 2)])
    def test_closed_loop_converges(self, level, as_iter):
        ocp = make_ocp(nlp_solver_type="SQP_RTI")
        ocp.solver_options.as_rti_level = level
        ocp.solver_options.as_rti_iter = as_iter
        ocp.solver_options.as_rti_advancement_strategy = "SIMULATE"
        solver = AcadosOcpSolver(ocp)

        sim = AcadosSim()
        sim.model = export_pendulum_model()
        sim.solver_options.T = 1.0 / 20
        sim.solver_options.num_steps = 4
        plant = AcadosSimSolver(sim)

        x = np.array([0.0, np.pi, 0.0, 0.0])
        fb_iters = []
        for step in range(60):
            # preparation BEFORE the new measurement (stale x0 guess in
            # the problem data; AS levels advance it internally)
            solver.options_set("rti_phase", 1)
            assert solver.solve() == 0
            # measurement arrives -> feedback
            solver.set(0, "lbx", x)
            solver.set(0, "ubx", x)
            solver.options_set("rti_phase", 2)
            assert solver.solve() == 0
            fb_iters.append(solver.get_stats("qp_iter"))
            x = plant.simulate(x=x, u=solver.get(0, "u"))
        assert np.linalg.norm(x) < 0.5, (level, x)
        # warm-started feedback must be cheap at steady state
        assert fb_iters[-1] <= 12, fb_iters[-10:]

    def test_int_level_encoding(self):
        """Reference encodes levels as ints 0..4."""
        ocp = make_ocp(nlp_solver_type="SQP_RTI")
        ocp.solver_options.as_rti_level = 0  # LEVEL_A
        solver = AcadosOcpSolver(ocp)
        assert solver.opts.as_rti_level == "A"


class TestPGlobal:
    def test_p_global_precompute(self):
        """model.p_global + p_global_precompute_fun: the precomputed
        global_data reaches every stage's callables as the parameter
        tail (reference np_global/n_global_data split,
        ocp_nlp_common.h:165-166 + p_global_precompute_fun.in.h)."""
        import jax.numpy as jnp

        from acados_tpu.interface.acados_ocp import AcadosModel, AcadosOcp
        from acados_tpu.interface.solver import AcadosOcpSolver

        ocp = AcadosOcp()
        m = AcadosModel()
        m.name = "pglob"
        m.x, m.u, m.p = 2, 1, 1          # one stage parameter
        m.p_global = 2                   # [mass, length]
        # precompute: the "expensive" derived quantity m*l^2 (inertia)
        m.p_global_precompute_fun = lambda pg: jnp.array(
            [pg[0] * pg[1] ** 2])
        # p layout: [p_stage(1) | p_global(2) | global_data(1)]

        def f_expl(x, u, p, t):
            inertia = p[3]
            return jnp.concatenate([x[1:2], (u - p[0] * x[1:2]) / inertia])

        m.f_expl_expr = f_expl
        ocp.model = m
        ocp.solver_options.N_horizon = 10
        ocp.solver_options.tf = 1.0
        ocp.solver_options.nlp_solver_type = "SQP"
        ocp.solver_options.dtype = "float64"
        ocp.parameter_values = np.array([0.1])      # stage damping
        ocp.p_global_values = np.array([1.0, 1.0])  # inertia 1.0
        ocp.constraints.x0 = np.array([1.0, 0.0])
        ocp.cost.cost_type = "LINEAR_LS"
        ocp.cost.Vx = np.vstack([np.eye(2), np.zeros((1, 2))])
        ocp.cost.Vu = np.vstack([np.zeros((2, 1)), np.eye(1)])
        ocp.cost.W = np.diag([1.0, 1.0, 0.1])
        ocp.cost.yref = np.zeros(3)
        ocp.cost.cost_type_e = "LINEAR_LS"
        ocp.cost.Vx_e = np.eye(2)
        ocp.cost.W_e = np.eye(2)
        ocp.cost.yref_e = np.zeros(2)

        s = AcadosOcpSolver(ocp)
        assert s.solve() == 0
        u_inertia1 = np.array([s.get(k, "u") for k in range(10)])

        # heavier inertia -> precompute updates -> different control
        s.set_p_global_and_precompute_dependencies(np.array([2.0, 1.5]))
        s.reset()
        assert s.solve() == 0
        u_heavy = np.array([s.get(k, "u") for k in range(10)])
        assert np.max(np.abs(u_heavy - u_inertia1)) > 1e-3
        # consistency: directly baking inertia 2*1.5^2=4.5 into p matches
        ocp2 = ocp
        s2 = AcadosOcpSolver(ocp2)
        for k in range(11):
            s2.set(k, "p", np.array([0.1, 2.0, 1.5, 4.5]))
        assert s2.solve() == 0
        u_direct = np.array([s2.get(k, "u") for k in range(10)])
        np.testing.assert_allclose(u_heavy, u_direct, atol=1e-8)
        # stage-part set preserves the global tail
        s.set(3, "p", np.array([0.7]))
        assert np.allclose(s._data["p"][3], [0.7, 2.0, 1.5, 4.5])
