"""Benchmark-model tests: the BASELINE.json configs solved end-to-end
(reference pattern: every example doubles as a test, SURVEY.md §4)."""
import numpy as np
import pytest

from acados_tpu import AcadosOcpSolver
from acados_tpu.models import (chain_steady_state, make_chain_mass_ocp,
                               make_quadrotor_ocp, make_race_car_ocp)


class TestChainMass:
    @pytest.mark.parametrize("n_mass", [3, 4, 5])
    def test_chain_stabilizes(self, n_mass):
        """Chain returns to rest after a perturbed start (main.py closed
        loop, shortened)."""
        ocp, xrest = make_chain_mass_ocp(n_mass=n_mass, N=20, Ts=0.2,
                                         with_wall=True)
        ocp.solver_options.nlp_solver_type = "SQP"
        ocp.solver_options.tol = 1e-5  # reference chain params nlp_tol
        solver = AcadosOcpSolver(ocp)
        rng = np.random.default_rng(50)
        x0 = xrest + 0.05 * rng.normal(size=xrest.shape)
        solver.set(0, "lbx", x0)
        solver.set(0, "ubx", x0)
        for k in range(ocp.solver_options.N_horizon + 1):
            solver.set(k, "x", x0)
        status = solver.solve()
        assert status == 0, solver.get_residuals()
        # terminal state approaches the resting state
        xN = solver.get(solver.N, "x")
        assert np.linalg.norm(xN - xrest) < np.linalg.norm(x0 - xrest)

    def test_steady_state_is_equilibrium(self):
        import jax.numpy as jnp
        from acados_tpu.models import chain_mass_ode
        xrest = chain_steady_state(5)
        f = chain_mass_ode(5)
        xdot = f(jnp.asarray(xrest), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(xdot), 0.0, atol=1e-8)


class TestRaceCar:
    def test_race_car_progresses(self):
        """RTI closed-ish loop: the car advances along s while respecting
        track and acceleration bounds (acados_settings.py config)."""
        ocp = make_race_car_ocp(N=30, Tf=0.6)
        solver = AcadosOcpSolver(ocp)
        x = np.array([-2.0, 0, 0, 0, 0, 0])
        for step in range(30):
            u = solver.solve_for_x0(x, fail_on_nonzero_status=False)
            # forward-simulate with the OCP's own integrator step
            from acados_tpu.models.race_car import race_car_ode
            import jax.numpy as jnp
            f = race_car_ode()
            dt = 0.6 / 30
            k1 = f(jnp.asarray(x), jnp.asarray(u))
            k2 = f(jnp.asarray(x) + 0.5 * dt * k1, jnp.asarray(u))
            k3 = f(jnp.asarray(x) + 0.5 * dt * k2, jnp.asarray(u))
            k4 = f(jnp.asarray(x) + dt * k3, jnp.asarray(u))
            x = np.asarray(jnp.asarray(x) + dt / 6 *
                           (k1 + 2 * k2 + 2 * k3 + k4))
            assert abs(x[1]) < 0.2, f"left the track: n = {x[1]}"
        # |a_long| <= 4 bounds progress to ~0.72 m in 0.6 s from standstill
        assert x[0] > -1.5, f"no progress: s = {x[0]}"
        assert x[3] > 0.5, f"no speed: v = {x[3]}"


class TestQuadrotor:
    def test_quadrotor_reaches_target(self):
        """SQP-RTI closed loop to a position reference with soft
        velocity/altitude constraints (BASELINE config 2)."""
        from acados_tpu import AcadosSim, AcadosSimSolver
        from acados_tpu.models.quadrotor import export_quadrotor_model

        p_ref = np.array([1.0, -1.0, 1.5])
        ocp = make_quadrotor_ocp(N=20, Tf=1.0, p_ref=p_ref)
        solver = AcadosOcpSolver(ocp)

        sim = AcadosSim()
        sim.model = export_quadrotor_model()
        sim.solver_options.T = 0.05
        sim.solver_options.num_steps = 4
        plant = AcadosSimSolver(sim)

        x = np.zeros(9)
        for step in range(60):
            u = solver.solve_for_x0(x, fail_on_nonzero_status=False)
            assert 0.1 - 1e-9 <= u[0] <= 25.0 + 1e-9
            x = plant.simulate(x=x, u=u)
            # soft altitude corridor: modest violation at most
            assert x[2] > -0.3
        assert np.linalg.norm(x[:3] - p_ref) < 0.05, x[:3]
        assert np.linalg.norm(x[3:6]) < 0.1
