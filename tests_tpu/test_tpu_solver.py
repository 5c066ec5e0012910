"""End-to-end f32 production solves on the chip (VERDICT r4 item 4):
pendulum and chain-of-masses RTI to their steady states, asserting the
same in-tolerance contract the bench claims — so a kernel or IPM
regression fails tests, not just the benchmark trend.
"""
import numpy as np

import jax
import jax.numpy as jnp


def _steady_state(make_ocp, x0_center, B=64, warm=15, **kw):
    from acados_tpu.interface.builder import (StageLayout, build_ocp,
                                              data_to_jax)
    from acados_tpu.interface.solver import _sqp_opts_from
    from acados_tpu.ocp_nlp.sqp import init_iterate, make_sqp_solver

    out = make_ocp(**kw)
    ocp = out[0] if isinstance(out, tuple) else out
    form, data_np, _ = build_ocp(ocp)
    opts = _sqp_opts_from(ocp)
    solve = jax.jit(jax.vmap(make_sqp_solver(form, opts)))
    data1 = data_to_jax(data_np, jnp.float32)
    data = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                        data1)
    rng = np.random.default_rng(0)
    nbx0 = len(form.con_0.idxbx)
    x0s = (np.asarray(x0_center)[None, :]
           + rng.normal(0.0, 0.02, (B, nbx0))).astype(np.float32)
    lay = StageLayout(form.con_0)
    lb_0 = np.tile(np.asarray(data1.lb_0), (B, 1))
    ub_0 = np.tile(np.asarray(data1.ub_0), (B, 1))
    lb_0[:, lay.off_bx:lay.off_bx + nbx0] = x0s
    ub_0[:, lay.off_bx:lay.off_bx + nbx0] = x0s
    data = data.replace(lb_0=jnp.asarray(lb_0), ub_0=jnp.asarray(ub_0))
    init1 = init_iterate(form, jnp.float32)
    init = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                        init1)
    nx = form.nx
    x_full = np.tile(np.asarray(data_np["lb_0"])[None, None, :nx],
                     (B, form.N + 1, 1)).astype(np.float32)
    x_full[:, :, form.con_0.idxbx] = x0s[:, None, :]
    init = init.replace(x=jnp.asarray(x_full))
    it = init
    for _ in range(warm):
        it, stats = solve(data, it)
    jax.block_until_ready(stats.res_stat)
    _ = np.asarray(stats.res_stat)  # true fence on the axon tunnel
    return stats, ocp


class TestProductionRti:
    def test_pendulum_steady_state_in_tolerance(self):
        from acados_tpu.models.pendulum import make_pendulum_ocp

        stats, ocp = _steady_state(make_pendulum_ocp,
                                   [0.0, np.pi, 0.0, 0.0], N=20,
                                   dtype="float32",
                                   nlp_solver_type="SQP_RTI")
        so = ocp.solver_options
        assert np.all(np.asarray(stats.status) == 0)
        assert float(np.max(np.asarray(stats.res_stat))) \
            <= so.nlp_solver_tol_stat
        assert float(np.max(np.asarray(stats.res_eq))) \
            <= so.nlp_solver_tol_eq

    def test_chain_steady_state_in_tolerance(self):
        from acados_tpu.models.chain_mass import (chain_steady_state,
                                                  make_chain_mass_ocp)

        xrest = chain_steady_state(8)
        stats, ocp = _steady_state(make_chain_mass_ocp, xrest, B=32,
                                   n_mass=8, N=40, dtype="float32")
        # declared f32 chain floor (bench.py _CHAIN_TOLS rationale)
        assert np.all(np.asarray(stats.status) == 0)
        assert float(np.max(np.asarray(stats.res_stat))) <= 1e-2
        assert float(np.max(np.asarray(stats.res_eq))) <= 1e-4


class TestBreadthModelsOnChip:
    """f32 steady states for the remaining BASELINE.json configs the
    bench exercises (VERDICT r4 item 7): quadrotor + race car."""

    def test_quadrotor_steady_state_in_tolerance(self):
        from acados_tpu.models.quadrotor import make_quadrotor_ocp

        stats, ocp = _steady_state(make_quadrotor_ocp, np.zeros(9),
                                   B=32, warm=20, N=20, dtype="float32")
        assert np.all(np.asarray(stats.status) == 0)
        # bench _QUAD_TOLS floors
        assert float(np.max(np.asarray(stats.res_stat))) <= 5e-3
        assert float(np.max(np.asarray(stats.res_eq))) <= 1e-4

    def test_race_car_steady_state_in_tolerance(self):
        from acados_tpu.models.race_car import make_race_car_ocp

        stats, ocp = _steady_state(make_race_car_ocp, np.zeros(6),
                                   B=32, warm=20, N=30, Tf=0.6,
                                   dtype="float32")
        assert np.all(np.asarray(stats.status) == 0)
        assert float(np.max(np.asarray(stats.res_stat))) <= 5e-3
        assert float(np.max(np.asarray(stats.res_eq))) <= 1e-4

    def test_pendulum_irk_canonical_in_tolerance(self):
        """THE canonical reference config (BASELINE.json config 1):
        pendulum with IRK GL4 — the bench's pendulum_irk_rti entry."""
        from acados_tpu.models.pendulum import make_pendulum_ocp

        stats, ocp = _steady_state(make_pendulum_ocp,
                                   [0.0, np.pi, 0.0, 0.0], N=20,
                                   dtype="float32",
                                   nlp_solver_type="SQP_RTI",
                                   integrator_type="IRK")
        so = ocp.solver_options
        assert np.all(np.asarray(stats.status) == 0)
        assert float(np.max(np.asarray(stats.res_stat))) \
            <= so.nlp_solver_tol_stat
        assert float(np.max(np.asarray(stats.res_eq))) \
            <= so.nlp_solver_tol_eq


class TestLatencyRegimeOnChip:
    def test_b8_long_horizon_solves(self):
        """The latency-regime shape (B=8, N=128) the bench's latency
        entries measure — asserted in tolerance on chip, not just
        timed."""
        from acados_tpu.models.pendulum import make_pendulum_ocp

        stats, ocp = _steady_state(make_pendulum_ocp,
                                   [0.0, np.pi, 0.0, 0.0], B=8,
                                   warm=25, N=128, Tf=1.0,
                                   dtype="float32",
                                   nlp_solver_type="SQP_RTI")
        assert np.all(np.asarray(stats.status) == 0)
        # bench _LONGH_TOLS
        assert float(np.max(np.asarray(stats.res_stat))) <= 1e-1
        assert float(np.max(np.asarray(stats.res_eq))) <= 1e-4


class TestBatchedRtiPhasesOnChip:
    def test_prepare_feedback_f32(self):
        """Batched prepare/feedback (the deployment split) on the chip:
        converges to the same steady-state contract as the fused
        solve."""
        from acados_tpu.interface.batch_solver import AcadosOcpBatchSolver
        from acados_tpu.models.pendulum import make_pendulum_ocp

        B, N = 16, 20
        ocp = make_pendulum_ocp(N=N, dtype="float32",
                                nlp_solver_type="SQP_RTI")
        bs = AcadosOcpBatchSolver(ocp, B)
        rng = np.random.default_rng(5)
        x0s = (np.array([0.0, np.pi, 0.0, 0.0])[None, :]
               + rng.normal(0.0, 0.02, (B, 4))).astype(np.float32)
        lay = bs._layout(0)
        sl = slice(lay.off_bx, lay.off_bx + lay.nbx)
        bs._data["lb_0"][:, sl] = x0s
        bs._data["ub_0"][:, sl] = x0s
        bs.set_flat("x", np.tile(x0s[:, None, :],
                                 (1, N + 1, 1)).reshape(B, -1))
        for _ in range(15):
            bs.prepare()
            status = bs.feedback(x0=x0s)
        assert np.all(status == 0)
        so = ocp.solver_options
        assert float(np.max(np.asarray(bs._stats.res_stat))) \
            <= so.nlp_solver_tol_stat
        assert float(np.max(np.asarray(bs._stats.res_eq))) \
            <= so.nlp_solver_tol_eq


class TestBatchedPhaseTimesOnChip:
    def test_fused_differencing_vs_measured(self):
        """Batched get_stats('time_lin'/'time_qp') (fused differencing)
        against the single-instance isolated-re-execution estimate on
        the same problem. (The MEASURED path — ordered io_callback at
        the phase boundaries, collect_phase_times — hangs on the axon
        TPU tunnel: host callbacks do not round-trip; it is validated
        on CPU by tests/test_options.py. Here the cross-check is
        between the two device-program estimates.)"""
        from acados_tpu.interface.batch_solver import AcadosOcpBatchSolver
        from acados_tpu.interface.solver import AcadosOcpSolver
        from acados_tpu.models.pendulum import make_pendulum_ocp

        B, N = 256, 20
        ocp = make_pendulum_ocp(N=N, dtype="float32",
                                nlp_solver_type="SQP_RTI")
        bs = AcadosOcpBatchSolver(ocp, B)
        for _ in range(8):
            bs.solve()
        t_lin_b = bs.get_stats("time_lin")
        t_qp_b = bs.get_stats("time_qp")

        s = AcadosOcpSolver(make_pendulum_ocp(
            N=N, dtype="float32", nlp_solver_type="SQP_RTI"))
        for _ in range(8):
            s.solve()
        t_lin_1 = s.get_stats("time_lin")
        t_qp_1 = s.get_stats("time_qp")
        assert t_lin_b > 0 and t_qp_b >= 0
        assert t_lin_1 > 0 and t_qp_1 >= 0
        # both estimates are whole-batch / single-instance programs on
        # the same chip: the batched phases must dominate the single-
        # instance ones (B=256 >> 1) but stay within the dispatch-floor
        # regime (one tiny-solve program costs ~the 2 ms dispatch floor,
        # so the batched/single ratio is far below B)
        assert t_lin_b >= t_lin_1 * 0.5
        assert t_lin_b <= t_lin_1 * 50
