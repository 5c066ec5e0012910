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
