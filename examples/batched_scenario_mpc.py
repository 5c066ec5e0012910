"""Batched NMPC: thousands of OCP instances in one device program.

The TPU replacement for the reference's OpenMP batch solver
(AcadosOcpBatchSolver, acados_solver.in.c:3223 `#pragma omp parallel
for`): instances are a vmapped batch axis, shardable over a device mesh
(`acados_tpu.parallel.mesh`) for multi-chip scale-out — the RL / scenario
MPC / parameter-sweep workload shape.
"""
import _example_env  # noqa: F401  (path + CPU float64 setup)
import numpy as np

import jax
import jax.numpy as jnp

from acados_tpu.interface.builder import (StageLayout, build_ocp,
                                          data_to_jax)
from acados_tpu.models.pendulum import make_pendulum_ocp
from acados_tpu.ocp_nlp.sqp import SqpOpts, init_iterate, make_sqp_solver


def main(B=256):
    ocp = make_pendulum_ocp(N=20, dtype="float64")
    form, data_np, _ = build_ocp(ocp)
    solve = make_sqp_solver(
        form, SqpOpts(max_iter=200,
                       globalization="FUNNEL_L1PEN_LINESEARCH"))
    solve_batch = jax.jit(jax.vmap(solve))

    # batch of perturbed initial states
    rng = np.random.default_rng(0)
    x0s = np.array([0.0, np.pi, 0.0, 0.0]) \
        + 0.05 * rng.standard_normal((B, 4))
    data1 = data_to_jax(data_np, jnp.float64)
    data = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                        data1)
    lay = StageLayout(form.con_0)
    lb0 = np.tile(np.asarray(data1.lb_0), (B, 1))
    lb0[:, lay.off_bx:lay.off_bx + 4] = x0s
    data = data.replace(lb_0=jnp.asarray(lb0), ub_0=jnp.asarray(lb0))

    init1 = init_iterate(form, jnp.float64)
    init = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                        init1)
    x_full = np.tile(x0s[:, None, :], (1, form.N + 1, 1))
    init = init.replace(x=jnp.asarray(x_full))

    it, stats = jax.block_until_ready(solve_batch(data, init))
    ok = int(np.sum(np.asarray(stats.status) == 0))
    print(f"{ok}/{B} instances converged; "
          f"max res_stat {float(np.max(np.asarray(stats.res_stat))):.2e}")
    assert ok == B
    return it


if __name__ == "__main__":
    main()
