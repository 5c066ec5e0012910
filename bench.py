"""Benchmark: batched pendulum NMPC SQP-RTI solves/sec/chip.

The BASELINE.json north-star metric: >= 10k batched pendulum SQP-RTI
solves/s/chip at acados-equivalent KKT residual (see BASELINE.md). Prints
one JSON line {"metric", "value", "unit", "vs_baseline"}.

Run on whatever backend is ambient (real TPU chip under the driver; CPU
with JAX_PLATFORMS=cpu for smoke).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acados_tpu.interface.builder import build_ocp, data_to_jax
    from acados_tpu.interface.solver import _sqp_opts_from
    from acados_tpu.models.pendulum import make_pendulum_ocp
    from acados_tpu.ocp_nlp.sqp import init_iterate, make_sqp_solver

    N = 20
    B = 4096
    dtype = jnp.float32

    ocp = make_pendulum_ocp(N=N, dtype="float32", nlp_solver_type="SQP_RTI")
    form, data_np, _ = build_ocp(ocp)
    opts = _sqp_opts_from(ocp)
    solve = make_sqp_solver(form, opts)
    solve_batch = jax.jit(jax.vmap(solve))

    data1 = data_to_jax(data_np, dtype)
    data = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), data1)

    # batch of perturbed initial states around the swing-up start
    rng = np.random.default_rng(0)
    x0s = (np.array([0.0, np.pi, 0.0, 0.0])
           + rng.normal(0.0, 0.05, (B, 4))).astype(np.float32)
    from acados_tpu.interface.builder import StageLayout
    lay = StageLayout(form.con_0)
    lb0 = np.asarray(data1.lb_0)
    ub0 = np.asarray(data1.ub_0)
    lb_0 = np.tile(lb0, (B, 1))
    ub_0 = np.tile(ub0, (B, 1))
    lb_0[:, lay.off_bx:lay.off_bx + 4] = x0s
    ub_0[:, lay.off_bx:lay.off_bx + 4] = x0s
    data = data.replace(lb_0=jnp.asarray(lb_0), ub_0=jnp.asarray(ub_0))

    init1 = init_iterate(form, dtype)
    init = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), init1)
    x_traj = jnp.asarray(np.repeat(x0s[:, None, :], N + 1, axis=1))
    init = init.replace(x=x_traj)

    # warm-up / compile
    it, stats = jax.block_until_ready(solve_batch(data, init))
    ok = int(np.sum(np.asarray(stats.status) == 0))

    # RTI steady-state: warm-started solves (the production MPC loop shape)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        it, stats = solve_batch(data, it)
    jax.block_until_ready((it, stats))
    dt_s = (time.perf_counter() - t0) / reps
    solves_per_s = B / dt_s

    res = {
        "metric": "pendulum_sqp_rti_solves_per_sec_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 10000.0, 3),
        "batch": B,
        "converged_cold": ok,
        "max_res_stat": float(np.max(np.asarray(stats.res_stat))),
        "max_res_eq": float(np.max(np.asarray(stats.res_eq))),
        "device": str(jax.devices()[0].platform),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
