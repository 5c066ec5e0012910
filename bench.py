"""Benchmark: batched NMPC solves/sec/chip at in-tolerance KKT residuals.

Headline metric (BASELINE.json north star): >= 10k batched pendulum SQP-RTI
solves/s/chip *at acados-equivalent KKT residual*. Protocol:

  1. cold batched solve (compile + converge),
  2. warm the RTI loop to its steady state (the production MPC shape:
     repeated warm-started solves) until the KKT residuals reach the
     dtype floor,
  3. assert the steady-state residuals are within the model's f32
     tolerances (pendulum: tol_stat 2e-3 — see models/pendulum.py),
  4. only then time.

Secondary metrics (reported as extra JSON fields):
  - pendulum SQP cold-to-tolerance throughput + convergence count,
  - chain-of-masses RTI (n_mass=8, nx=39 — the MXU-relevant size),
  - long-horizon pendulum RTI (N=128 — the sequential-Riccati stress case).

acados CPU baseline (BASELINE.md protocol step 1): NOT measurable in this
environment — the reference tree's submodules (external/blasfeo,
external/hpipm) are empty and there is no network access, so libacados
cannot be built. See BASELINE.md "Measured baseline status".

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
Run on whatever backend is ambient (real TPU chip under the driver; CPU
with JAX_PLATFORMS=cpu for smoke — pass --quick to skip secondaries).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _build_rti(make_ocp, x0_center, sigma, B, jdtype, seed=0,
               opts_update=None, qp_opts_update=None, **ocp_kw):
    """Build a batched warm-RTI solve closure + initial batch state."""
    import jax
    import jax.numpy as jnp

    from acados_tpu.interface.builder import StageLayout, build_ocp, \
        data_to_jax
    from acados_tpu.interface.solver import _sqp_opts_from
    from acados_tpu.ocp_nlp.sqp import init_iterate, make_sqp_solver

    out = make_ocp(**ocp_kw)
    ocp = out[0] if isinstance(out, tuple) else out
    form, data_np, _ = build_ocp(ocp)
    opts = _sqp_opts_from(ocp)
    if opts_update:
        opts = opts.replace(**opts_update)
    if qp_opts_update:
        opts = opts.replace(qp_opts=opts.qp_opts.replace(**qp_opts_update))
    solve = make_sqp_solver(form, opts)
    solve_batch = jax.jit(jax.vmap(solve))

    data1 = data_to_jax(data_np, jdtype)
    data = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), data1)

    rng = np.random.default_rng(seed)
    nbx0 = len(form.con_0.idxbx)
    x0s = (np.asarray(x0_center)[None, :]
           + rng.normal(0.0, sigma, (B, nbx0))).astype(np.float32)
    lay = StageLayout(form.con_0)
    lb_0 = np.tile(np.asarray(data1.lb_0), (B, 1))
    ub_0 = np.tile(np.asarray(data1.ub_0), (B, 1))
    lb_0[:, lay.off_bx:lay.off_bx + nbx0] = x0s
    ub_0[:, lay.off_bx:lay.off_bx + nbx0] = x0s
    data = data.replace(lb_0=jnp.asarray(lb_0, jdtype),
                        ub_0=jnp.asarray(ub_0, jdtype))

    init1 = init_iterate(form, jdtype)
    init = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), init1)
    nx = form.nx
    x_full = np.tile(np.asarray(data_np["lb_0"])[None, None, :nx],
                     (B, form.N + 1, 1)).astype(np.float32)
    x_full[:, :, form.con_0.idxbx] = x0s[:, None, :]
    init = init.replace(x=jnp.asarray(x_full, jdtype))
    return solve_batch, data, init, ocp


def _steady_state_rti(solve_batch, data, init, warm_reps=15):
    """Cold solve, then warm-iterate to the RTI fixed point. Returns the
    steady iterate + final stats (whose residuals are the honest numbers)."""
    import jax

    it, stats = jax.block_until_ready(solve_batch(data, init))
    for _ in range(warm_reps):
        it, stats = solve_batch(data, it)
    jax.block_until_ready((it, stats))
    return it, stats


def _time_rti(solve_batch, data, it, reps=10):
    import jax

    t0 = time.perf_counter()
    for _ in range(reps):
        it, stats = solve_batch(data, it)
    jax.block_until_ready((it, stats))
    return (time.perf_counter() - t0) / reps


def bench_pendulum_rti(B=4096, N=20):
    import jax.numpy as jnp

    from acados_tpu.models.pendulum import make_pendulum_ocp

    solve_batch, data, init, ocp = _build_rti(
        make_pendulum_ocp, [0.0, np.pi, 0.0, 0.0], 0.05, B, jnp.float32,
        N=N, dtype="float32", nlp_solver_type="SQP_RTI")
    it, stats = _steady_state_rti(solve_batch, data, init)
    dt_s = _time_rti(solve_batch, data, it)

    so = ocp.solver_options
    res = dict(
        solves_per_s=B / dt_s,
        batch=B,
        status_ok=int(np.sum(np.asarray(stats.status) == 0)),
        max_res_stat=float(np.max(np.asarray(stats.res_stat))),
        max_res_eq=float(np.max(np.asarray(stats.res_eq))),
        max_res_ineq=float(np.max(np.asarray(stats.res_ineq))),
        max_res_comp=float(np.max(np.asarray(stats.res_comp))),
        tol_stat=so.nlp_solver_tol_stat,
        frac_in_tol=float(np.mean(
            np.asarray(stats.res_stat) <= so.nlp_solver_tol_stat)),
    )
    res["in_tolerance"] = bool(
        res["max_res_stat"] <= so.nlp_solver_tol_stat
        and res["max_res_eq"] <= so.nlp_solver_tol_eq
        and res["max_res_ineq"] <= so.nlp_solver_tol_ineq
        and res["max_res_comp"] <= so.nlp_solver_tol_comp)
    return res


def bench_pendulum_sqp(B=4096, N=20):
    """Cold SQP-to-tolerance throughput (full convergence, not RTI)."""
    import jax
    import jax.numpy as jnp

    from acados_tpu.models.pendulum import make_pendulum_ocp

    solve_batch, data, init, ocp = _build_rti(
        make_pendulum_ocp, [0.0, np.pi, 0.0, 0.0], 0.05, B, jnp.float32,
        N=N, dtype="float32", nlp_solver_type="SQP")
    it, stats = jax.block_until_ready(solve_batch(data, init))  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        it, stats = solve_batch(data, init)
    jax.block_until_ready((it, stats))
    dt_s = (time.perf_counter() - t0) / reps
    return dict(
        solves_per_s=B / dt_s, batch=B,
        converged=int(np.sum(np.asarray(stats.status) == 0)),
        max_res_stat=float(np.max(np.asarray(stats.res_stat))),
        mean_sqp_iter=float(np.mean(np.asarray(stats.sqp_iter))),
    )


def bench_chain_rti(n_mass=8, B=256, N=40):
    import jax.numpy as jnp

    from acados_tpu.models.chain_mass import (chain_steady_state,
                                              make_chain_mass_ocp)

    xrest = chain_steady_state(n_mass)
    nbx0 = xrest.shape[0]
    solve_batch, data, init, ocp = _build_rti(
        make_chain_mass_ocp, xrest, 0.02, B, jnp.float32,
        n_mass=n_mass, N=N, dtype="float32")
    it, stats = _steady_state_rti(solve_batch, data, init)
    dt_s = _time_rti(solve_batch, data, it, reps=5)
    return dict(
        solves_per_s=B / dt_s, batch=B, nx=(2 * (n_mass - 2) + 1) * 3,
        status_ok=int(np.sum(np.asarray(stats.status) == 0)),
        max_res_stat=float(np.max(np.asarray(stats.res_stat))),
        max_res_eq=float(np.max(np.asarray(stats.res_eq))),
    )


def bench_long_horizon_rti(N=128, B=1024):
    """Long-horizon stress: plain sequential Riccati vs partial
    condensing (cond_N) vs the log-depth parallel-in-time Riccati —
    the three answers to the sequential-scan latency problem."""
    import jax.numpy as jnp

    from acados_tpu.models.pendulum import make_pendulum_ocp

    variants = {
        "plain": {},
        "cond_N16": dict(opts_update=dict(cond_N=16)),
        "parallel_riccati": dict(
            qp_opts_update=dict(parallel_riccati=True)),
    }
    out = {}
    for name, kw in variants.items():
        solve_batch, data, init, ocp = _build_rti(
            make_pendulum_ocp, [0.0, np.pi, 0.0, 0.0], 0.02, B,
            jnp.float32, N=N, Tf=1.0, dtype="float32",
            nlp_solver_type="SQP_RTI", **kw)
        it, stats = _steady_state_rti(solve_batch, data, init,
                                      warm_reps=25)
        dt_s = _time_rti(solve_batch, data, it, reps=5)
        out[name] = dict(
            solves_per_s=round(B / dt_s, 1), batch=B, N=N,
            status_ok=int(np.sum(np.asarray(stats.status) == 0)),
            max_res_stat=float(np.max(np.asarray(stats.res_stat))),
        )
    return out


def main():
    import jax

    quick = "--quick" in sys.argv
    smoke = "--smoke" in sys.argv  # tiny batch for CPU CI smoke runs
    head = bench_pendulum_rti(B=64 if smoke else 4096)
    out = {
        "metric": "pendulum_sqp_rti_solves_per_sec_per_chip",
        "value": round(head["solves_per_s"], 1),
        "unit": "solves/s",
        "vs_baseline": round(head["solves_per_s"] / 10000.0, 3),
        "in_tolerance": head["in_tolerance"],
        "batch": head["batch"],
        "status_ok": head["status_ok"],
        "max_res_stat": head["max_res_stat"],
        "max_res_eq": head["max_res_eq"],
        "max_res_ineq": head["max_res_ineq"],
        "max_res_comp": head["max_res_comp"],
        "tol_stat": head["tol_stat"],
        "device": str(jax.devices()[0].platform),
    }
    if not quick:
        out["pendulum_sqp_to_tol"] = bench_pendulum_sqp()
        out["chain_mass_rti_nx39"] = bench_chain_rti()
        out["long_horizon_rti_N128"] = bench_long_horizon_rti()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
