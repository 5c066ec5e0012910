"""Chain RTI: effect of QP tol floor + warm start on steady-state cost."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from bench import _build_rti, _steady_state_rti, _residual_fields, _CHAIN_TOLS  # noqa


def fence(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timeit(f, *args, reps=6):
    out = f(*args)
    fence(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps * 1e3


def run(tag, opts_update=None, qp_opts_update=None):
    from acados_tpu.models.chain_mass import (chain_steady_state,
                                              make_chain_mass_ocp)
    n_mass, B, N = 8, 256, 40
    xrest = chain_steady_state(n_mass)
    solve_batch, data, init, ocp, form, opts = _build_rti(
        make_chain_mass_ocp, xrest, 0.02, B, jnp.float32,
        n_mass=n_mass, N=N, dtype="float32",
        opts_update=opts_update, qp_opts_update=qp_opts_update)
    it, stats = _steady_state_rti(solve_batch, data, init)
    dt = timeit(solve_batch, data, it)
    it2, stats2 = solve_batch(data, it)
    qpi = float(np.mean(np.asarray(stats2.qp_iter_total)))
    qpx = int(np.max(np.asarray(stats2.qp_iter_total)))
    res = _residual_fields(stats2, _CHAIN_TOLS)
    print(f"{tag:40s} {dt:7.1f} ms  {B/dt*1e3:8.1f}/s  qp_iters={qpi:5.2f} "
          f"max={qpx:3d} "
          f"in_tol={res['in_tolerance']} res_stat={res['max_res_stat']:.2e} "
          f"res_eq={res['max_res_eq']:.2e}", flush=True)


if __name__ == "__main__":
    run("new baseline (warm+autocap in model)")
    run("warm explicit cap 1e-2",
        qp_opts_update=dict(warm_comp_cap=1e-2))
    run("no warm (override off)",
        opts_update=dict(warm_start_first_qp_from_nlp=False))
