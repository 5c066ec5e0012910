"""Pendulum B=4096 RTI: does warm start + auto cap survive chattering?"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _build_rti, _steady_state_rti, _residual_fields  # noqa


def fence(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timeit(f, *args, reps=8):
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


def run(tag, B=4096, opts_update=None, qp_opts_update=None):
    from acados_tpu.models.pendulum import make_pendulum_ocp
    solve_batch, data, init, ocp, form, opts = _build_rti(
        make_pendulum_ocp, [0.0, np.pi, 0.0, 0.0], 0.05, B, jnp.float32,
        N=20, dtype="float32", nlp_solver_type="SQP_RTI",
        opts_update=opts_update, qp_opts_update=qp_opts_update)
    it, stats = _steady_state_rti(solve_batch, data, init)
    dt = timeit(solve_batch, data, it)
    it2, stats2 = solve_batch(data, it)
    qpi = float(np.mean(np.asarray(stats2.qp_iter_total)))
    qpx = int(np.max(np.asarray(stats2.qp_iter_total)))
    so = ocp.solver_options
    res = _residual_fields(stats2, dict(
        tol_stat=so.nlp_solver_tol_stat, tol_eq=so.nlp_solver_tol_eq,
        tol_ineq=so.nlp_solver_tol_ineq, tol_comp=so.nlp_solver_tol_comp))
    print(f"{tag:42s} {dt:7.2f} ms  {B/dt*1e3:9.0f}/s  qp={qpi:5.2f} "
          f"max={qpx:3d} in_tol={res['in_tolerance']} "
          f"rs={res['max_res_stat']:.2e}", flush=True)


if __name__ == "__main__":
    run("baseline (no warm)")
    run("warm from nlp (auto cap)",
        opts_update=dict(warm_start_first_qp_from_nlp=True))
