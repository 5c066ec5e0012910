"""Chain QP: per-IPM-iteration cost via forced iteration-count differencing,
plus a scan-chained riccati_factor measurement (the fused in-loop cost)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from bench import _build_rti, _steady_state_rti  # noqa: E402


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
    return min(ts) / reps * 1e3  # ms/call (includes ~2ms dispatch)


def main():
    from acados_tpu.ocp_nlp.linearize import build_static_rows, linearize
    from acados_tpu.ocp_nlp.sqp import use_x0_elimination
    from acados_tpu.ocp_qp.ipm import solve_ocp_qp
    from acados_tpu.ocp_qp.riccati import riccati_factor
    from acados_tpu.models.chain_mass import (chain_steady_state,
                                              make_chain_mass_ocp)

    n_mass, B, N = 8, 256, 40
    xrest = chain_steady_state(n_mass)
    solve_batch, data, init, ocp, form, opts = _build_rti(
        make_chain_mass_ocp, xrest, 0.02, B, jnp.float32,
        n_mass=n_mass, N=N, dtype="float32")
    it, stats = _steady_state_rti(solve_batch, data, init)

    static_rows = build_static_rows(form, jnp.float32)
    lm = jnp.asarray(opts.levenberg_marquardt, jnp.float32)
    x0f = use_x0_elimination(form, opts)

    lin = jax.jit(jax.vmap(
        lambda d, i: linearize(form, static_rows, d, i, lm)))
    qp = lin(data, it)
    qp = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), qp)

    qo = opts.qp_opts
    print("qp tols:", qo.tol_stat, qo.tol_eq, qo.tol_ineq, qo.tol_comp,
          "mu0:", qo.mu0, "iter_max:", qo.iter_max, flush=True)

    # forced-iteration differencing: huge stall_max, zero tolerances
    def forced(k):
        o = qo.replace(iter_max=k, stall_max=1000000,
                       tol_stat=0.0, tol_eq=0.0, tol_ineq=0.0, tol_comp=0.0,
                       mu_min=0.0)
        return jax.jit(jax.vmap(
            lambda q: solve_ocp_qp(q, o, x0_fixed=x0f)))

    t2 = timeit(forced(2), qp)
    t9 = timeit(forced(9), qp)
    print(f"iter_max=2: {t2:7.2f} ms   iter_max=9: {t9:7.2f} ms   "
          f"per-iter: {(t9 - t2) / 7:7.2f} ms", flush=True)

    # scan-chained riccati_factor: the cost when fused into a device loop
    from acados_tpu.ocp_qp.ipm import (_row_weights, _barrier_hessian,
                                       _init_iterate)

    @jax.jit
    def prep(q):
        i0 = jax.vmap(lambda qq: _init_iterate(qq, qo, None))(q)
        w = jax.vmap(_row_weights)(q, i0)
        return jax.vmap(_barrier_hessian)(q, w[0])

    Qb, Rb, Sb = prep(qp)
    Qb = jnp.asarray(np.asarray(Qb))
    Rb = jnp.asarray(np.asarray(Rb))
    Sb = jnp.asarray(np.asarray(Sb))
    A = jnp.asarray(np.asarray(qp.A))
    Bm = jnp.asarray(np.asarray(qp.B))

    def chain_fac(S):
        @jax.jit
        def run(Qb, Rb, Sb, A, Bm):
            def body(c, _):
                with jax.default_matmul_precision("highest"):
                    f = jax.vmap(lambda q, r, s, a, b: riccati_factor(
                        q, r, s, a, b, reg_eps=qo.reg_eps))(c, Rb, Sb, A, Bm)
                # feed P back in (data dependence)
                c2 = Qb + 1e-6 * f.P
                return c2, 0.0
            c, _ = jax.lax.scan(body, Qb, None, length=S)
            return c
        return run

    tA = timeit(chain_fac(1), Qb, Rb, Sb, A, Bm, reps=4)
    tB = timeit(chain_fac(8), Qb, Rb, Sb, A, Bm, reps=4)
    print(f"riccati_factor chained: S=1 {tA:7.2f} ms  S=8 {tB:7.2f} ms  "
          f"per-factor {(tB - tA) / 7:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
