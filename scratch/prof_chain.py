"""Profile the chain-of-masses (nx=39) QP phase component by component."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from bench import _build_rti, _steady_state_rti  # noqa: E402


def fence(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timeit(f, *args, r1=3, r2=13):
    """Rep-differenced host-loop timing (cancels dispatch floor only
    partially — each call still pays ~2ms dispatch; use for ms-scale)."""
    out = f(*args)
    fence(out)
    def run(r):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(r):
                out = f(*args)
            fence(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t1, t2 = run(r1), run(r2)
    return (t2 - t1) / (r2 - r1) * 1e3  # ms/call


def main():
    from acados_tpu.ocp_nlp.linearize import build_static_rows, linearize
    from acados_tpu.ocp_nlp.sqp import use_x0_elimination
    from acados_tpu.ocp_qp.ipm import (IpmOpts, solve_ocp_qp, _row_weights,
                                       _barrier_hessian, _init_iterate,
                                       _residuals, _newton_step)
    from acados_tpu.ocp_qp.riccati import riccati_factor, riccati_solve
    from acados_tpu.models.chain_mass import (chain_steady_state,
                                              make_chain_mass_ocp)

    n_mass, B, N = 8, 256, 40
    xrest = chain_steady_state(n_mass)
    solve_batch, data, init, ocp, form, opts = _build_rti(
        make_chain_mass_ocp, xrest, 0.02, B, jnp.float32,
        n_mass=n_mass, N=N, dtype="float32")
    it, stats = _steady_state_rti(solve_batch, data, init)
    print("steady state reached; qp opts:", opts.qp_opts.iter_max, flush=True)

    static_rows = build_static_rows(form, jnp.float32)
    lm = jnp.asarray(opts.levenberg_marquardt, jnp.float32)
    x0f = use_x0_elimination(form, opts)
    print("x0_fixed:", x0f)

    lin = jax.jit(jax.vmap(
        lambda d, i: linearize(form, static_rows, d, i, lm)))
    qp = lin(data, it)
    qp = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), qp)  # re-layout
    print("QP shapes: Q", qp.Q.shape, "C", qp.C.shape, flush=True)

    t_full = timeit(
        jax.jit(jax.vmap(lambda q: solve_ocp_qp(q, opts.qp_opts,
                                                x0_fixed=x0f))), qp)
    print(f"full IPM solve: {t_full:8.2f} ms", flush=True)

    qopts = opts.qp_opts

    # build a representative interior iterate (cold init)
    @jax.jit
    def mkit(q):
        return jax.vmap(lambda qq: _init_iterate(qq, qopts, None))(q)
    it0 = mkit(qp)

    @jax.jit
    def weights_hess(q, i):
        w = jax.vmap(_row_weights)(q, i)
        Qb, Rb, Sb = jax.vmap(_barrier_hessian)(q, w[0])
        return Qb, Rb, Sb

    Qb, Rb, Sb = weights_hess(qp, it0)
    t_wh = timeit(weights_hess, qp, it0)
    print(f"row weights + barrier hessian: {t_wh:8.2f} ms", flush=True)

    with jax.default_matmul_precision("highest"):
        fac = jax.jit(jax.vmap(
            lambda Q, R, S, A, Bm: riccati_factor(
                Q, R, S, A, Bm, reg_eps=qopts.reg_eps)))
        t_fac = timeit(fac, Qb, Rb, Sb, qp.A, qp.B)
        print(f"riccati_factor (1x): {t_fac:8.2f} ms", flush=True)
        fact = fac(Qb, Rb, Sb, qp.A, qp.B)

        sol = jax.jit(jax.vmap(
            lambda f, A, Bm, qv, rv, bv: riccati_solve(f, A, Bm, qv, rv, bv)))
        t_sol = timeit(sol, fact, qp.A, qp.B, qp.q, qp.r, qp.b)
        print(f"riccati_solve (1x): {t_sol:8.2f} ms", flush=True)

    # residuals
    resf = jax.jit(lambda q, i: jax.vmap(
        lambda qq, ii: _residuals(qq, ii, x0f))(q, i))
    t_res = timeit(resf, qp, it0)
    print(f"residuals: {t_res:8.2f} ms", flush=True)

    # info from steady solve: iteration count
    solq = jax.jit(jax.vmap(lambda q: solve_ocp_qp(q, qopts, x0_fixed=x0f)))
    _s, info = solq(qp)
    print("cold iters:", float(np.mean(np.asarray(info.num_iter))),
          "status ok:", int(np.sum(np.asarray(info.status) == 0)), flush=True)

    # linearization for reference
    t_lin = timeit(lin, data, it)
    print(f"linearize(IRK): {t_lin:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
