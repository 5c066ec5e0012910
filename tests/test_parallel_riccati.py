"""Parallel-in-time Riccati tests: the log-depth associative-scan
formulation (riccati.py parallel_*; Sarkka & Garcia-Fernandez parallel
LQT — the TPU headroom the reference's sequential HPIPM Riccati
(ocp_qp_hpipm.c:347) leaves on the table) must match the sequential scan
exactly, standalone and through the IPM + SQP stack."""
import numpy as np
import pytest

import jax.numpy as jnp

from acados_tpu.interface.builder import build_ocp, data_to_jax
from acados_tpu.models.pendulum import make_pendulum_ocp
from acados_tpu.ocp_nlp.sqp import SqpOpts, init_iterate, make_sqp_solver
from acados_tpu.ocp_qp.ipm import IpmOpts
from acados_tpu.ocp_qp.riccati import (parallel_riccati_factor,
                                       parallel_riccati_solve,
                                       riccati_factor, riccati_solve)


def random_lq(N, nx, nu, seed=0):
    rng = np.random.default_rng(seed)

    def spd(n):
        M = rng.normal(0, 1, (n, n))
        return M @ M.T + np.eye(n)

    A = jnp.asarray(rng.normal(0, 0.4, (N, nx, nx)) + np.eye(nx) * 0.8)
    B = jnp.asarray(rng.normal(0, 0.5, (N, nx, nu)))
    Q = jnp.asarray(np.stack([spd(nx) for _ in range(N + 1)]))
    R = jnp.asarray(np.stack([spd(nu) for _ in range(N)]))
    S = jnp.asarray(rng.normal(0, 0.3, (N, nu, nx)))
    q = jnp.asarray(rng.normal(0, 1, (N + 1, nx)))
    r = jnp.asarray(rng.normal(0, 1, (N, nu)))
    b = jnp.asarray(rng.normal(0, 1, (N, nx)))
    return A, B, Q, R, S, q, r, b


class TestParallelRiccati:
    @pytest.mark.parametrize("N", [1, 2, 3, 17, 64, 128])
    def test_matches_sequential(self, N):
        A, B, Q, R, S, q, r, b = random_lq(N, 4, 2, seed=N)
        f1 = riccati_factor(Q, R, S, A, B)
        f2 = parallel_riccati_factor(Q, R, S, A, B)
        np.testing.assert_allclose(np.asarray(f2.P), np.asarray(f1.P),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(f2.K), np.asarray(f1.K),
                                   atol=1e-9)
        for dx0 in (None, jnp.asarray(np.ones(4))):
            o1 = riccati_solve(f1, A, B, q, r, b, dx0=dx0)
            o2 = parallel_riccati_solve(f2, A, B, q, r, b, dx0=dx0)
            for a, c in zip(o1, o2):
                np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                           atol=1e-9)

    def test_sqp_end_to_end(self):
        ocp = make_pendulum_ocp(dtype="float64")
        form, dnp, _ = build_ocp(ocp)
        data = data_to_jax(dnp, jnp.float64)
        x0 = np.array([0.0, np.pi, 0.0, 0.0])
        init = init_iterate(form, jnp.float64,
                            x_traj=np.tile(x0, (form.N + 1, 1)))
        it1, st1 = make_sqp_solver(form, SqpOpts(max_iter=50))(data, init)
        it2, st2 = make_sqp_solver(
            form, SqpOpts(max_iter=50,
                          qp_opts=IpmOpts(parallel_riccati=True)))(data,
                                                                   init)
        assert int(st1.status) == 0 and int(st2.status) == 0
        np.testing.assert_allclose(np.asarray(it2.x), np.asarray(it1.x),
                                   atol=1e-10)
