"""Multi-device sharding parity: sharded batch == single-device batch.

SURVEY.md §4 requires "N hosts == 1 host parity" tests; the conftest
provisions 8 virtual CPU devices (xla_force_host_platform_device_count).
The framework's data-parallel axis is the batch of OCP instances
(SURVEY.md §2.9: replaces the reference's OpenMP batch-of-capsules,
acados_solver.in.c:3232) — each instance is independent, so an 8-way
sharded vmap must reproduce the single-device values exactly up to
reduction-order noise.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from acados_tpu.ocp_qp.ipm import IpmOpts, solve_ocp_qp
from acados_tpu.parallel.mesh import make_batch_mesh

from test_ocp_qp import random_ocp_qp


requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _shard_batch(tree, mesh):
    return jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P("batch", *([None] * (a.ndim - 1))))),
        tree)


@requires_8dev
class TestShardingParity:
    def test_qp_batch_sharded_matches_single_device(self):
        B = 16
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        qps = [random_ocp_qp(k, N=6, nx=3, nu=2, nc=2) for k in keys]
        qp_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
        opts = IpmOpts(iter_max=50)
        solve = jax.vmap(lambda q: solve_ocp_qp(q, opts))

        sol_1, info_1 = jax.jit(solve)(qp_batch)

        mesh = make_batch_mesh(jax.devices()[:8])
        qp_sharded = _shard_batch(qp_batch, mesh)
        sol_8, info_8 = jax.jit(solve)(qp_sharded)

        np.testing.assert_allclose(np.asarray(sol_8.x),
                                   np.asarray(sol_1.x), atol=1e-10)
        np.testing.assert_allclose(np.asarray(sol_8.u),
                                   np.asarray(sol_1.u), atol=1e-10)
        np.testing.assert_array_equal(np.asarray(info_8.status),
                                      np.asarray(info_1.status))

    def test_sqp_batch_sharded_matches_single_device(self):
        """Full NLP solve (the flagship pendulum config) sharded over the
        8-device mesh equals the single-device batch."""
        from acados_tpu.interface.builder import build_ocp, data_to_jax
        from acados_tpu.interface.solver import _sqp_opts_from
        from acados_tpu.models.pendulum import make_pendulum_ocp
        from acados_tpu.ocp_nlp.sqp import init_iterate, make_sqp_solver

        B = 8
        ocp = make_pendulum_ocp(N=20, nlp_solver_type="SQP")
        ocp.solver_options.globalization = "MERIT_BACKTRACKING"
        form, data_np, _ = build_ocp(ocp)
        solve = make_sqp_solver(form, _sqp_opts_from(ocp))
        data1 = data_to_jax(data_np, jnp.float64)
        data = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                            data1)
        # distinct x0 per instance
        x0s = np.tile(np.array([0.0, np.pi, 0.0, 0.0]), (B, 1))
        x0s[:, 1] += np.linspace(-0.05, 0.05, B)
        lb_0 = np.tile(np.asarray(data1.lb_0), (B, 1))
        lb_0[:, :4] = x0s
        data = data.replace(lb_0=jnp.asarray(lb_0),
                            ub_0=jnp.asarray(lb_0))
        init1 = init_iterate(form, jnp.float64)
        init = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                            init1)
        init = init.replace(
            x=jnp.asarray(np.repeat(x0s[:, None, :], form.N + 1, axis=1)))

        batched = jax.jit(jax.vmap(solve))
        it_1, st_1 = batched(data, init)

        mesh = make_batch_mesh(jax.devices()[:8])
        data_s, init_s = _shard_batch((data, init), mesh)
        it_8, st_8 = batched(data_s, init_s)

        assert np.all(np.asarray(st_1.status) == 0)
        np.testing.assert_array_equal(np.asarray(st_8.status),
                                      np.asarray(st_1.status))
        # atol covers SPMD-partitioner reassociation of reductions: the
        # sharded program may sum/max in a different order than the
        # single-device one (observed ~3e-8 on x after the r4 x0-elim
        # path) — values-level parity, not bitwise
        np.testing.assert_allclose(np.asarray(it_8.x), np.asarray(it_1.x),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(it_8.u), np.asarray(it_1.u),
                                   atol=1e-7)
        # the result really was computed sharded over all 8 devices
        assert len(it_8.x.sharding.device_set) == 8


class TestDistributedHelpers:
    """Multi-host helpers (single-process degenerate behavior; true
    multi-host requires a pod launcher — SURVEY.md §2.9 TPU mapping)."""

    def test_initialize_idempotent(self):
        from acados_tpu.parallel.distributed import initialize_distributed
        assert initialize_distributed() == 1
        assert initialize_distributed() == 1  # second call is a no-op

    def test_local_batch_slice_covers(self):
        from acados_tpu.parallel.distributed import \
            process_local_batch_slice
        s, e = process_local_batch_slice(100)
        assert (s, e) == (0, 100)

    def test_status_counts_and_residual(self):
        import numpy as np
        from acados_tpu.parallel.distributed import (
            all_reduce_status_counts, global_max_residual)
        counts = all_reduce_status_counts(np.array([0, 0, 1, 2, 0, 4]))
        assert counts[0] == 3 and counts[1] == 1 and counts[4] == 1
        assert global_max_residual(np.array([1e-3, 2e-5])) == 1e-3


class TestQpDump:
    def test_dump_qp_to_file(self, tmp_path):
        """Debug QP dump (reference ACADOS_DEBUG_SQP_PRINT_QPS_TO_FILE
        analog) contains a consistent stage-blocked QP."""
        import numpy as np
        from acados_tpu import AcadosOcpSolver
        from test_interface import make_ocp
        s = AcadosOcpSolver(make_ocp(N=8))
        assert s.solve() == 0
        p = str(tmp_path / "qp.npz")
        s.dump_qp_to_file(p)
        d = np.load(p)
        assert d["Q"].shape == (9, 4, 4)
        assert d["A"].shape == (8, 4, 4)
        assert d["B"].shape == (8, 4, 1)
        # dynamics gap at a converged iterate ~ 0: b = x_{k+1}-f(x_k,u_k)
        # is folded into b; the linearization residual must be finite
        assert np.isfinite(d["b"]).all()
