"""Production TPU kernels vs host float64 oracles.

Covers VERDICT r4 item 4's list: the Pallas lane-batched inverse at
(B, 16) and (B, 78) — the latter exercises the n > 48 blocked Schur
recursion — `small_chol` vs LAPACK, the VPU small-matmul path, and the
fused IRK step+Jacobian. Tolerances are f32-floor-aware (the kernels run
the f32 production path; oracles are float64 numpy on the host).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _well_conditioned(rng, b, n):
    a = rng.normal(size=(b, n, n))
    return (a + n * np.eye(n)).astype(np.float32)


class TestBatchedInv:
    @pytest.mark.parametrize("n", [8, 16, 78])
    def test_vs_f64_oracle(self, rng, n):
        from acados_tpu.ops.batched_inv import gj_inverse_any

        B = 256
        a32 = _well_conditioned(rng, B, n)
        out = np.asarray(jax.jit(gj_inverse_any)(jnp.asarray(a32)))
        oracle = np.linalg.inv(a32.astype(np.float64))
        err = np.max(np.abs(out - oracle))
        # conditioning ~O(1); f32 kernel floor measured ~1e-3 at n=78
        tol = 5e-3 if n > 48 else 5e-4
        assert err < tol, (n, err)

    def test_harsh_conditioning_n78(self, rng):
        """The n>48 Schur path on a stiffer spectrum — the regime the
        chain-of-masses IRK Jacobians live in."""
        from acados_tpu.ops.batched_inv import gj_inverse_any

        B, n = 64, 78
        a = rng.normal(size=(B, n, n))
        a = a @ np.transpose(a, (0, 2, 1)) / n + 0.1 * np.eye(n)
        a32 = a.astype(np.float32)
        out = np.asarray(jax.jit(gj_inverse_any)(jnp.asarray(a32)))
        oracle = np.linalg.inv(a.astype(np.float64))
        rel = np.max(np.abs(out - oracle)) / np.max(np.abs(oracle))
        assert rel < 1e-2, rel


class TestSmallChol:
    @pytest.mark.parametrize("n", [2, 4, 8, 12])
    def test_vs_lapack(self, rng, n):
        from acados_tpu.ops.small_chol import chol_unrolled

        B = 512
        a = rng.normal(size=(B, n, n))
        spd = (a @ np.transpose(a, (0, 2, 1)) + n * np.eye(n))
        spd32 = spd.astype(np.float32)
        out = np.asarray(jax.jit(jax.vmap(chol_unrolled))(
            jnp.asarray(spd32)))
        oracle = np.linalg.cholesky(spd.astype(np.float64))
        assert np.max(np.abs(out - oracle)) < 5e-4


class TestSmallMm:
    def test_vpu_path_matches_oracle(self, rng):
        """The broadcast-multiply-reduce forms (the r4 hot-path fix for
        MXU tile padding) must agree with f64 numpy to f32 accuracy."""
        from acados_tpu.ops import smallmm as smm

        B, i, k, j = 1024, 4, 4, 4
        X = rng.normal(size=(B, i, k)).astype(np.float32)
        Y = rng.normal(size=(B, k, j)).astype(np.float32)
        v = rng.normal(size=(B, k)).astype(np.float32)
        ops = {
            "mm": (smm.mm, X, Y,
                   X.astype(np.float64) @ Y.astype(np.float64)),
            "mTm": (smm.mTm, X, Y, np.einsum(
                "bki,bkj->bij", X.astype(np.float64),
                Y.astype(np.float64))),
            "mv": (smm.mv, X, v, np.einsum(
                "bij,bj->bi", X.astype(np.float64),
                v.astype(np.float64))),
            "mTv": (smm.mTv, X, np.broadcast_to(v[:, :i], (B, i)).copy(),
                    np.einsum("bij,bi->bj", X.astype(np.float64),
                              v[:, :i].astype(np.float64))),
        }
        for name, (f, a, b, oracle) in ops.items():
            out = np.asarray(jax.jit(f)(jnp.asarray(a), jnp.asarray(b)))
            assert np.max(np.abs(out - oracle)) < 1e-5, name


class TestFusedIrkJac:
    def test_step_jac_vs_f64_fd(self):
        """The fused IRK step+Jacobian (single stage factorization for
        all sensitivity columns) on the chip vs host float64 central
        finite differences of the same collocation step."""
        from acados_tpu.sim.integrator import (SimOpts, make_step_fn,
                                               make_step_jac_fn)

        def f_expl(x, u, p, t):
            # stiff-ish nonlinear test ODE
            return jnp.array([x[1], -4.0 * jnp.sin(x[0]) - 0.3 * x[1]
                              + u[0]])

        opts = SimOpts(integrator_type="IRK", num_stages=2, num_steps=1,
                       newton_iter=6)
        step = make_step_fn(f_expl=f_expl, nx=2, opts=opts)
        step_jac = make_step_jac_fn(f_expl=f_expl, nx=2, opts=opts)
        x = jnp.array([0.4, -0.2], jnp.float32)
        u = jnp.array([0.5], jnp.float32)
        p = jnp.zeros((0,), jnp.float32)
        t = jnp.asarray(0.0, jnp.float32)
        dt = jnp.asarray(0.05, jnp.float32)
        xn, A, B = jax.jit(step_jac)(x, u, p, t, dt)

        # host float64 finite differences through the CPU backend
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            def stepc(xv, uv):
                return step(jnp.asarray(xv, jnp.float32),
                            jnp.asarray(uv, jnp.float32), p, t, dt)
            eps = 1e-3
            A_fd = np.zeros((2, 2))
            for j in range(2):
                e = np.zeros(2); e[j] = eps
                A_fd[:, j] = (np.asarray(stepc(np.asarray(x) + e, u))
                              - np.asarray(stepc(np.asarray(x) - e, u))
                              ) / (2 * eps)
            B_fd = ((np.asarray(stepc(x, np.asarray(u) + eps))
                     - np.asarray(stepc(x, np.asarray(u) - eps)))
                    / (2 * eps))[:, None]
        assert np.max(np.abs(np.asarray(A) - A_fd)) < 1e-2
        assert np.max(np.abs(np.asarray(B) - B_fd)) < 1e-2
