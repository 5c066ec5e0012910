"""Pallas L0 kernel tests (interpret mode on CPU; same code path the TPU
compiles). Oracle: numpy LAPACK on the identical batch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acados_tpu.ops import (chol_factor_batched, chol_factor_solve_batched,
                            chol_solve_batched)


@pytest.mark.parametrize("n", [1, 2, 5, 11])
@pytest.mark.parametrize("B", [1, 7, 300])
def test_chol_factor_matches_lapack(n, B):
    rng = np.random.default_rng(n * 100 + B)
    A = rng.normal(size=(B, n, n))
    H = A @ np.swapaxes(A, 1, 2) + 3 * np.eye(n)
    L = np.asarray(chol_factor_batched(jnp.asarray(H), tile_b=128))
    np.testing.assert_allclose(L, np.linalg.cholesky(H), atol=1e-10)


@pytest.mark.parametrize("n", [2, 5])
def test_chol_solve_and_fused(n):
    rng = np.random.default_rng(n)
    B = 64
    A = rng.normal(size=(B, n, n))
    H = A @ np.swapaxes(A, 1, 2) + 3 * np.eye(n)
    b = rng.normal(size=(B, n))
    x_ref = np.linalg.solve(H, b[..., None])[..., 0]
    L = chol_factor_batched(jnp.asarray(H), tile_b=128)
    x = np.asarray(chol_solve_batched(L, jnp.asarray(b), tile_b=128))
    np.testing.assert_allclose(x, x_ref, atol=1e-10)
    x2, L2 = chol_factor_solve_batched(jnp.asarray(H), jnp.asarray(b),
                                       tile_b=128)
    np.testing.assert_allclose(np.asarray(x2), x_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(L2), np.asarray(L), atol=1e-12)


def test_f32_batch_padding():
    """Non-multiple-of-tile batches are padded and truncated correctly."""
    rng = np.random.default_rng(7)
    B, n = 130, 3
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    H = A @ np.swapaxes(A, 1, 2) + np.float32(3) * np.eye(n, dtype=np.float32)
    L = np.asarray(chol_factor_batched(jnp.asarray(H), tile_b=128))
    assert L.shape == (B, n, n)
    np.testing.assert_allclose(L, np.linalg.cholesky(H.astype(np.float64)),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# general linear solves (ops/linsolve.py, ops/batched_inv.py)
# ---------------------------------------------------------------------------

def test_gj_inverse_xla():
    """Masked Gauss-Jordan with partial pivoting vs LAPACK (f64)."""
    from acados_tpu.ops.linsolve import gj_inverse
    rng = np.random.default_rng(0)
    for n in (1, 3, 16, 78):
        A = rng.normal(size=(25, n, n))
        if n > 1:
            A[0, 0, 0] = 0.0  # force a pivot
        Ai = np.asarray(gj_inverse(jnp.asarray(A)))
        np.testing.assert_allclose(Ai, np.linalg.inv(A), atol=1e-8)
    # unbatched
    A = rng.normal(size=(9, 9))
    np.testing.assert_allclose(np.asarray(gj_inverse(jnp.asarray(A))),
                               np.linalg.inv(A), atol=1e-9)


def test_linsolve_matches_solve():
    from acados_tpu.ops.linsolve import linsolve
    rng = np.random.default_rng(1)
    A = rng.normal(size=(12, 7, 7)) + 3 * np.eye(7)
    b = rng.normal(size=(12, 7))
    np.testing.assert_allclose(np.asarray(linsolve(jnp.asarray(A),
                                                   jnp.asarray(b))),
                               np.linalg.solve(A, b[..., None])[..., 0],
                               atol=1e-10)


def test_pallas_inverse_kernel_interpret():
    """Lane-batched Pallas GJ kernel (interpret mode on CPU) + the
    Schur-complement recursion above the VMEM size cap."""
    from acados_tpu.ops.batched_inv import (_gj_inverse_pallas,
                                            _schur_inverse)
    rng = np.random.default_rng(2)
    A = (np.eye(13) - 0.1 * rng.normal(size=(10, 13, 13))).astype(np.float32)
    Ai = np.asarray(_gj_inverse_pallas(jnp.asarray(A)))
    np.testing.assert_allclose(Ai, np.linalg.inv(A.astype(np.float64)),
                               atol=2e-4)
    # Schur path (n > 48): pallas base case in interpret mode
    A = (np.eye(60) - 0.05 * rng.normal(size=(4, 60, 60))).astype(np.float32)
    Ai = np.asarray(_schur_inverse(jnp.asarray(A)))
    np.testing.assert_allclose(Ai, np.linalg.inv(A.astype(np.float64)),
                               atol=5e-3)


def test_gj_inverse_any_nested_vmap_and_ad():
    """custom_vmap collapse under nested vmap + custom_jvp identity."""
    from acados_tpu.ops.batched_inv import gj_inverse_any
    rng = np.random.default_rng(3)
    A = rng.normal(size=(3, 5, 6, 6)) + 4 * np.eye(6)
    out = np.asarray(jax.jit(jax.vmap(jax.vmap(gj_inverse_any)))(
        jnp.asarray(A)))
    np.testing.assert_allclose(out, np.linalg.inv(A), atol=1e-9)
    # forward-mode: d(A^-1) = -A^-1 dA A^-1
    A1 = jnp.asarray(rng.normal(size=(6, 6)) + 4 * np.eye(6))
    dA = jnp.asarray(rng.normal(size=(6, 6)))
    _, tang = jax.jvp(gj_inverse_any, (A1,), (dA,))
    Ai = np.linalg.inv(np.asarray(A1))
    np.testing.assert_allclose(np.asarray(tang), -Ai @ np.asarray(dA) @ Ai,
                               atol=1e-9)
    # reverse-mode transposes the linear tangent map
    g = jax.grad(lambda M: jnp.sum(gj_inverse_any(M) ** 2))(A1)
    g_ref = jax.grad(lambda M: jnp.sum(jnp.linalg.inv(M) ** 2))(A1)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-8)


def test_irk_step_jac_matches_jacfwd():
    """The fused step+Jacobian fast path == jacfwd of the plain step."""
    from acados_tpu.sim.irk import (implicit_from_explicit, make_irk_step,
                                    make_irk_step_jac)
    from acados_tpu.models.pendulum import pendulum_ode
    f_impl = implicit_from_explicit(pendulum_ode)
    step = make_irk_step(f_impl, nx=4, num_stages=3, num_steps=2,
                         newton_iter=5)
    step_jac = make_irk_step_jac(f_impl, nx=4, num_stages=3, num_steps=2,
                                 newton_iter=5)
    x = jnp.asarray([0.1, 0.6, -0.2, 0.3])
    u = jnp.asarray([1.5])
    p = jnp.zeros((0,))
    xn_ref, _ = step(x, u, p, 0.0, 0.08)
    w = jnp.concatenate([x, u])
    J_ref = jax.jacfwd(lambda ww: step(ww[:4], ww[4:], p, 0.0, 0.08)[0])(w)
    xn, A, B = step_jac(x, u, p, 0.0, 0.08)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xn_ref),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(A), np.asarray(J_ref[:, :4]),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(B), np.asarray(J_ref[:, 4:]),
                               atol=1e-8)


class TestCholAny:
    """ops.batched_chol.chol_any: the production entry the Riccati
    (riccati._chol, n > UNROLL_MAX_N) and dense-IPM paths use on TPU.
    On CPU it dispatches to jnp.linalg.cholesky; the Pallas kernel line
    itself runs in interpret mode here."""

    def test_matches_lapack(self):
        from acados_tpu.ops.batched_chol import chol_any, \
            chol_factor_batched
        rng = np.random.default_rng(0)
        for B, n in ((4, 5), (16, 39), (8, 64)):
            A = rng.normal(size=(B, n, n))
            H = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
            H = jnp.asarray(H)
            np.testing.assert_allclose(np.asarray(chol_any(H)),
                                       np.asarray(jnp.linalg.cholesky(H)),
                                       atol=1e-10)
            if n <= 8:
                # the Pallas kernel line in interpret mode (CPU): small
                # n only — interpret mode costs ~20 ms/op and the n^3
                # unrolled recurrence makes n=39 take HOURS here. The
                # real-kernel accuracy at production n runs on the TPU
                # tier (tests_tpu/test_tpu_kernels.py).
                np.testing.assert_allclose(
                    np.asarray(chol_factor_batched(H)),
                    np.asarray(jnp.linalg.cholesky(H)), atol=1e-9)

    def test_nested_vmap_collapses(self):
        from acados_tpu.ops.batched_chol import chol_any
        rng = np.random.default_rng(1)
        A = rng.normal(size=(3, 4, 6, 6))
        H = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 6 * np.eye(6))
        out = jax.vmap(jax.vmap(chol_any))(H)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(jnp.linalg.cholesky(H)),
                                   atol=1e-10)

    def test_jvp_matches_ad(self):
        from acados_tpu.ops.batched_chol import chol_any
        rng = np.random.default_rng(2)
        A = rng.normal(size=(5, 7, 7))
        H = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 7 * np.eye(7))
        dH = jnp.asarray(rng.normal(size=(5, 7, 7)))
        dH = 0.5 * (dH + jnp.swapaxes(dH, -1, -2))
        _, t1 = jax.jvp(chol_any, (H,), (dH,))
        _, t2 = jax.jvp(jnp.linalg.cholesky, (H,), (dH,))
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                                   atol=1e-9)
        # reverse mode transposes the linear tangent automatically.
        # Gradients agree after symmetrization: jnp's cholesky reads
        # only the lower triangle, so the raw gradients distribute the
        # same symmetric-direction sensitivity differently between the
        # triangles; H is SPD and perturbed symmetrically in every
        # production use.
        g1 = jax.grad(lambda h: jnp.sum(chol_any(h) ** 2))(H)
        g2 = jax.grad(lambda h: jnp.sum(jnp.linalg.cholesky(h) ** 2))(H)
        sym = lambda g: np.asarray(g) + np.swapaxes(np.asarray(g), -1, -2)
        np.testing.assert_allclose(sym(g1), sym(g2), atol=1e-9)
