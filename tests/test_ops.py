"""Pallas L0 kernel tests (interpret mode on CPU; same code path the TPU
compiles). Oracle: numpy LAPACK on the identical batch."""
import numpy as np
import pytest

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
