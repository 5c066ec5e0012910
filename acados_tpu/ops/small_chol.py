"""Unrolled tiny-matrix Cholesky factor/solve as plain jnp expressions.

The Riccati scan factors Huu (nu x nu, nu typically 1-8) once per stage
step. XLA's `cholesky` + `triangular_solve` are custom-call kernels with
per-invocation overhead that dominates at these sizes inside a
`lax.scan` (40 sequential steps); unrolling the n(n+1)/2-entry
Cholesky-Banachiewicz recurrence into scalar-slice jnp ops lets XLA fuse
the whole step body into a handful of VPU ops. Batch/vmap/scan
transparent and differentiable (everything is jnp arithmetic).

Reference analog: BLASFEO's fixed-size potrf kernels selected for tiny
blocks (the same "small matrices deserve unrolled code" inversion).
Use for static n <= ~12; fall back to jax.scipy elsewhere.
"""
from __future__ import annotations

import jax.numpy as jnp

UNROLL_MAX_N = 12


def chol_unrolled(H: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of (..., n, n) SPD, unrolled at trace time."""
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    z = jnp.zeros_like(H[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else z for j in range(n)],
                      axis=-1) for i in range(n)]
    return jnp.stack(rows, axis=-2)


def cho_solve_unrolled(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L L' X = B. L: (..., n, n) lower; B: (..., n) or (..., n, m)."""
    vec = B.ndim == L.ndim - 1
    if vec:
        B = B[..., None]
    n = L.shape[-1]
    # forward substitution L y = B
    y = [None] * n
    for i in range(n):
        s = B[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * y[k]
        y[i] = s / L[..., i, i, None]
    # back substitution L' x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * x[k]
        x[i] = s / L[..., i, i, None]
    X = jnp.stack(x, axis=-2)
    return X[..., 0] if vec else X
