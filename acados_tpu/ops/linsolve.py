"""Batched small-matrix general linear solves, TPU-shaped.

XLA's pivoted LU (`jnp.linalg.solve` / `lu_factor`) is catastrophically
slow on TPU for huge batches of tiny matrices — measured 253 ms for
(10240, 78, 78) f32 on v5e (~13 GFLOPS), because the row-pivoted panel
algorithm serializes into gathers and dynamic slices. The IRK stage-system
solve (reference: BLASFEO `blasfeo_dgetrf_rp` + `dtrsv` inside the Newton
loop, /root/reference/acados/sim/sim_irk_integrator.c:1112-1157) is exactly
this shape: (B·N) independent (ns·(nx+nz))² systems.

TPU-native replacement: Gauss-Jordan elimination with partial pivoting,
written as n static steps of FULL-matrix masked updates. Every step is an
elementwise op over the whole (..., n, 2n) batch — XLA fuses them onto the
VPU at full width, and the per-lane pivot selection is a batched argmax +
one-hot row swap (no gathers). The output is the explicit inverse, so all
downstream Newton / sensitivity solves become batched MXU matmuls. The
2n³ elementwise flops (vs n³/3 for LU) are the price for full
vectorization — at these sizes the VPU is latency-bound anyway, and the
measured win is ~50x (see BENCH_r03 phase table).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gj_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of a batch of small matrices.

    A: (..., n, n). Returns A^{-1} (..., n, n). Partial (row) pivoting:
    numerically equivalent to LAPACK getri for well-scaled systems.
    n is static; the elimination unrolls/loops over n steps of
    full-matrix masked updates (vmap/batch transparent).
    """
    n = A.shape[-1]
    dt = A.dtype
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dt), A.shape)
    M = jnp.concatenate([A, eye], axis=-1)          # (..., n, 2n)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)

    idx = rows[:, 0]                                # (n,) int32

    def step(k, M):
        col = M[..., :, k]                          # (..., n)
        mag = jnp.where(idx >= k, jnp.abs(col), -1.0)
        p = jnp.argmax(mag, axis=-1)                # (...,) pivot row
        # swap rows k and p via one-hot blending (no gather); p == k is a
        # no-op because the two correction terms cancel
        onehot_p = (idx == p[..., None]).astype(dt)         # (..., n)
        is_k = (idx == k).astype(dt)                        # (n,)
        row_p = jnp.einsum("...i,...ij->...j", onehot_p, M)
        row_k = M[..., k, :]
        delta = row_p - row_k
        M = (M + is_k[..., :, None] * delta[..., None, :]
             - onehot_p[..., :, None] * delta[..., None, :])
        # normalize the pivot row, eliminate column k from every other row
        norm_row = M[..., k, :] / M[..., k, k][..., None]
        factors = jnp.where(idx == k, 0.0, M[..., :, k])
        M = M - factors[..., :, None] * norm_row[..., None, :]
        M = jnp.where((idx == k)[:, None], norm_row[..., None, :], M)
        return M

    M = jax.lax.fori_loop(0, n, step, M)
    return M[..., :, n:]


def linsolve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for batched small A.

    On TPU uses the lane-batched Pallas Gauss-Jordan inverse + matmul
    (ops.batched_inv); elsewhere defers to XLA/LAPACK.
    b: (..., n) or (..., n, m).
    """
    if jax.default_backend() != "tpu":
        if b.ndim == A.ndim - 1:
            return jnp.linalg.solve(A, b[..., None])[..., 0]
        return jnp.linalg.solve(A, b)
    if A.shape[-1] <= 8:
        # tiny systems: the in-line masked elimination fuses into the
        # surrounding program (a Pallas launch costs more than it saves,
        # e.g. inside the parallel-Riccati combine at nx ~ 4)
        Ainv = gj_inverse(A)
    else:
        from acados_tpu.ops.batched_inv import gj_inverse_any
        Ainv = gj_inverse_any(A)
    with jax.default_matmul_precision("highest"):
        if b.ndim == A.ndim - 1:
            return jnp.einsum("...ij,...j->...i", Ainv, b)
        return Ainv @ b
