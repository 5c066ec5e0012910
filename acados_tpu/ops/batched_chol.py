"""Batched small-matrix Cholesky factor/solve as Pallas TPU kernels.

The IPM/Riccati hot loop (`ocp_qp/riccati.py:67`, `ocp_qp/ipm.py`) is
dominated by Cholesky factorizations and triangular solves of *tiny*
matrices (nu, nx ∈ [1, ~50]) over *huge* batches (thousands of OCP
instances). The reference hands this to BLASFEO's panel-major assembly
kernels one matrix at a time (e.g. blasfeo_dpotrf in HPIPM's Riccati,
reference ocp_qp_hpipm.c:347); the TPU-native inversion is to put the
BATCH on the 128-wide lane axis and unroll the n²/2-step
Cholesky–Banachiewicz recurrence into full-width VPU vector ops — every
arithmetic op processes TILE_B instances at once, and the tiny-n
sequential dependency chain costs only its depth, not its width.

Layout: host-side (B, n, n) arrays are transposed once to (n, n, B)
("entry-major, batch-minor") so each L[i,j] lives in one lane-contiguous
row. n is a static trace constant (it is a model dimension), so the
recurrence fully unrolls at trace time.

On non-TPU backends the kernels run in Pallas interpret mode (tests), so
the same code path is exercised everywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_B = 512  # lanes multiple; 4 VPU tiles of f32 per entry-row


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chol_kernel(h_ref, l_ref, *, n):
    L = {}
    for i in range(n):
        for j in range(i + 1):
            s = h_ref[i, j, :]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            if i == j:
                d = jnp.sqrt(s)
                L[(i, j)] = d
                Linv_d = 1.0 / d
                L[("inv", j)] = Linv_d
            else:
                L[(i, j)] = s * L[("inv", j)]
    for i in range(n):
        for j in range(n):
            if j <= i:
                l_ref[i, j, :] = L[(i, j)]
            else:
                l_ref[i, j, :] = jnp.zeros_like(L[(i, i)])


def _solve_kernel(l_ref, b_ref, x_ref, *, n):
    # forward substitution L y = b
    y = {}
    for i in range(n):
        s = b_ref[i, :]
        for k in range(i):
            s = s - l_ref[i, k, :] * y[k]
        y[i] = s / l_ref[i, i, :]
    # back substitution L' x = y
    x = {}
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l_ref[k, i, :] * x[k]
        x[i] = s / l_ref[i, i, :]
    for i in range(n):
        x_ref[i, :] = x[i]


def _factor_solve_kernel(h_ref, b_ref, l_ref, x_ref, *, n):
    _chol_kernel(h_ref, l_ref, n=n)
    _solve_kernel(l_ref, b_ref, x_ref, n=n)


def _pad_batch(a, tile):
    B = a.shape[-1]
    pad = (-B) % tile
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1)
    return a, B


_CHOL_MAX_N = 64  # above this Mosaic's scoped-VMEM stack overflows even at
# TILE 128 with single-buffered blocks (measured: n=90 compiles OOM by
# ~1M; kernel temporaries add to the block footprint). chol_any falls
# back to XLA's cholesky beyond this.


def _auto_tile(n: int) -> int:
    """Largest lane tile whose (n, n, TILE) in/out blocks fit the ~16M
    scoped VMEM stack (about 3 resident copies during the unrolled
    recurrence)."""
    budget = 8 * 1024 * 1024 // (3 * 4 * n * n)
    return max(128, min(_TILE_B, (budget // 128) * 128))


@functools.partial(jax.jit, static_argnames=("tile_b",))
def chol_factor_batched(H, tile_b: int = None):
    """Lower-Cholesky of a batch of SPD matrices. H: (B, n, n) -> (B, n, n).

    Pallas replacement for vmapped `jnp.linalg.cholesky` on tiny n.
    """
    B, n, _ = H.shape
    if tile_b is None:
        tile_b = _auto_tile(n)
    h = jnp.moveaxis(H, 0, -1)                       # (n, n, B)
    h, B0 = _pad_batch(h, tile_b)
    Bp = h.shape[-1]
    grid = (Bp // tile_b,)
    out = pl.pallas_call(
        functools.partial(_chol_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), H.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((n, n, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM,
                               pipeline_mode=pl.Buffered(buffer_count=1))],
        out_specs=pl.BlockSpec((n, n, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM,
                               pipeline_mode=pl.Buffered(buffer_count=1)),
        interpret=_interpret(),
    )(h)
    return jnp.moveaxis(out[..., :B0], -1, 0)


@functools.partial(jax.jit, static_argnames=("tile_b",))
def chol_solve_batched(L, b, tile_b: int = _TILE_B):
    """Solve L L' x = b for a batch. L: (B, n, n) lower, b: (B, n)."""
    B, n, _ = L.shape
    l = jnp.moveaxis(L, 0, -1)
    bb = jnp.moveaxis(b, 0, -1)                      # (n, B)
    l, B0 = _pad_batch(l, tile_b)
    bb, _ = _pad_batch(bb, tile_b)
    Bp = l.shape[-1]
    grid = (Bp // tile_b,)
    out = pl.pallas_call(
        functools.partial(_solve_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, Bp), b.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((n, n, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, tile_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, tile_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(l, bb)
    return jnp.moveaxis(out[..., :B0], -1, 0)


@functools.partial(jax.jit, static_argnames=("tile_b",))
def chol_factor_solve_batched(H, b, tile_b: int = _TILE_B):
    """Fused factor + solve: x = H^{-1} b for SPD H. Returns (x, L).

    One kernel launch, one VMEM residency — the shape the Riccati feedback
    step wants (Huu^-1 @ h_u over the batch).
    """
    B, n, _ = H.shape
    h = jnp.moveaxis(H, 0, -1)
    bb = jnp.moveaxis(b, 0, -1)
    h, B0 = _pad_batch(h, tile_b)
    bb, _ = _pad_batch(bb, tile_b)
    Bp = h.shape[-1]
    grid = (Bp // tile_b,)
    L, x = pl.pallas_call(
        functools.partial(_factor_solve_kernel, n=n),
        out_shape=(jax.ShapeDtypeStruct((n, n, Bp), H.dtype),
                   jax.ShapeDtypeStruct((n, Bp), b.dtype)),
        grid=grid,
        in_specs=[pl.BlockSpec((n, n, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, tile_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((n, n, tile_b), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n, tile_b), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(h, bb)
    return (jnp.moveaxis(x[..., :B0], -1, 0),
            jnp.moveaxis(L[..., :B0], -1, 0))


# ---------------------------------------------------------------------------
# vmap-collapsing, differentiable entry point (the production hook)
# ---------------------------------------------------------------------------

@jax.custom_batching.custom_vmap
def _chol_flat(H):
    """(B, n, n) flat batch. Under vmap the batch axes collapse into B so
    the kernel always sees the full lane batch (same pattern as
    ops.batched_inv._inv_flat)."""
    if jax.default_backend() == "tpu" and H.shape[-1] <= _CHOL_MAX_N:
        return chol_factor_batched(H)
    return jnp.linalg.cholesky(H)


@_chol_flat.def_vmap
def _chol_flat_vmap(axis_size, in_batched, H):
    del axis_size, in_batched
    B2, B = H.shape[0], H.shape[1]
    out = _chol_flat(H.reshape((B2 * B,) + H.shape[2:]))
    return out.reshape(H.shape), True


@jax.custom_jvp
def chol_any(H: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of (..., n, n) SPD; nested-vmap-transparent,
    lane-batched on TPU (XLA's batched cholesky custom-call is the
    alternative and costs ~4 ms at (1024, 39, 39) where this is noise-
    level). The riccati/dense-IPM hot paths use this for
    n > small_chol.UNROLL_MAX_N.

    Differentiable via the closed-form tangent
    dL = L phi(L^-1 dH L^-T), phi = tril - diag/2 (jnp-level triangular
    solves: the tangent path only runs in the sensitivity layers)."""
    if H.ndim == 2:
        return _chol_flat(H[None])[0]
    lead = H.shape[:-2]
    out = _chol_flat(H.reshape((-1,) + H.shape[-2:]))
    return out.reshape(lead + H.shape[-2:])


@chol_any.defjvp
def _chol_any_jvp(primals, tangents):
    (H,), (dH,) = primals, tangents
    L = chol_any(H)
    from jax.scipy.linalg import solve_triangular
    Li_dH = solve_triangular(L, dH, lower=True)
    M = jnp.swapaxes(
        solve_triangular(L, jnp.swapaxes(Li_dH, -1, -2), lower=True),
        -1, -2)
    # phi(M) = tril(M) with halved diagonal
    diag = M.diagonal(axis1=-2, axis2=-1)
    phi = jnp.tril(M, -1) + 0.5 * jnp.einsum(
        "...i,ij->...ij", diag, jnp.eye(L.shape[-1], dtype=L.dtype))
    dL = L @ phi
    return L, dL
