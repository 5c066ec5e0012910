"""Batched small-matrix inverse: Pallas TPU kernel + vmap-collapsing wrapper.

The IRK stage-system solve needs A^{-1} for huge batches of tiny general
matrices (see ops/linsolve.py for why XLA's pivoted LU is off the table).
A jnp-level Gauss-Jordan still streams the whole (B, n, 2n) batch from
HBM once per elimination step (n passes -> measured 494 ms for
(10240, 78, 78) f32); the Pallas kernel below keeps each (n, 2n, TILE_B)
tile resident in VMEM for ALL n steps, cutting HBM traffic to one
read + one write of the batch.

Layout: batch on the 128-wide lane axis (like ops/batched_chol.py), rows
on the leading (untiled) axis, columns on sublanes. Partial pivoting is
per-lane: a masked argmax down the rows plus one-hot row swaps — no
gathers, every op is a full-width VPU op.

The public entry `gj_inverse_any` composes with arbitrarily nested
`jax.vmap` via `jax.custom_batching.custom_vmap`: each vmap level
collapses its batch axis into the flat batch, so the kernel always sees
the full (B*N*..., n, n) batch no matter where in the solver stack the
inverse is requested. (A plain function would be re-traced per instance
under vmap and lose the lane batching.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acados_tpu.ops.linsolve import gj_inverse as _gj_inverse_xla


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gj_inv_kernel(a_ref, out_ref, m_ref, *, n, nc):
    """In-VMEM Gauss-Jordan with per-lane partial pivoting.

    a_ref: (n, nc, TB) input (columns 8-padded, nc >= n);
    out_ref: (n, nc, TB); m_ref: (n, 2*nc, TB) scratch holding the
    augmented [A | I] (padded columns are zero and never pivoted).
    """
    tb = a_ref.shape[-1]
    dt = a_ref.dtype
    # build [A | I]
    m_ref[:, :nc, :] = a_ref[:]
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, nc, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, nc, 1), 1)
    m_ref[:, nc:, :] = jnp.broadcast_to((ii == jj).astype(dt), (n, nc, tb))

    rowid = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0)      # (n, TB)
    colid3 = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * nc, 1), 1)
    colid2 = jax.lax.broadcasted_iota(jnp.int32, (2 * nc, 1), 0)

    # Mosaic has no dynamic_slice on values: row/column k extraction is a
    # ref read on the (cheap, untiled) leading axis or a one-hot
    # contraction; the per-lane pivot row is a contraction by necessity
    # (each lane picks a different row).
    def step(k, _):
        M = m_ref[:]                                             # (n,2nc,TB)
        sel_k3 = (colid3 == k).astype(dt)                        # (n,2nc,1)
        colk = jnp.sum(M * sel_k3, axis=1)                       # (n, TB)
        mag = jnp.where(rowid >= k, jnp.abs(colk), -1.0)
        p = jnp.argmax(mag, axis=0)                              # (TB,)
        onehot = (rowid == p[None, :]).astype(dt)                # (n, TB)
        prow = jnp.sum(M * onehot[:, None, :], axis=0)           # (2nc, TB)
        krow = m_ref[pl.ds(k, 1)][0]                             # (2nc, TB)
        delta = prow - krow
        is_k = (rowid == k).astype(dt)                           # (n, TB)
        M = (M + is_k[:, None, :] * delta[None, :, :]
             - onehot[:, None, :] * delta[None, :, :])
        piv = jnp.sum(prow * (colid2 == k).astype(dt), axis=0)   # (TB,)
        nrow = prow / piv[None, :]                               # (2nc, TB)
        colk_s = jnp.sum(M * sel_k3, axis=1)                     # swapped col
        factors = jnp.where(rowid == k, 0.0, colk_s)             # (n, TB)
        M = M - factors[:, None, :] * nrow[None, :, :]
        M = jnp.where((rowid == k)[:, None, :], nrow[None, :, :], M)
        m_ref[:] = M
        return 0

    jax.lax.fori_loop(0, n, step, 0)
    out_ref[:] = m_ref[:, nc:, :]


_TILE_B = 128
_GJ_MAX_N = 48  # above this the (n, 2n, 128) working set blows VMEM


def _schur_inverse(A):
    """Blocked 2x2 Schur-complement inverse for n > _GJ_MAX_N.

    A: (B, n, n). Recurses on half-size blocks (Pallas GJ at the base);
    the combination is six batched MXU matmuls. Pivoting is within-block
    only — fine for the diagonally-dominant-ish IRK stage Jacobians this
    serves; pathological matrices should use ops.linsolve on CPU.
    """
    B, n, _ = A.shape
    m = -(-n // 2)
    if 2 * m > n:
        # pad to even split with an identity tail (decouples exactly)
        pad = 2 * m - n
        A = jnp.pad(A, ((0, 0), (0, pad), (0, pad)))
        A = A.at[:, n:, n:].set(jnp.eye(pad, dtype=A.dtype))
        return _schur_inverse(A)[:, :n, :n]
    A11, A12 = A[:, :m, :m], A[:, :m, m:]
    A21, A22 = A[:, m:, :m], A[:, m:, m:]
    with jax.default_matmul_precision("highest"):
        X = _inv_impl(A11)
        XA12 = X @ A12
        A21X = A21 @ X
        S = A22 - A21 @ XA12
        Y = _inv_impl(S)
        B21 = -(Y @ A21X)
        B12 = -(XA12 @ Y)
        B11 = X - XA12 @ B21
    top = jnp.concatenate([B11, B12], axis=-1)
    bot = jnp.concatenate([B21, Y], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _inv_impl(A):
    if A.shape[-1] <= _GJ_MAX_N:
        return _gj_inverse_pallas(A)
    return _schur_inverse(A)


@functools.partial(jax.jit, static_argnames=())
def _gj_inverse_pallas(A):
    """A: (B, n, n) -> (B, n, n) via the lane-batched kernel."""
    B, n, _ = A.shape
    tb = _TILE_B
    nc = -(-n // 8) * 8                              # columns 8-padded
    a = jnp.moveaxis(A, 0, -1)                       # (n, n, B)
    if nc > n:
        a = jnp.pad(a, ((0, 0), (0, nc - n), (0, 0)))
    pad = (-B) % tb
    if pad:
        # pad with identities so the padded lanes stay non-singular
        eye = jnp.broadcast_to(
            jnp.pad(jnp.eye(n, dtype=A.dtype),
                    ((0, 0), (0, nc - n)))[:, :, None], (n, nc, pad))
        a = jnp.concatenate([a, eye], axis=-1)
    Bp = a.shape[-1]
    out = pl.pallas_call(
        functools.partial(_gj_inv_kernel, n=n, nc=nc),
        out_shape=jax.ShapeDtypeStruct((n, nc, Bp), A.dtype),
        grid=(Bp // tb,),
        # single-buffered in/out: the per-tile compute (n elimination
        # passes over the VMEM-resident tile) dwarfs the tile DMA, and
        # double buffering would blow the 16M VMEM budget at n ~ 80
        in_specs=[pl.BlockSpec((n, nc, tb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM,
                               pipeline_mode=pl.Buffered(buffer_count=1))],
        out_specs=pl.BlockSpec((n, nc, tb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM,
                               pipeline_mode=pl.Buffered(buffer_count=1)),
        scratch_shapes=[pltpu.VMEM((n, 2 * nc, tb), A.dtype)],
        interpret=_interpret(),
    )(a)
    return jnp.moveaxis(out[:, :n, :B], -1, 0)


@jax.custom_batching.custom_vmap
def _inv_flat(A):
    """A: (B, n, n) flat batch -> inverses. Under vmap, batch axes
    collapse into B (see module docstring)."""
    if jax.default_backend() == "tpu":
        return _inv_impl(A)
    return _gj_inverse_xla(A)


@_inv_flat.def_vmap
def _inv_flat_vmap(axis_size, in_batched, A):
    del axis_size, in_batched
    B2, B = A.shape[0], A.shape[1]
    out = _inv_flat(A.reshape((B2 * B,) + A.shape[2:]))
    return out.reshape(A.shape), True


@jax.custom_jvp
def gj_inverse_any(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., n, n); nested-vmap-transparent, lane-batched on
    TPU. The entry point the IRK/Riccati hot paths use.

    Differentiable via the closed-form identity d(A^-1) = -A^-1 dA A^-1
    (custom_jvp below) so AD never traces the kernel internals; the
    tangent is linear, so reverse mode transposes it automatically.
    """
    if A.ndim == 2:
        return _inv_flat(A[None])[0]
    lead = A.shape[:-2]
    out = _inv_flat(A.reshape((-1,) + A.shape[-2:]))
    return out.reshape(lead + A.shape[-2:])


@gj_inverse_any.defjvp
def _gj_inverse_jvp(primals, tangents):
    (A,), (dA,) = primals, tangents
    Ai = gj_inverse_any(A)
    with jax.default_matmul_precision("highest"):
        dAi = -(Ai @ dA @ Ai)
    return Ai, dAi
