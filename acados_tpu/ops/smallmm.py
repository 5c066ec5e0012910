"""Small-matrix products for stage-blocked OCP algebra on TPU.

The Riccati/IPM hot loops multiply batches of tiny matrices — (nx, nx) with
nx ~ 4..40, batched over instances. XLA lowers `jnp.matmul`/`dot_general`
on such shapes to MXU passes padded from nx to the 128-lane systolic tile:
a (4096, 4, 4) @ (4096, 4, 4) batch runs at 4/128-cubed utilization and
dominates the whole IPM iteration (measured: the N=20 Riccati factor scan
cost 1.6 ms/iteration at B=4096 through the MXU and ~0 ms as
broadcast-multiply-reduce on the VPU — the 8x128 vector unit sees the
batch axis on lanes and the tiny matrix dims as cheap sublane broadcasts).

These helpers dispatch: tiny contractions go through explicit
broadcast-multiply-reduce (VPU); larger ones fall back to einsum (MXU),
where systolic utilization recovers. The reference hits the same issue
from the other side: BLASFEO's panel-major kernels exist precisely
because tiny matrices waste standard BLAS (reference
external/blasfeo; SURVEY.md L0). This module is the TPU answer.

Threshold: VPU wins up to surprisingly large n (the MXU pad is cubic);
`VPU_MAX_DIM` bounds the broadcast intermediate (i*k*j elements per
instance).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

VPU_MAX_DIM = 32


def _use_vpu(*dims) -> bool:
    return (jax.default_backend() == "tpu"
            and all(d <= VPU_MAX_DIM for d in dims))


def mm(X, Y):
    """X @ Y for (..., i, k) x (..., k, j)."""
    i, k = X.shape[-2], X.shape[-1]
    j = Y.shape[-1]
    if _use_vpu(i, k, j):
        return (X[..., :, :, None] * Y[..., None, :, :]).sum(-2)
    return X @ Y


def mTm(X, Y):
    """X^T @ Y for (..., k, i) x (..., k, j)."""
    k, i = X.shape[-2], X.shape[-1]
    j = Y.shape[-1]
    if _use_vpu(i, k, j):
        return (X[..., :, :, None] * Y[..., :, None, :]).sum(-3)
    return jnp.swapaxes(X, -1, -2) @ Y


def mmT(X, Y):
    """X @ Y^T for (..., i, k) x (..., j, k)."""
    i, k = X.shape[-2], X.shape[-1]
    j = Y.shape[-2]
    if _use_vpu(i, k, j):
        return (X[..., :, None, :] * Y[..., None, :, :]).sum(-1)
    return X @ jnp.swapaxes(Y, -1, -2)


def mv(X, v):
    """X @ v for (..., i, j) x (..., j)."""
    if _use_vpu(X.shape[-2], X.shape[-1]):
        return (X * v[..., None, :]).sum(-1)
    return (X @ v[..., :, None])[..., 0]


def mTv(X, v):
    """X^T @ v for (..., i, j) x (..., i)."""
    if _use_vpu(X.shape[-2], X.shape[-1]):
        return (X * v[..., :, None]).sum(-2)
    return (jnp.swapaxes(X, -1, -2) @ v[..., :, None])[..., 0]
