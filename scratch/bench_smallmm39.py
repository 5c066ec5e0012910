"""Microbenchmark: (B, n, n) @ (B, n, n) strategies at n=39 (chain model).

Candidates:
  mxu      : plain X @ Y (dot_general, padded to 128 tile)
  vpu      : broadcast-multiply-reduce (current smallmm form, cap raised)
  vpuK     : k-blocked broadcast-reduce (k split into <=32 chunks)
  pallas   : batch-on-lanes Pallas GEMM (batched_inv layout)

Timing: R reps chained on device via lax.scan (dodges the ~2ms dispatch
floor), fenced by a host read of one element.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mxu(X, Y):
    return X @ Y


def vpu(X, Y):
    return (X[..., :, :, None] * Y[..., None, :, :]).sum(-2)


def vpuK(X, Y, kc=16):
    k = X.shape[-1]
    out = None
    for k0 in range(0, k, kc):
        part = (X[..., :, k0:k0 + kc, None] * Y[..., None, k0:k0 + kc, :]).sum(-2)
        out = part if out is None else out + part
    return out


def _mm_kernel(a_ref, b_ref, o_ref, *, n):
    # a: (n, n, TB), b: (n, n, TB), o: (n, n, TB); batch on lanes.
    a = a_ref[:]
    b = b_ref[:]
    # out[i, j, :] = sum_k a[i, k, :] * b[k, j, :]
    acc = jnp.zeros_like(a)
    for k in range(n):               # static unroll: n is compile-time
        acc = acc + a[:, k, :][:, None, :] * b[k, :, :][None, :, :]
    o_ref[:] = acc


_TB = 128


@jax.jit
def pallas_mm(X, Y):
    B, n, _ = X.shape
    a = jnp.moveaxis(X, 0, -1)
    b = jnp.moveaxis(Y, 0, -1)
    pad = (-B) % _TB
    if pad:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
        b = jnp.pad(b, ((0, 0), (0, 0), (0, pad)))
    Bp = a.shape[-1]
    out = pl.pallas_call(
        functools.partial(_mm_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), X.dtype),
        grid=(Bp // _TB,),
        in_specs=[pl.BlockSpec((n, n, _TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, n, _TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, _TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
    )(a, b)
    return jnp.moveaxis(out[:, :, :B], -1, 0)


def _run_reps(f, X, Y, reps):
    @functools.partial(jax.jit, static_argnames=('r',))
    def run(X, Y, r):
        def body(c, _):
            Xc, Yc = c
            Z = f(Xc, Yc)
            return (Z * 0.999 + X * 0.001, Yc), 0.0
        (Zf, _), _ = jax.lax.scan(body, (X, Y), None, length=r)
        return Zf
    Z = run(X, Y, reps)
    np.asarray(Z[0, 0, 0])  # warm + fence
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        Z = run(X, Y, reps)
        np.asarray(Z[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_form(f, X, Y, reps=None):
    # difference two rep counts to cancel dispatch + tunnel round trip
    r1, r2 = 20, 220
    t1 = _run_reps(f, X, Y, r1)
    t2 = _run_reps(f, X, Y, r2)
    return (t2 - t1) / (r2 - r1) * 1e6  # us per call


def main():
    key = jax.random.PRNGKey(0)
    for n in (20, 39, 48, 64):
        for B in (256, 1024, 4096, 10240):
            k1, k2 = jax.random.split(jax.random.fold_in(key, n * 100000 + B))
            X = jax.random.normal(k1, (B, n, n), jnp.float32)
            Y = jax.random.normal(k2, (B, n, n), jnp.float32)
            res = {}
            res["mxu"] = time_form(mxu, X, Y)
            res["vpu"] = time_form(vpu, X, Y)
            res["vpuK16"] = time_form(lambda a, b: vpuK(a, b, 16), X, Y)
            res["vpuK32"] = time_form(lambda a, b: vpuK(a, b, 32), X, Y)
            try:
                res["pallas"] = time_form(pallas_mm, X, Y)
                err = float(jnp.max(jnp.abs(pallas_mm(X, Y) - X @ Y)))
            except Exception as e:
                res["pallas"] = float("nan")
                err = float("nan")
                print("pallas fail:", type(e).__name__, str(e)[:200])
            line = " ".join(f"{k}={v:9.1f}us" for k, v in res.items())
            print(f"n={n:3d} B={B:6d}  {line}  pallas_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
