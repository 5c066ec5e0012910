"""Pallas inverse cost: (10240, 78, 78) vs 2x(10240, 39, 39) + matmuls.
Interleaved paired rep-differencing to survive chip-load swings."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from acados_tpu.ops.batched_inv import gj_inverse_any as inv


def fence(x):
    a = jax.tree.leaves(x)[0]
    np.asarray(a[(0,) * a.ndim])


def timeit_scan(f, a0, r1=1, r2=5, pairs=4):
    @functools.partial(jax.jit, static_argnames=("r",))
    def run(a, r):
        def body(c, _):
            return 0.999 * c + 0.001 * f(c), 0.0
        c, _ = jax.lax.scan(body, a, None, length=r)
        return c
    fence(run(a0, r1)); fence(run(a0, r2))
    diffs = []
    for _ in range(pairs):
        t0 = time.perf_counter(); fence(run(a0, r1))
        t1 = time.perf_counter(); fence(run(a0, r2))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    return min(diffs) / (r2 - r1) * 1e3


B = 10240
key = jax.random.PRNGKey(0)
A78 = jax.random.normal(key, (B, 78, 78), jnp.float32) + 5 * jnp.eye(78)
A39 = jax.random.normal(key, (B, 39, 39), jnp.float32) + 5 * jnp.eye(39)

print(f"inv (10240,78,78):       {timeit_scan(inv, A78):7.2f} ms", flush=True)
print(f"inv (10240,39,39):       {timeit_scan(inv, A39):7.2f} ms", flush=True)


def cplx_inv(P):
    Q = 0.3 * P
    Pi = inv(P)
    T = Pi @ Q
    S = P + Q @ T
    Si = inv(S)
    return Si - (T @ Si)


print(f"complex inv via 2x39:    {timeit_scan(cplx_inv, A39):7.2f} ms",
      flush=True)

R78 = jax.random.normal(key, (B, 78, 42), jnp.float32)
print(f"apply (78,78)@(78,42):   "
      f"{timeit_scan(lambda r: A78 @ r, R78):7.2f} ms", flush=True)
R39 = jax.random.normal(key, (B, 39, 42), jnp.float32)
print(f"3x (39,39)@(39,42):      "
      f"{timeit_scan(lambda r: A39 @ (A39 @ r) + A39 @ r, R39):7.2f} ms",
      flush=True)
