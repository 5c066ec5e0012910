"""Explicit Runge-Kutta integrator.

TPU-native counterpart of the reference ERK module
(/root/reference/acados/sim/sim_erk_integrator.c:638). Key inversion: the
reference needs CasADi-generated VDE functions (EXPL_VDE_FOR / EXPL_VDE_ADJ /
EXPL_ODE_HES, sim_common.h:50-54) for sensitivities; here the step map is a
pure jax function and `jax.jacfwd` / `jax.vjp` / `jax.hessian` applied to it
*are* the forward VDE, adjoint VDE and Hessian propagation — one code path,
fused by XLA, batched by vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.sim.butcher import erk_tableau


def make_erk_step(f, num_stages: int = 4, num_steps: int = 1):
    """Build an explicit-RK one-interval step function.

    Args:
      f: dynamics, f(x, u, p, t) -> xdot (pure jax function).
      num_stages: 1, 2 or 4.
      num_steps: integration steps per interval (reference: sim opts
        num_steps, sim_common.h:121).

    Returns:
      step(x, u, p, t0, dt) -> x_next, integrating over [t0, t0+dt].
    """
    A, b, c = erk_tableau(num_stages)

    def step(x, u, p, t0, dt):
        h = dt / num_steps
        # cast tableau constants to the state dtype: under jax_enable_x64 a
        # raw numpy-f64 coefficient would silently promote an f32 state to
        # f64 (caught by the f32 production-path test tier)
        Ax = A.astype(x.dtype)
        bx = b.astype(x.dtype)
        cx = c.astype(x.dtype)

        def substep(x, i):
            t = t0 + i * h
            ks = []
            for si in range(num_stages):
                xi = x
                for sj in range(si):
                    if A[si, sj] != 0.0:
                        xi = xi + (h * Ax[si, sj]) * ks[sj]
                ks.append(f(xi, u, p, t + cx[si] * h))
            x_next = x
            for sj in range(num_stages):
                x_next = x_next + (h * bx[sj]) * ks[sj]
            return x_next, None

        x_out, _ = jax.lax.scan(substep, x, jnp.arange(num_steps))
        return x_out

    return jax.jit(step)

