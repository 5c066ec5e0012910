"""Lifted implicit Runge-Kutta integrator.

TPU-native counterpart of the reference lifted IRK module
(/root/reference/acados/sim/sim_lifted_irk_integrator.c:655): the collocation
stage variables K are *lifted* into solver memory and carried across calls,
so each integrator call performs a single Newton iteration on the stage
equations, warm-started from the previous outer (SQP) iteration. At an SQP
fixed point the lifted stage values converge together with the NLP iterate,
giving IRK accuracy at one-Newton-per-iteration cost.

Functional-JAX inversion of the reference design: the reference hides K in
the integrator's arena memory (sim_lifted_irk_memory); here the lifted state
is an explicit value threaded through the step function —
``step(x, u, p, t0, dt, K) -> (x_next, K_next)`` — so it jits, vmaps and
shards like any other iterate component. `AcadosSimSolver` (stateful at the
Python layer) holds it between `simulate` calls, mirroring the reference's
memory semantics.

Sensitivities: the reference propagates forward sensitivities through the
single Newton step via hand-written BLASFEO updates. Here the step is plain
traced JAX, so `jax.jacfwd` through it differentiates the *lifted* map
exactly (including the K dependence), which is the Newton-type sensitivity
the lifted scheme defines.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.sim.butcher import gauss_legendre_tableau, radau_iia_tableau


def make_lifted_irk_step(f_impl, nx: int, nz: int = 0, num_stages: int = 3,
                         num_steps: int = 1, newton_iter: int = 1,
                         collocation: str = "GAUSS_LEGENDRE"):
    """Build a lifted-IRK one-interval step with explicit lifted state.

    Args:
      f_impl: f(xdot, x, z, u, p, t) -> (nx + nz,) residual.
      nx, nz: differential / algebraic dimensions.
      num_stages: collocation stages.
      num_steps: integration sub-steps per interval (each owns lifted vars).
      newton_iter: Newton iterations per call (reference: 1 — that is the
        point of lifting; >1 supported for robustness).
      collocation: 'GAUSS_LEGENDRE' or 'RADAU_IIA'.

    Returns:
      (step, K0) where step(x, u, p, t0, dt, K) -> (x_next, K_next) and
      K0 is the zero-initialised lifted state of shape
      (num_steps, num_stages * (nx + nz)).
    """
    if collocation.upper() in ("GAUSS_LEGENDRE", "GAUSS"):
        A, b, c = gauss_legendre_tableau(num_stages)
    elif collocation.upper() in ("RADAU_IIA", "RADAU"):
        A, b, c = radau_iia_tableau(num_stages)
    else:
        raise ValueError(f"unknown collocation {collocation}")
    ns = num_stages
    nw = ns * (nx + nz)

    def step(x, u, p, t0, dt, K):
        h = dt / num_steps
        A_ = jnp.asarray(A, x.dtype)
        b_ = jnp.asarray(b, x.dtype)
        c_ = c.astype(x.dtype)

        def residual(w, x0, t):
            Kk = w[: ns * nx].reshape(ns, nx)
            Zk = w[ns * nx:].reshape(ns, nz)
            xi = x0[None, :] + h * (A_ @ Kk)
            r = [f_impl(Kk[i], xi[i], Zk[i], u, p, t + c_[i] * h)
                 for i in range(ns)]
            return jnp.concatenate(r)

        def substep(x_k, inp):
            i, w = inp
            t = t0 + i * h
            # single (or few) Newton iteration(s) on the lifted variables
            def it(wk, _):
                J = jax.jacfwd(lambda ww: residual(ww, x_k, t))(wk)
                wk = wk - jnp.linalg.solve(J, residual(wk, x_k, t))
                return wk, None
            w, _ = jax.lax.scan(it, w, None, length=newton_iter)
            Kk = w[: ns * nx].reshape(ns, nx)
            x_next = x_k + h * (b_ @ Kk)
            return x_next, w

        x_out, K_next = jax.lax.scan(
            substep, x, (jnp.arange(num_steps), K))
        return x_out, K_next

    K0 = jnp.zeros((num_steps, nw))
    return step, K0
