"""Huber penalty builders for constraint->penalty reformulation.

Counterpart of the reference penalty utilities
(/root/reference/interfaces/acados_template/acados_template/penalty_utils.py:
34,49,93): Huber loss plus one-sided / symmetric Huber *penalties* used to
move inequality constraints into the cost (e.g. for DDP, which handles only
unconstrained OCPs — reference mpc_utils/penalty pipeline).

The reference returns CasADi expressions (value, gradient, Hessian, XGN
Hessian). Here each builder returns jax-traceable callables; gradients and
Hessians come from `jax.grad` at the call site, and the XGN
(extended-Gauss-Newton) Hessian — the convex surrogate `grad/var` used in
place of the exact (piecewise) Hessian — is provided explicitly since it is
not an AD object.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def huber_loss(delta: float, tau: float) -> Tuple[Callable, Callable]:
    """Scalar Huber loss (reference penalty_utils.py:34).

    loss(v) = (tau/delta) * ( 0.5 v^2            if |v| < delta
                              delta(|v|-delta/2)  otherwise )

    Returns (loss, xgn_hess) callables; loss is elementwise-traceable.
    """
    if delta <= 0:
        raise ValueError("delta must be positive")

    def loss(v):
        a = jnp.abs(v)
        quad = 0.5 * v * v
        lin = delta * (a - 0.5 * delta)
        return (tau / delta) * jnp.where(a < delta, quad, lin)

    def xgn_hess(v):
        # grad/v: constant tau/delta in the quadratic region, tau/|v| linear
        g = jax.grad(lambda s: jnp.sum(loss(s)))(jnp.atleast_1d(v))
        v1 = jnp.atleast_1d(v)
        return jnp.where(v1 == 0, tau / delta, g / jnp.where(v1 == 0, 1.0,
                                                             v1))

    return loss, xgn_hess


def _resolve_tau(delta: float, tau: Optional[float], w: Optional[float]):
    if tau is None:
        if w is None:
            raise ValueError("specify either w or tau")
        return 2.0 * w * delta
    if w is not None:
        raise ValueError("specify either w or tau, not both")
    return tau


def one_sided_huber_penalty(delta: float, tau: Optional[float] = None,
                            w: Optional[float] = None,
                            min_hess: float = 0.0):
    """Penalty for a constraint u <= 0 (reference penalty_utils.py:49).

    Smooth near 0 (quadratic ramp of width delta), asymptotically linear
    with slope tau. Returns (penalty, grad, hess, xgn_hess) callables.
    """
    tau = _resolve_tau(delta, tau, w)
    loss, loss_xgn = huber_loss(delta, tau)

    def penalty_raw(u):
        return 0.5 * (loss(u - delta) + tau * u)

    p0 = penalty_raw(jnp.asarray(0.0))

    def penalty(u):
        return penalty_raw(u) - p0

    grad = jax.grad(lambda u: jnp.sum(penalty(u)))

    def hess(u):
        h = jax.grad(lambda s: jnp.sum(grad(s)))(jnp.atleast_1d(u))
        return jnp.maximum(min_hess, h) if min_hess > 0 else h

    def xgn_hess(u):
        h = 0.5 * loss_xgn(u - delta)
        return jnp.maximum(min_hess, h) if min_hess > 0 else h

    return penalty, grad, hess, xgn_hess


def symmetric_huber_penalty(delta: float, tau: Optional[float] = None,
                            w: Optional[float] = None,
                            min_hess: float = 0.0):
    """Penalty for -1 <= u <= 1 (reference penalty_utils.py:93).

    Zero (to first order) inside the band, quadratic ramp of width delta
    around |u| = 1, asymptotically linear with slope tau outside.
    Returns (penalty, grad, hess, xgn_hess) callables.
    """
    tau = _resolve_tau(delta, tau, w)
    loss, loss_xgn = huber_loss(delta, tau)

    def penalty_raw(u):
        return 0.5 * (loss(u - (1 + delta)) + loss(u + (1 + delta))
                      - loss(jnp.asarray(-(1 + delta)))
                      - loss(jnp.asarray(1 - delta)))

    p0 = penalty_raw(jnp.asarray(0.0))

    def penalty(u):
        return penalty_raw(u) - p0

    grad = jax.grad(lambda u: jnp.sum(penalty(u)))

    def hess(u):
        h = jax.grad(lambda s: jnp.sum(grad(s)))(jnp.atleast_1d(u))
        return jnp.maximum(min_hess, h) if min_hess > 0 else h

    def xgn_hess(u):
        u1 = jnp.atleast_1d(u)
        h = 0.5 * jnp.where(u1 < 0, loss_xgn(u1 + 1 + delta),
                            loss_xgn(u1 - (1 + delta)))
        return jnp.maximum(min_hess, h) if min_hess > 0 else h

    return penalty, grad, hess, xgn_hess
