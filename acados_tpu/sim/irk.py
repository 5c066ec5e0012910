"""Implicit Runge-Kutta (collocation) integrator for ODEs and DAEs.

TPU-native counterpart of the reference IRK module
(/root/reference/acados/sim/sim_irk_integrator.c:1175): Gauss-Legendre or
Radau IIA collocation, Newton iterations over the stacked stage equations.
Where the reference hand-codes BLASFEO LU factor/solve (irk:1112-1157) and
CasADi Jacobian functions (IMPL_ODE_FUN_JAC_X_XDOT_U, sim_common.h:56-60),
this uses `jax.jacfwd` on the residual and a batched dense solve; first and
second-order sensitivities come from implicit differentiation of the root
(`jax.lax.custom_root`) instead of hand-written forward/adjoint VDE sweeps —
the implicit-function-theorem derivative is exact at the converged root.

DAE form: f_impl(xdot, x, z, u, p, t) = 0 with nx differential + nz algebraic
equations (reference problem formulation tex:125).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.ops.linsolve import gj_inverse, linsolve
from acados_tpu.sim.butcher import gauss_legendre_tableau, radau_iia_tableau


def _z_end_weights(c):
    """Lagrange extrapolation weights of the collocation basis at t=1
    (for algebraic-variable output z(T); reference `exact_z_output`)."""
    import numpy as np

    ns = len(c)
    w = np.zeros(ns)
    for j in range(ns):
        others = np.delete(np.asarray(c), j)
        w[j] = np.prod((1.0 - others) / (c[j] - others)) if ns > 1 else 1.0
    return w


def make_irk_step(f_impl, nx: int, nz: int = 0, num_stages: int = 3,
                  num_steps: int = 1, newton_iter: int = 3,
                  collocation: str = "GAUSS_LEGENDRE"):
    """Build an implicit-RK one-interval step function.

    Args:
      f_impl: f(xdot, x, z, u, p, t) -> (nx + nz,) residual.
      nx, nz: differential / algebraic dimensions.
      num_stages: collocation stages (reference sim opts ns).
      num_steps: integration steps per interval.
      newton_iter: Newton iterations per step (reference default 3).
      collocation: 'GAUSS_LEGENDRE' or 'RADAU_IIA'
        (reference collocation_type, sim_common.h).

    Returns:
      step(x, u, p, t0, dt) -> (x_next, z_out) where z_out is the
      algebraic variable at the interval end (zeros if nz == 0).
    """
    if collocation.upper() in ("GAUSS_LEGENDRE", "GAUSS"):
        A, b, c = gauss_legendre_tableau(num_stages)
    elif collocation.upper() in ("RADAU_IIA", "RADAU"):
        A, b, c = radau_iia_tableau(num_stages)
    else:
        raise ValueError(f"unknown collocation {collocation}")
    zw = _z_end_weights(c)
    ns = num_stages
    nw = ns * (nx + nz)

    def step(x, u, p, t0, dt):
        h = dt / num_steps
        A_ = jnp.asarray(A, x.dtype)
        b_ = jnp.asarray(b, x.dtype)
        zw_ = jnp.asarray(zw, x.dtype)
        c_ = c.astype(x.dtype)  # avoid f64 promotion of t under x64

        def residual_fn(x0, t):
            def res(w):
                K = w[: ns * nx].reshape(ns, nx)
                Z = w[ns * nx:].reshape(ns, nz)
                xi = x0[None, :] + h * (A_ @ K)  # (ns, nx)
                r = []
                for i in range(ns):
                    r.append(f_impl(K[i], xi[i], Z[i], u, p, t + c_[i] * h))
                return jnp.concatenate(r)
            return res

        def newton_solve(res, w0):
            def it(w, _):
                J = jax.jacfwd(res)(w)
                w = w - linsolve(J, res(w))
                return w, None
            w, _ = jax.lax.scan(it, w0, None, length=newton_iter)
            return w

        def tangent_solve(g, y):
            J = jax.jacfwd(g)(jnp.zeros_like(y))
            return linsolve(J, y)

        def substep(carry, i):
            x_k, w_prev = carry
            t = t0 + i * h
            w = jax.lax.custom_root(residual_fn(x_k, t), w_prev,
                                    newton_solve, tangent_solve)
            K = w[: ns * nx].reshape(ns, nx)
            Z = w[ns * nx:].reshape(ns, nz)
            x_next = x_k + h * (b_ @ K)
            z_out = zw_ @ Z if nz > 0 else jnp.zeros((nz,), x.dtype)
            return (x_next, w), z_out

        w0 = jnp.zeros((nw,), x.dtype)
        (x_out, _), z_hist = jax.lax.scan(
            substep, (x, w0), jnp.arange(num_steps))
        z_out = z_hist[-1] if nz > 0 else jnp.zeros((nz,), x.dtype)
        return x_out, z_out

    return jax.jit(step)


def make_irk_stage_points(f_impl, nx: int, nz: int = 0,
                          num_stages: int = 3, num_steps: int = 1,
                          newton_iter: int = 3,
                          collocation: str = "GAUSS_LEGENDRE"):
    """Collocation stage values for INTEGRATOR cost discretization.

    Returns (points, weights): points(x, u, p, t0, dt) ->
    (Xs (m*ns, nx), Zs (m*ns, nz), Ts (m*ns,)) — the stage states,
    algebraic stage values and stage times over all substeps — and the
    quadrature weights (b/num_steps tiled, summing to 1). The reference
    supports cost_discretization=INTEGRATOR exactly for IRK
    (acados_ocp_options.py:2285 "only supported for IRK integrator"):
    the Lagrange cost is evaluated at these collocation points with the
    tableau's quadrature weights. Differentiable through the stage solve
    via `custom_root` (implicit function theorem), so the cost module's
    Gauss-Newton Jacobians see the exact stage sensitivities.
    """
    import numpy as np

    if collocation.upper() in ("GAUSS_LEGENDRE", "GAUSS"):
        A, b, c = gauss_legendre_tableau(num_stages)
    elif collocation.upper() in ("RADAU_IIA", "RADAU"):
        A, b, c = radau_iia_tableau(num_stages)
    else:
        raise ValueError(f"unknown collocation {collocation}")
    ns = num_stages
    nw = ns * (nx + nz)
    weights = np.tile(np.asarray(b, np.float64) / num_steps, num_steps)

    def points(x, u, p, t0, dt):
        h = dt / num_steps
        A_ = jnp.asarray(A, x.dtype)
        b_ = jnp.asarray(b, x.dtype)
        c_ = c.astype(x.dtype)

        def residual_fn(x0, t):
            def res(w):
                K = w[: ns * nx].reshape(ns, nx)
                Z = w[ns * nx:].reshape(ns, nz)
                xi = x0[None, :] + h * (A_ @ K)
                r = []
                for i in range(ns):
                    r.append(f_impl(K[i], xi[i], Z[i], u, p,
                                    t + c_[i] * h))
                return jnp.concatenate(r)
            return res

        def newton_solve(res, w0):
            def it(w, _):
                J = jax.jacfwd(res)(w)
                return w - linsolve(J, res(w)), None
            w, _ = jax.lax.scan(it, w0, None, length=newton_iter)
            return w

        def tangent_solve(g, y):
            J = jax.jacfwd(g)(jnp.zeros_like(y))
            return linsolve(J, y)

        def substep(carry, i):
            x_k, w_prev = carry
            t = t0 + i * h
            w = jax.lax.custom_root(residual_fn(x_k, t), w_prev,
                                    newton_solve, tangent_solve)
            K = w[: ns * nx].reshape(ns, nx)
            Z = w[ns * nx:].reshape(ns, nz)
            xi = x_k[None, :] + h * (A_ @ K)
            ts = t + c_ * h
            x_next = x_k + h * (b_ @ K)
            return (x_next, w), (xi, Z, ts)

        w0 = jnp.zeros((nw,), x.dtype)
        (_, _), (Xs, Zs, Ts) = jax.lax.scan(
            substep, (x, w0), jnp.arange(num_steps))
        nq = num_steps * ns
        return (Xs.reshape(nq, nx), Zs.reshape(nq, nz),
                Ts.reshape(nq))

    return points, weights


def make_irk_step_jac(f_impl, nx: int, nz: int = 0, num_stages: int = 3,
                      num_steps: int = 1, newton_iter: int = 3,
                      collocation: str = "GAUSS_LEGENDRE",
                      jac_reuse: bool = False,
                      kron_path: bool | None = None,
                      explicit_ode: bool = False):
    """Build an IRK step that also returns the step Jacobians (A, B).

    This is the forward-VDE analog of the reference's in-integrator
    sensitivity propagation (sim_irk_integrator.c:1545-1629: the stage
    Jacobian is factorized ONCE per step and back-substituted for all
    nx+nu sensitivity right-hand sides). The generic path — `jax.jacfwd`
    over `make_irk_step`'s `custom_root` — re-linearizes the stage system
    per tangent (42 redundant Jacobian builds for a chain-mass stage);
    this dedicated path builds the (ns*(nx+nz))^2 Jacobian `newton_iter`
    (+1) times for the Newton solve and reuses ONE LU factorization for
    the whole (nx+nu)-column sensitivity solve. It is the SQP/RTI
    linearization hot path (ocp_nlp_dynamics_cont.c:789-851 equivalent).

    jac_reuse mirrors the reference sim opt `jac_reuse` (sim_common.h:139):
    True freezes the Newton Jacobian at the predictor point (1 build/step).

    kron_path (None = auto: ns == 2, nz == 0, jac_reuse): exploit the
    Kronecker structure of the frozen stage Jacobian. With one ODE
    Jacobian Jf per substep, J = I (x) I - h A (x) Jf; for a 2-stage
    tableau all four nx-blocks of J are polynomials in Jf and therefore
    COMMUTE, so J^-1 = blockdiag(D^-1, D^-1) @ adj(J) with the scalar-
    polynomial determinant D = I - h tr(A) Jf + h^2 det(A) Jf^2 — ONE
    (nx, nx) inverse instead of the (2nx, 2nx) one (the chain model's
    (10240, 78, 78) Pallas inverse at ~26 ms becomes a (10240, 39, 39)
    at ~7 ms + a few matmuls). Jf is the mean of the two stage-point
    Jacobians (which the exact sensitivity right-hand sides need
    anyway), so the approximation error vs the frozen-J path is
    O(h |Jf(xi_1) - Jf(xi_2)|) — the same order jac_reuse itself
    accepts. The reference counterpart is the staged IRK factorization
    (sim_irk_integrator.c:1545-1629), which factors the full stage
    system; the eigen/determinant split is the TPU-shaped variant.

    Returns step_jac(x, u, p, t0, dt) -> (x_next, A, B) with
    A = dx_next/dx (nx, nx), B = dx_next/du (nx, nu). When nz > 0 the
    return extends to (x_next, A, B, z0, Jz): z0 is the algebraic
    variable at the interval START (collocation polynomial extrapolated
    to tau=0, reference sim_irk z output) and Jz = dz0/d(x,u)
    (nz, nx+nu) — the reference's S_algebraic/dzduxt packed into the QP
    by ocp_nlp_dynamics_cont.c:847-851.
    """
    if collocation.upper() in ("GAUSS_LEGENDRE", "GAUSS"):
        A_t, b_t, c_t = gauss_legendre_tableau(num_stages)
    elif collocation.upper() in ("RADAU_IIA", "RADAU"):
        A_t, b_t, c_t = radau_iia_tableau(num_stages)
    else:
        raise ValueError(f"unknown collocation {collocation}")
    ns = num_stages
    nw = ns * (nx + nz)
    # Lagrange extrapolation weights of the collocation basis at tau=0
    import numpy as _np
    zw0 = _np.zeros(ns)
    for j in range(ns):
        others = _np.delete(_np.asarray(c_t), j)
        zw0[j] = (_np.prod((0.0 - others) / (c_t[j] - others))
                  if ns > 1 else 1.0)
    if kron_path is None:
        kron_path = (ns == 2 and nz == 0 and jac_reuse and explicit_ode)
    if kron_path and (ns != 2 or nz != 0):
        raise ValueError("kron_path requires num_stages == 2 and nz == 0")
    # the Kronecker split assumes d f_impl / d xdot == I (an
    # explicit-wrapped ODE); a mass-matrix model must use the generic
    # stage factorization
    if kron_path and not explicit_ode:
        raise ValueError("kron_path requires an explicit ODE model")
    _trA = float(_np.trace(_np.asarray(A_t)))
    _detA = float(_np.linalg.det(_np.asarray(A_t)))

    def step_jac(x, u, p, t0, dt):
        h = dt / num_steps
        A_ = jnp.asarray(A_t, x.dtype)
        b_ = jnp.asarray(b_t, x.dtype)
        c_ = c_t.astype(x.dtype)
        zw0_ = jnp.asarray(zw0, x.dtype)
        eye = jnp.eye(nx, dtype=x.dtype)

        def res_of(w, x0, uu, t):
            K = w[: ns * nx].reshape(ns, nx)
            Z = w[ns * nx:].reshape(ns, nz)
            xi = x0[None, :] + h * (A_ @ K)
            r = [f_impl(K[i], xi[i], Z[i], uu, p, t + c_[i] * h)
                 for i in range(ns)]
            return jnp.concatenate(r)

        # explicit inverse on TPU (lane-batched Pallas kernel): every
        # solve below becomes an MXU matmul; pivoted LAPACK LU elsewhere
        # (tests/oracles)
        if jax.default_backend() == "tpu":
            from acados_tpu.ops.batched_inv import gj_inverse_any as inv
        else:
            inv = jnp.linalg.inv

        def substep(carry, i):
            x_k, Sx, Su, w, z0, Jz = carry
            t = t0 + i * h
            Ji = None
            for it_ in range(newton_iter):
                if it_ == 0 or not jac_reuse:
                    J = jax.jacfwd(res_of)(w, x_k, u, t)
                    Ji = inv(J)
                w = w - Ji @ res_of(w, x_k, u, t)
            if not jac_reuse:
                # refresh at the converged root so the implicit-function
                # sensitivities are exact there (reference refactorizes
                # for sens_forw, sim_irk_integrator.c:1545)
                J = jax.jacfwd(res_of)(w, x_k, u, t)
                Ji = inv(J)
            Rx = jax.jacfwd(res_of, argnums=1)(w, x_k, u, t)
            Ru = jax.jacfwd(res_of, argnums=2)(w, x_k, u, t)
            dW = -(Ji @ jnp.concatenate([Rx, Ru], axis=1))
            dK = dW[: ns * nx].reshape(ns, nx, nx + nu)
            x_next = x_k + h * (b_ @ w[: ns * nx].reshape(ns, nx))
            G = h * jnp.einsum("s,sij->ij", b_, dK)
            A_sub = eye + G[:, :nx]
            B_sub = G[:, nx:]
            if nz > 0:
                # capture z(t0) + dz/d(x,u) at the FIRST substep, where
                # d(x_k,u)/d(x,u) is the identity
                Z = w[ns * nx:].reshape(ns, nz)
                dZ = dW[ns * nx:].reshape(ns, nz, nx + nu)
                first = (i == 0)
                z0 = jnp.where(first, zw0_ @ Z, z0)
                Jz = jnp.where(first,
                               jnp.einsum("s,szj->zj", zw0_, dZ), Jz)
            return (x_next, A_sub @ Sx, A_sub @ Su + B_sub, w, z0,
                    Jz), None

        def substep_kron(carry, i):
            # 2-stage frozen-Jacobian path: J = I(x)I - hA(x)Jbar has
            # commuting nx-blocks -> one (nx, nx) inverse of the block
            # determinant D serves Newton AND all sensitivity columns
            # (see docstring; reference sim_irk_integrator.c:1545-1629).
            x_k, Sx, Su, w, z0, Jz = carry
            t = t0 + i * h
            ti = t + c_ * h
            ze = jnp.zeros((nz,), x.dtype)
            a11, a12 = float(A_t[0][0]), float(A_t[0][1])
            a21, a22 = float(A_t[1][0]), float(A_t[1][1])

            def stage_jacs(w_at):
                K = w_at.reshape(ns, nx)
                xi = x_k[None, :] + h * (A_ @ K)
                Fx = jnp.stack([
                    jax.jacfwd(lambda xv, s=s: f_impl(
                        K[s], xv, ze, u, p, ti[s]))(xi[s])
                    for s in range(ns)])
                return Fx, xi, K

            # Jbar from the predictor stage points (jac_reuse semantics:
            # the Newton preconditioner is frozen at the carried w)
            Fx_p, _, _ = stage_jacs(w)
            hJ = -(h * 0.5) * (Fx_p[0] + Fx_p[1])   # h * mean ODE Jacobian
            eye_ = jnp.eye(nx, dtype=x.dtype)
            D = eye_ - _trA * hJ + _detA * (hJ @ hJ)
            Di = inv(D)

            def jinv_apply(r1, r2):
                g1 = hJ @ r1
                g2 = hJ @ r2
                v1 = r1 - a22 * g1 + a12 * g2
                v2 = r2 - a11 * g2 + a21 * g1
                return Di @ v1, Di @ v2

            def newton_body(wc, _):
                K = wc.reshape(ns, nx)
                xi = x_k[None, :] + h * (A_ @ K)
                r = [f_impl(K[s], xi[s], ze, u, p, ti[s])
                     for s in range(ns)]
                d1, d2 = jinv_apply(r[0], r[1])
                return wc - jnp.concatenate([d1, d2]), None

            w, _ = jax.lax.scan(newton_body, w, None, length=newton_iter)

            # exact sensitivity right-hand sides at the converged stage
            # points (the generic jac_reuse path also evaluates Rx/Ru at
            # the converged root, reusing the frozen factorization)
            Fx_c, xi_c, K_c = stage_jacs(w)
            Fu_c = jnp.stack([
                jax.jacfwd(lambda uv, s=s: f_impl(
                    K_c[s], xi_c[s], ze, uv, p, ti[s]))(u)
                for s in range(ns)])
            R1 = jnp.concatenate([Fx_c[0], Fu_c[0]], axis=1)
            R2 = jnp.concatenate([Fx_c[1], Fu_c[1]], axis=1)
            d1, d2 = jinv_apply(R1, R2)
            dK = jnp.stack([-d1, -d2])              # (ns, nx, nx+nu)
            x_next = x_k + h * (b_ @ w.reshape(ns, nx))
            G = h * jnp.einsum("s,sij->ij", b_, dK)
            A_sub = eye + G[:, :nx]
            B_sub = G[:, nx:]
            return (x_next, A_sub @ Sx, A_sub @ Su + B_sub, w, z0,
                    Jz), None

        nu = u.shape[-1]
        (x_out, Sx, Su, _w, z0, Jz), _ = jax.lax.scan(
            substep_kron if kron_path else substep,
            (x, jnp.eye(nx, dtype=x.dtype),
             jnp.zeros((nx, nu), x.dtype),
             jnp.zeros((nw,), x.dtype),
             jnp.zeros((nz,), x.dtype),
             jnp.zeros((nz, nx + nu), x.dtype)),
            jnp.arange(num_steps))
        if nz > 0:
            return x_out, Sx, Su, z0, Jz
        return x_out, Sx, Su

    return jax.jit(step_jac)


def make_irk_z0_fun(f_impl, nx: int, nz: int, num_stages: int = 3,
                    newton_iter: int = 3,
                    collocation: str = "GAUSS_LEGENDRE"):
    """z(t0) evaluator: solve the first collocation stage system at
    (x, u) and extrapolate the algebraic stages to tau=0 (reference
    sim_irk z output). Used by merit/constraint evaluation at trial
    points when the NLP formulation references z."""
    if collocation.upper() in ("GAUSS_LEGENDRE", "GAUSS"):
        A_t, _, c_t = gauss_legendre_tableau(num_stages)
    elif collocation.upper() in ("RADAU_IIA", "RADAU"):
        A_t, _, c_t = radau_iia_tableau(num_stages)
    else:
        raise ValueError(f"unknown collocation {collocation}")
    import numpy as _np
    ns = num_stages
    zw0 = _np.zeros(ns)
    for j in range(ns):
        others = _np.delete(_np.asarray(c_t), j)
        zw0[j] = (_np.prod((0.0 - others) / (c_t[j] - others))
                  if ns > 1 else 1.0)
    nw = ns * (nx + nz)

    def z0_fun(x, u, p, t0, dt):
        h = dt  # first substep length is dt/num_steps at the OCP level;
        # z(t0) is h-independent at convergence up to O(h) consistency —
        # use the passed dt directly (callers pass dt/num_steps when they
        # care; the extrapolation point is tau=0 either way)
        A_ = jnp.asarray(A_t, x.dtype)
        c_ = c_t.astype(x.dtype)
        zw0_ = jnp.asarray(zw0, x.dtype)

        def res(w):
            K = w[: ns * nx].reshape(ns, nx)
            Z = w[ns * nx:].reshape(ns, nz)
            xi = x[None, :] + h * (A_ @ K)
            r = [f_impl(K[i], xi[i], Z[i], u, p, t0 + c_[i] * h)
                 for i in range(ns)]
            return jnp.concatenate(r)

        w = jnp.zeros((nw,), x.dtype)
        for _ in range(newton_iter):
            J = jax.jacfwd(res)(w)
            w = w - linsolve(J, res(w))
        Z = w[ns * nx:].reshape(ns, nz)
        return zw0_ @ Z

    return jax.jit(z0_fun)


def implicit_from_explicit(f_expl):
    """Wrap an explicit ODE f(x, u, p, t) -> xdot as an implicit residual."""
    def f_impl(xdot, x, z, u, p, t):
        return xdot - f_expl(x, u, p, t)
    return f_impl
