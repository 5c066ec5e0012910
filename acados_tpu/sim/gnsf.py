"""GNSF structure-exploiting implicit RK integrator + structure detection.

TPU-native counterpart of the reference GNSF module
(/root/reference/acados/sim/sim_gnsf.c:2160, dims/model sim_gnsf.h:57-110)
and the automatic structure detection
(/root/reference/interfaces/acados_template/acados_template/gnsf.py:483,758).

Model structure (reference sim_gnsf.h:72-110):

  nonlinear subsystem  (x1 in R^nx1, z1 in R^nz1):
      E [x1dot; z1] = A x1 + B u + C phi(y, uhat) + c
      y    = L_x x1 + L_xdot x1dot + L_z z1          (ny,)
      uhat = L_u u                                    (nuhat,)
  linear-output subsystem (x2 in R^nx2):
      E_LO x2dot = A_LO x2 + B_LO u + f_lo(x1, x1dot, z1, u) + c_LO

Exploitation under collocation: given the stage values of phi, the stage
equations of the nonlinear subsystem are *linear* in the stage derivatives
(K1, Z1). The condensed linear operators are precomputed and factorised once
at build time (the analog of the reference's big `sim_gnsf_precompute`,
sim_gnsf.c), so the Newton iteration runs only on the stacked phi outputs —
ns*n_out unknowns instead of ns*(nx+nz) as in plain IRK. The linear-output
subsystem needs no Newton at all: one precomputed linear solve.

Where the reference detects structure symbolically with CasADi (gnsf.py:483),
this detects it *numerically* from the traced residual: second-derivative
probes at random points classify which states/equations are nonlinear, the
linear part is extracted from Jacobians at a base point, and the resulting
structured model is verified against the original residual at random samples
(fall back to plain IRK when verification fails).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from acados_tpu.sim.butcher import gauss_legendre_tableau, radau_iia_tableau


@dataclass
class GnsfModel:
    """GNSF structured model (reference sim_gnsf.h:72-110).

    States are ordered x = [x1; x2]. All matrices are numpy (static model
    data, baked into the jitted step at trace time).
    """

    nx1: int
    nx2: int
    nz1: int
    n_out: int
    nu: int
    # nonlinear subsystem
    A: np.ndarray        # (nx1+nz1, nx1)
    B: np.ndarray        # (nx1+nz1, nu)
    C: np.ndarray        # (nx1+nz1, n_out)
    c: np.ndarray        # (nx1+nz1,)
    E: np.ndarray        # (nx1+nz1, nx1+nz1) on [x1dot; z1]
    L_x: np.ndarray      # (ny, nx1)
    L_xdot: np.ndarray   # (ny, nx1)
    L_z: np.ndarray      # (ny, nz1)
    L_u: np.ndarray      # (nuhat, nu)
    phi: Callable = None            # phi(y, uhat) -> (n_out,)
    # linear-output subsystem
    A_LO: np.ndarray = None         # (nx2, nx2)
    B_LO: np.ndarray = None         # (nx2, nu)
    E_LO: np.ndarray = None         # (nx2, nx2)
    c_LO: np.ndarray = None         # (nx2,)
    f_lo: Callable = None           # f_lo(x1, x1dot, z1, u) -> (nx2,)

    @property
    def ny(self):
        return self.L_x.shape[0]

    @property
    def nuhat(self):
        return self.L_u.shape[0]


def make_gnsf_step(model: GnsfModel, num_stages: int = 3, num_steps: int = 1,
                   newton_iter: int = 5,
                   collocation: str = "GAUSS_LEGENDRE"):
    """Build a GNSF one-interval step function.

    Returns step(x, u, p, t0, dt) -> (x_next, z_out). `p`/`t0` are accepted
    for interface parity with the other integrators but the GNSF structure
    is autonomous in them (reference model, sim_gnsf.h).
    """
    if collocation.upper() in ("GAUSS_LEGENDRE", "GAUSS"):
        Ab, bb, cb = gauss_legendre_tableau(num_stages)
    elif collocation.upper() in ("RADAU_IIA", "RADAU"):
        Ab, bb, cb = radau_iia_tableau(num_stages)
    else:
        raise ValueError(f"unknown collocation {collocation}")
    ns = num_stages
    m = model
    nx1, nx2, nz1, n_out = m.nx1, m.nx2, m.nz1, m.n_out
    nk = nx1 + nz1

    # --- precompute condensed linear operators (sim_gnsf precompute analog)
    # Stage equations, w = [K1_1..K1_ns ; Z1 interleaved per stage]:
    #   E [K_i; Z_i] - h * A @ sum_j a_ij K_j = A x1_0 + B u + C phi_i + c
    # Build M(h) = blockdiag(E) - h * (a_butcher ⊗ [A, 0]) on the K-part.
    # h enters linearly -> precompute the two constituents, assemble at
    # trace time (h is static per OCP stage anyway after jit).
    E_blk = np.kron(np.eye(ns), m.E)                      # (ns*nk, ns*nk)
    # selection of K components inside each stage block
    SelK = np.zeros((nk, nk))
    SelK[:, :nx1] = np.vstack([np.eye(nx1), np.zeros((nz1, nx1))])
    AK = np.zeros((ns * nk, ns * nk))
    for i in range(ns):
        for j in range(ns):
            blk = np.zeros((nk, nk))
            blk[:, :nx1] = m.A @ np.eye(nx1)
            AK[i * nk:(i + 1) * nk, j * nk:(j + 1) * nk] = Ab[i, j] * blk

    if nx2 > 0:
        E2_blk = np.kron(np.eye(ns), m.E_LO)
        A2K = np.kron(Ab, m.A_LO)

    def step(x, u, p, t0, dt):
        del p, t0
        h = dt / num_steps
        dty = x.dtype
        # h may be a traced scalar (dt can vary): assemble symbolically.
        Mw = jnp.asarray(E_blk, dty) - h * jnp.asarray(AK, dty)
        A_ = jnp.asarray(m.A, dty)
        B_ = jnp.asarray(m.B, dty)
        C_ = jnp.asarray(m.C, dty)
        c_ = jnp.asarray(m.c, dty)
        Lx = jnp.asarray(m.L_x, dty)
        Lxd = jnp.asarray(m.L_xdot, dty)
        Lz = jnp.asarray(m.L_z, dty)
        Lu = jnp.asarray(m.L_u, dty)
        ab = jnp.asarray(Ab, dty)
        bb_ = jnp.asarray(bb, dty)
        uhat = Lu @ u

        def w_of_phi(Phi, x1_0):
            """Linear solve: stage derivatives from phi values."""
            rhs = (A_ @ x1_0 + B_ @ u + c_)[None, :] + Phi @ C_.T  # (ns, nk)
            return jnp.linalg.solve(Mw, rhs.reshape(-1)).reshape(ns, nk)

        def substep_nl(x1_0):
            def newton_res(Phi_flat):
                Phi = Phi_flat.reshape(ns, n_out)
                W = w_of_phi(Phi, x1_0)
                K1, Z1 = W[:, :nx1], W[:, nx1:]
                X1 = x1_0[None, :] + h * (ab @ K1)
                Y = X1 @ Lx.T + K1 @ Lxd.T + Z1 @ Lz.T    # (ns, ny)
                phi_val = jax.vmap(lambda y: m.phi(y, uhat))(Y)
                return (Phi - phi_val).reshape(-1)

            Phi0 = jnp.zeros((ns * n_out,), dty)

            def it(Phi_flat, _):
                J = jax.jacfwd(newton_res)(Phi_flat)
                Phi_flat = Phi_flat - jnp.linalg.solve(J, newton_res(Phi_flat))
                return Phi_flat, None

            Phi_flat, _ = jax.lax.scan(it, Phi0, None, length=newton_iter)
            W = w_of_phi(Phi_flat.reshape(ns, n_out), x1_0)
            K1, Z1 = W[:, :nx1], W[:, nx1:]
            x1_next = x1_0 + h * (bb_ @ K1)
            return x1_next, K1, Z1

        def substep(carry, _):
            x1_0, x2_0 = carry
            x1_next, K1, Z1 = substep_nl(x1_0)
            if nx2 > 0:
                X1 = x1_0[None, :] + h * (ab @ K1)
                Flo = jax.vmap(lambda a, b2, z: m.f_lo(a, b2, z, u))(
                    X1, K1, Z1)                            # (ns, nx2)
                A2 = jnp.asarray(m.A_LO, dty)
                B2 = jnp.asarray(m.B_LO, dty)
                c2 = jnp.asarray(m.c_LO, dty)
                M2 = jnp.asarray(E2_blk, dty) - h * jnp.asarray(A2K, dty)
                rhs2 = (A2 @ x2_0 + B2 @ u + c2)[None, :] + Flo
                K2 = jnp.linalg.solve(M2, rhs2.reshape(-1)).reshape(ns, nx2)
                x2_next = x2_0 + h * (bb_ @ K2)
            else:
                x2_next = x2_0
            z_end = Z1[-1] if nz1 > 0 else jnp.zeros((0,), dty)
            return (x1_next, x2_next), z_end

        x1, x2 = x[:nx1], x[nx1:]
        (x1_o, x2_o), z_hist = jax.lax.scan(
            substep, (x1, x2), None, length=num_steps)
        z_out = z_hist[-1] if nz1 > 0 else jnp.zeros((0,), x.dtype)
        return jnp.concatenate([x1_o, x2_o]), z_out

    return jax.jit(step)


def detect_gnsf_structure(f_expl, nx: int, nu: int, p=None,
                          n_probe: int = 8, seed: int = 0,
                          tol: float = 1e-8) -> Optional[GnsfModel]:
    """Numerically detect a GNSF structure for an explicit ODE.

    Counterpart of the reference's symbolic `detect_gnsf_structure`
    (gnsf.py:758): classifies each state equation as linear or nonlinear
    via randomized Jacobian-constancy probes, orders the nonlinear block
    first, extracts the linear part at the origin, and packs the residual
    nonlinearity into phi. Verifies the reconstruction on random samples;
    returns None when the function is not GNSF-representable this way
    (caller falls back to plain IRK, as the reference does).

    Produced structure: E = I, x1 = states whose derivative is nonlinear
    (plus all states any nonlinear equation reads), n_out = #nonlinear
    equations, y = x1, uhat = u. Not a minimal-(ny, n_out) factorization —
    minimality is a symbolic property; the speedup (Newton on n_out
    instead of nx unknowns) is preserved.
    """
    if p is None:
        p = np.zeros((0,))
    rng = np.random.default_rng(seed)
    f = lambda x, u: np.asarray(f_expl(jnp.asarray(x), jnp.asarray(u),
                                       jnp.asarray(p), 0.0))

    # The detected structure (linear operators + phi) is baked at the
    # probe parameter/time; a runtime `set('p')` or time-varying dynamics
    # would silently integrate the wrong model (reference sim_gnsf feeds
    # runtime p to its phi external functions). Refuse and fall back to
    # IRK when the dynamics actually depend on p or t.
    xs = rng.normal(size=(3, nx))
    us = rng.normal(size=(3, nu))
    for xk, uk in zip(xs, us):
        f0 = np.asarray(f_expl(jnp.asarray(xk), jnp.asarray(uk),
                               jnp.asarray(p), 0.0))
        ft = np.asarray(f_expl(jnp.asarray(xk), jnp.asarray(uk),
                               jnp.asarray(p), 0.7321))
        if np.abs(ft - f0).max() > tol:
            return None  # time-dependent dynamics
        if len(np.atleast_1d(p)):
            p2 = np.asarray(p, float) + rng.normal(
                size=np.atleast_1d(p).shape)
            fp = np.asarray(f_expl(jnp.asarray(xk), jnp.asarray(uk),
                                   jnp.asarray(p2), 0.0))
            if np.abs(fp - f0).max() > tol:
                return None  # parameter-dependent dynamics
    jac = jax.jit(jax.jacfwd(
        lambda xu: f_expl(xu[:nx], xu[nx:], jnp.asarray(p), 0.0)))

    # Jacobian-constancy probe: rows whose Jacobian varies are nonlinear.
    Js = np.stack([np.asarray(jac(jnp.asarray(rng.normal(size=nx + nu))))
                   for _ in range(n_probe)])
    row_var = np.abs(Js - Js[0]).max(axis=(0, 2))        # (nx,)
    nonlin_rows = np.where(row_var > tol)[0]
    lin_rows = np.where(row_var <= tol)[0]
    if len(nonlin_rows) == 0:
        # fully linear: pure linear-output system, n_out = 0 stays valid
        nonlin_rows = np.array([], dtype=int)

    # states read (at all) by nonlinear equations -> must live in x1
    dep = np.abs(Js).max(axis=0)                         # (nx, nx+nu)
    x1_set = set(nonlin_rows.tolist())
    for r in nonlin_rows:
        x1_set |= set(np.where(dep[r, :nx] > tol)[0].tolist())
    # linear-output states must not be read by x1-equations; states that
    # are read by any x1 equation are pulled into x1 (fixed point)
    changed = True
    while changed:
        changed = False
        for r in sorted(x1_set):
            reads = set(np.where(dep[r, :nx] > tol)[0].tolist())
            if not reads <= x1_set:
                x1_set |= reads
                changed = True
    x1_idx = np.array(sorted(x1_set), dtype=int)
    x2_idx = np.array([i for i in range(nx) if i not in x1_set], dtype=int)
    nx1, nx2 = len(x1_idx), len(x2_idx)
    perm = np.concatenate([x1_idx, x2_idx]).astype(int)
    nl_in_x1 = np.array([np.where(x1_idx == r)[0][0] for r in nonlin_rows],
                        dtype=int)
    n_out = len(nonlin_rows)

    # linear part at origin (GNSF: f(x,u) = J0 @ [x;u] + f(0) + nonlinearity)
    xu0 = np.zeros(nx + nu)
    J0 = np.asarray(jac(jnp.asarray(xu0)))
    f0 = f(np.zeros(nx), np.zeros(nu))

    # permuted system matrices
    Jx = J0[:, :nx][np.ix_(perm, perm)]
    Ju = J0[:, nx:][perm]
    f0p = f0[perm]

    A = np.zeros((nx1, nx1))
    A[:, :] = Jx[:nx1, :nx1]
    B = Ju[:nx1]
    cvec = f0p[:nx1]
    C = np.zeros((nx1, n_out))
    for k, r in enumerate(nl_in_x1):
        C[r, k] = 1.0

    x1_idx_j = jnp.asarray(x1_idx)
    perm_j = jnp.asarray(perm)
    nlr_j = jnp.asarray(nonlin_rows.astype(int)) if n_out else None
    A_lin0 = J0[np.ix_(nonlin_rows, np.arange(nx))] if n_out else None
    B_lin0 = J0[np.ix_(nonlin_rows, nx + np.arange(nu))] if n_out else None
    f0_nl = f0[nonlin_rows] if n_out else None

    def phi(y, uhat):
        # y = x1 (original ordering restored), uhat = u
        x_full = jnp.zeros((nx,), y.dtype).at[x1_idx_j].set(y)
        fx = f_expl(x_full, uhat, jnp.asarray(p, y.dtype), 0.0)
        lin = (jnp.asarray(A_lin0, y.dtype) @ x_full
               + jnp.asarray(B_lin0, y.dtype) @ uhat
               + jnp.asarray(f0_nl, y.dtype))
        return fx[nlr_j] - lin

    # linear-output subsystem reads x1 through f_lo
    A_LO = Jx[nx1:, nx1:]
    B_LO = Ju[nx1:]
    c_LO = f0p[nx1:]
    Jx2_x1 = Jx[nx1:, :nx1]

    def f_lo(x1, x1dot, z1, u):
        del x1dot, z1, u
        return jnp.asarray(Jx2_x1, x1.dtype) @ x1

    model = GnsfModel(
        nx1=nx1, nx2=nx2, nz1=0, n_out=n_out, nu=nu,
        A=A, B=B, C=C, c=cvec, E=np.eye(nx1),
        L_x=np.eye(nx1), L_xdot=np.zeros((nx1, nx1)),
        L_z=np.zeros((nx1, 0)), L_u=np.eye(nu),
        phi=phi if n_out else (lambda y, uh: jnp.zeros((0,), y.dtype)),
        A_LO=A_LO, B_LO=B_LO, E_LO=np.eye(nx2), c_LO=c_LO, f_lo=f_lo)

    # verification sweep (reference gnsf.py checks the structure too)
    def reconstruct(x, u):
        x1 = x[perm[:nx1]] if nx1 else np.zeros(0)
        xd = np.zeros(nx)
        ph = (np.asarray(model.phi(jnp.asarray(x1), jnp.asarray(u)))
              if n_out else np.zeros(0))
        r1 = A @ x1 + B @ u + (C @ ph if n_out else 0.0) + cvec
        x2 = x[perm[nx1:]] if nx2 else np.zeros(0)
        r2 = (A_LO @ x2 + B_LO @ u + c_LO + Jx2_x1 @ x1) if nx2 \
            else np.zeros(0)
        xd[perm[:nx1]] = r1
        if nx2:
            xd[perm[nx1:]] = r2
        return xd

    for _ in range(4):
        xs = rng.normal(size=nx)
        us = rng.normal(size=nu)
        if not np.allclose(reconstruct(xs, us), f(xs, us),
                           rtol=1e-6, atol=1e-6):
            return None
    model.perm = perm       # state permutation: x_gnsf = x[perm]
    model.iperm = np.argsort(perm)
    return model


def make_gnsf_step_from_ode(f_expl, nx: int, nu: int, p=None,
                            num_stages: int = 3, num_steps: int = 1,
                            newton_iter: int = 5):
    """Detect GNSF structure and build a step in the ORIGINAL state order.

    Returns None when no structure is detected (caller falls back to IRK).
    """
    model = detect_gnsf_structure(f_expl, nx, nu, p=p)
    if model is None:
        return None
    raw = make_gnsf_step(model, num_stages=num_stages, num_steps=num_steps,
                         newton_iter=newton_iter)
    perm = jnp.asarray(model.perm)
    iperm = jnp.asarray(model.iperm)

    def step(x, u, pp, t0, dt):
        xg, z = raw(x[perm], u, pp, t0, dt)
        return xg[iperm], z

    return jax.jit(step)
