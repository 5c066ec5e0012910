"""NLP formulation: per-stage cost / dynamics / constraint modules.

TPU-native counterpart of the reference's per-stage module system — the
`ocp_nlp_cost_config` / `ocp_nlp_constraints_config` / `ocp_nlp_dynamics_config`
vtables (/root/reference/acados/ocp_nlp/ocp_nlp_common.h:74-128) and the
BGH constraint + {LINEAR_LS, NONLINEAR_LS, CONL, EXTERNAL} cost taxonomy
(ocp_nlp_cost_ls.c / _nls.c / _conl.c / _external.c,
ocp_nlp_constraints_bgh.c). Key inversions:

- CasADi-generated derivative functions (nls_y_fun_jac_ut_xt, nls_y_hess, …)
  are replaced by jax autodiff applied to user-supplied jax callables;
- the vtable dispatch is replaced by closures specialized at solver build
  time (everything is traced once into a single XLA program);
- box bounds (idxbx/idxbu), general linear rows (C/D) and nonlinear rows h
  are folded into ONE unified constraint-row block per stage class so the
  QP sees a single dense (C, D, lg, ug) — one matmul per stage on the MXU
  instead of three sparse paths.

Stage classes follow the reference Python API: initial (index 0), path
(1..N-1) and terminal (N), each with its own cost/constraint spec
(acados_ocp_cost.py cost_type_0/cost_type/cost_type_e; constraints
*_0/*/*_e variants).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from acados_tpu.utils.struct import pytree_dataclass
from acados_tpu.utils.types import ACADOS_INFTY


# ---------------------------------------------------------------------------
# Cost modules
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CostSpec:
    """One stage-class cost module.

    kind: 'LINEAR_LS' | 'NONLINEAR_LS' | 'CONL' | 'EXTERNAL'
      LINEAR_LS / NONLINEAR_LS (reference ocp_nlp_cost_ls.c:243,
        _nls.c): 0.5 * ||y(x,u,p,t) - yref||^2_W, Gauss-Newton Hessian.
      CONL (ocp_nlp_cost_conl.c): psi(y(x,u) - yref, p) with
        outer-convexity-exploiting generalized Gauss-Newton.
      EXTERNAL (ocp_nlp_cost_external.c): arbitrary scalar cost, exact
        Hessian via jax.
    y_fun: (x, u, p, t) -> y residual vector (LS / NLS / CONL inner).
    psi_fun: (r, p) -> scalar convex outer (CONL only).
    ext_fun: (x, u, p, t) -> scalar (EXTERNAL only).
    ny: residual dimension (LS family).
    """

    kind: str
    ny: int = 0
    y_fun: Optional[Callable] = None
    psi_fun: Optional[Callable] = None
    ext_fun: Optional[Callable] = None
    # the residual/cost callable references the algebraic variable z:
    # signature becomes (x, u, z, p, t); the linearizer supplies z via an
    # affine model z0 + Jz dw around the linearization point (reference:
    # cost modules consume z + dzduxt from the dynamics module,
    # ocp_nlp_cost_ls.c Vz / ocp_nlp_dynamics_cont.c:847-851)
    with_z: bool = False
    # cost integration (reference cost_discretization = INTEGRATOR):
    # the callable takes an extra trailing dt argument (interval length)
    # and — for the LS family — returns a STACKED (nq, ny) residual at
    # the integrator's quadrature points, combined with quad_weights
    # (nq,) so the Gauss-Newton Hessian is the integrated one
    # (sum_q w_q J_q' W J_q). See interface.builder._wrap_cost_integrator.
    needs_dt: bool = False
    quad_weights: Optional[np.ndarray] = None
    # LINEAR_LS constant Jacobian blocks (numpy); when set, quad_approx
    # skips the AD pass entirely (the reference precomputes V'WV once,
    # ocp_nlp_cost_ls.c:854 — here W may change at runtime via cost_set,
    # so the product stays in the trace but the Jacobian is a constant)
    Vx: Optional[np.ndarray] = None
    Vu: Optional[np.ndarray] = None

    def _call(self, fn, x, u, p, t, zlin, dt_=None):
        if self.with_z:
            z = (zlin(x, u) if zlin is not None
                 else jnp.zeros((0,), x.dtype))
            return fn(x, u, z, p, t)
        if self.needs_dt:
            return fn(x, u, p, t, dt_)
        return fn(x, u, p, t)

    def value(self, x, u, p, t, data, zlin=None, dt_=None) -> jnp.ndarray:
        """Stage cost value (excluding slack penalties)."""
        if self.kind in ("LINEAR_LS", "NONLINEAR_LS"):
            if self.quad_weights is not None:
                Y = self._call(self.y_fun, x, u, p, t, zlin, dt_)
                R = Y - data["yref"][None, :]
                wq = jnp.asarray(self.quad_weights, x.dtype)
                return 0.5 * jnp.einsum("q,qi,ij,qj->", wq, R,
                                        data["W"], R)
            r = self._call(self.y_fun, x, u, p, t, zlin, dt_) \
                - data["yref"]
            return 0.5 * r @ data["W"] @ r
        if self.kind == "CONL":
            if self.quad_weights is not None:
                # INTEGRATOR: psi applied per quadrature point
                Y = self._call(self.y_fun, x, u, p, t, zlin, dt_)
                R = Y - data["yref"][None, :]
                wq = jnp.asarray(self.quad_weights, x.dtype)
                vals = jax.vmap(lambda r_: self.psi_fun(r_, p))(R)
                return jnp.sum(wq * vals)
            r = self._call(self.y_fun, x, u, p, t, zlin, dt_) \
                - data["yref"]
            return self.psi_fun(r, p)
        if self.kind == "EXTERNAL":
            return self._call(self.ext_fun, x, u, p, t, zlin, dt_)
        raise ValueError(self.kind)

    def quad_approx(self, x, u, p, t, data, exact_hessian: bool,
                    zlin=None, dt_=None):
        """Quadratic approximation at (x, u): returns (H, grad) over
        w = [x; u] — the reference's cost update_qp_matrices
        (ocp_nlp_cost_ls.c:883 RSQrq/grad packing). zlin: affine
        z(x, u) model; since it is affine, plain AD of the composition
        yields exactly the reference's dzduxt chain rule (and no d2z
        term, matching the reference's first-order z treatment)."""
        nx, nu = x.shape[-1], u.shape[-1]

        def split(w):
            return w[:nx], w[nx:]

        w = jnp.concatenate([x, u])
        if self.kind == "LINEAR_LS" and self.Vx is not None:
            Vx = jnp.asarray(self.Vx, w.dtype)
            Vu = (jnp.zeros((Vx.shape[0], nu), w.dtype)
                  if self.Vu is None else jnp.asarray(self.Vu, w.dtype))
            J = jnp.concatenate([Vx, Vu], axis=1)
            r = Vx @ x + Vu @ u - data["yref"]
            Wr = data["W"] @ r
            return J.T @ data["W"] @ J, J.T @ Wr
        if self.kind in ("LINEAR_LS", "NONLINEAR_LS") \
                and self.quad_weights is not None:
            # integrated Gauss-Newton over quadrature points
            yf = lambda w_: self._call(self.y_fun, *split(w_), p, t,
                                       zlin, dt_)
            Y = yf(w)                            # (nq, ny)
            J = jax.jacfwd(yf)(w)                # (nq, ny, nw)
            R = Y - data["yref"][None, :]
            wq = jnp.asarray(self.quad_weights, w.dtype)
            WR = jnp.einsum("ij,qj->qi", data["W"], R)
            grad = jnp.einsum("q,qiw,qi->w", wq, J, WR)
            H = jnp.einsum("q,qiw,ij,qjv->wv", wq, J, data["W"], J)
            if exact_hessian:
                H = H + jax.hessian(
                    lambda w_: jnp.einsum(
                        "q,qi,qi->", wq, yf(w_),
                        jax.lax.stop_gradient(WR)))(w)
            return H, grad
        if self.kind in ("LINEAR_LS", "NONLINEAR_LS"):
            yf = lambda w_: self._call(self.y_fun, *split(w_), p, t,
                                       zlin, dt_)
            y = yf(w)
            J = jax.jacfwd(yf)(w)
            r = y - data["yref"]
            Wr = data["W"] @ r
            grad = J.T @ Wr
            H = J.T @ data["W"] @ J
            if exact_hessian and self.kind == "NONLINEAR_LS":
                # exact = GN + sum_i (W r)_i * hess(y_i) (the contraction
                # the reference gets from the nls_y_hess external function)
                H = H + jax.hessian(
                    lambda w_: yf(w_) @ jax.lax.stop_gradient(Wr))(w)
            return H, grad
        if self.kind == "CONL" and self.quad_weights is not None:
            # integrated generalized Gauss-Newton: per quadrature point
            # H += w_q J_q' psi''(r_q) J_q (outer convexity per point)
            yf = lambda w_: (self._call(self.y_fun, *split(w_), p, t,
                                        zlin, dt_)
                             - data["yref"][None, :])
            R = yf(w)                           # (nq, ny)
            J = jax.jacfwd(yf)(w)               # (nq, ny, nw)
            wq = jnp.asarray(self.quad_weights, w.dtype)
            gpsi = jax.vmap(jax.grad(lambda r_: self.psi_fun(r_, p)))(R)
            Hpsi = jax.vmap(jax.hessian(
                lambda r_: self.psi_fun(r_, p)))(R)
            grad = jnp.einsum("q,qiw,qi->w", wq, J, gpsi)
            H = jnp.einsum("q,qiw,qij,qjv->wv", wq, J, Hpsi, J)
            return H, grad
        if self.kind == "CONL":
            yf = lambda w_: (self._call(self.y_fun, *split(w_), p, t,
                                        zlin, dt_)
                             - data["yref"])
            r = yf(w)
            J = jax.jacfwd(yf)(w)
            gpsi = jax.grad(lambda r_: self.psi_fun(r_, p))(r)
            Hpsi = jax.hessian(lambda r_: self.psi_fun(r_, p))(r)
            return J.T @ Hpsi @ J, J.T @ gpsi
        if self.kind == "EXTERNAL":
            f = lambda w_: self._call(self.ext_fun, *split(w_), p, t,
                                      zlin, dt_)
            grad = jax.grad(f)(w)
            H = jax.hessian(f)(w)
            if not exact_hessian:
                # symmetrize-only; EXTERNAL with GN request keeps exact H
                H = 0.5 * (H + H.T)
            return H, grad
        raise ValueError(self.kind)


# ---------------------------------------------------------------------------
# Constraint module (BGH): unified row block
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConstraintSpec:
    """One stage-class BGH constraint block, folded to unified rows.

    Row layout: [box-x rows | box-u rows | general C/D rows | nonlinear h
    rows], mirroring the reference's (idxb, C/D, h) split
    (ocp_nlp_constraints_bgh.c:1216) but evaluated as one dense block.

    idxbx/idxbu: bounded state/input indices (static python tuples).
    Cg, Dg: general linear rows (numpy, (ng, nx) / (ng, nu)).
    h_fun: (x, u, p, t) -> (nh,) nonlinear rows.
    soft_rows: indices (into the unified row block) that are softened
      (reference idxs mapping, acados_ocp_constraints.py idxsbx/ibu/sg/sh).
    """

    nx: int
    nu: int
    idxbx: tuple = ()
    idxbu: tuple = ()
    Cg: Optional[np.ndarray] = None
    Dg: Optional[np.ndarray] = None
    nh: int = 0
    h_fun: Optional[Callable] = None
    # h references z: h_fun signature (x, u, z, p, t) (problem
    # formulation tex:125 h(x, u, z, p); z supplied via the affine model)
    with_z: bool = False
    soft_rows: tuple = ()
    # BGP: convex-over-nonlinear rows phi(r(x, u)) appended after the h
    # block (reference ocp_nlp_constraints_bgp.c; phi convex in r). The
    # QP rows use the chain-rule Jacobian; the exploitable outer
    # curvature lam' * Jr' phi'' Jr enters the stage Hessian via
    # `bgp_hess` (the reference adds it to RSQrq in update_qp_matrices).
    nphi: int = 0
    phi_fun: Optional[Callable] = None  # (r,) -> (nphi,)
    r_fun: Optional[Callable] = None    # (x, u, p, t) -> (nr,)

    @property
    def nbx(self):
        return len(self.idxbx)

    @property
    def nbu(self):
        return len(self.idxbu)

    @property
    def ng(self):
        return 0 if self.Cg is None else self.Cg.shape[0]

    @property
    def nrows(self):
        return self.nbx + self.nbu + self.ng + self.nh + self.nphi

    def base_CD(self, dtype):
        """Constant part of the unified rows (box selectors + general)."""
        nr = self.nrows
        C = np.zeros((nr, self.nx))
        D = np.zeros((nr, self.nu))
        for i, j in enumerate(self.idxbx):
            C[i, j] = 1.0
        for i, j in enumerate(self.idxbu):
            D[self.nbx + i, j] = 1.0
        o = self.nbx + self.nbu
        if self.ng:
            C[o:o + self.ng] = self.Cg
            if self.Dg is not None:
                D[o:o + self.ng] = self.Dg
        return jnp.asarray(C, dtype), jnp.asarray(D, dtype)

    def _call_h(self, x, u, p, t, zlin):
        if self.with_z:
            z = (zlin(x, u) if zlin is not None
                 else jnp.zeros((0,), x.dtype))
            return self.h_fun(x, u, z, p, t)
        return self.h_fun(x, u, p, t)

    def eval_rows(self, x, u, p, t, zlin=None):
        """Row values g(x, u) and Jacobian rows for the nonlinear block."""
        vals = []
        if self.nbx:
            vals.append(x[jnp.array(self.idxbx)])
        if self.nbu:
            vals.append(u[jnp.array(self.idxbu)])
        if self.ng:
            gv = jnp.asarray(self.Cg, x.dtype) @ x
            if self.Dg is not None:
                gv = gv + jnp.asarray(self.Dg, x.dtype) @ u
            vals.append(gv)
        if self.nh:
            vals.append(self._call_h(x, u, p, t, zlin))
        if self.nphi:
            vals.append(self.phi_fun(self.r_fun(x, u, p, t)))
        if not vals:
            return jnp.zeros((0,), x.dtype)
        return jnp.concatenate(vals)

    def h_jac(self, x, u, p, t, zlin=None):
        """(nnl, nx), (nnl, nu) Jacobians of the nonlinear rows
        (h block followed by the phi(r) block, chain rule via AD)."""
        nx = self.nx
        w = jnp.concatenate([x, u])

        def nl(w_):
            vals = []
            if self.nh:
                vals.append(self._call_h(w_[:nx], w_[nx:], p, t, zlin))
            if self.nphi:
                vals.append(self.phi_fun(self.r_fun(w_[:nx], w_[nx:],
                                                    p, t)))
            return jnp.concatenate(vals)

        J = jax.jacfwd(nl)(w)
        return J[:, :nx], J[:, nx:]

    def bgp_hess(self, x, u, p, t, w_phi):
        """Multiplier-weighted outer-curvature Hessian contribution
        sum_i w_i * Jr' (d2 phi_i / dr2) Jr over (x, u) — the BGP
        exploitable convexity (reference ocp_nlp_constraints_bgp.c:
        only the outer Hessian, never d2r). w_phi: (nphi,) weights
        (lam_u - lam_l of the phi rows)."""
        nx = self.nx
        w = jnp.concatenate([x, u])
        r = self.r_fun(x, u, p, t)
        Hphi = jax.hessian(lambda r_: jnp.dot(w_phi,
                                              self.phi_fun(r_)))(r)
        Jr = jax.jacfwd(lambda w_: self.r_fun(w_[:nx], w_[nx:], p, t))(w)
        return Jr.T @ Hphi @ Jr

    def soft_row_mask(self, dtype):
        m = np.zeros(self.nrows)
        for i in self.soft_rows:
            m[i] = 1.0
        return jnp.asarray(m, dtype)


# ---------------------------------------------------------------------------
# Whole-problem formulation + runtime data
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class OcpNlpFormulation:
    """Static description of the discretized OCP (multiple shooting).

    The reference equivalent is the assembled plan/config/dims
    (ocp_nlp_plan_t, interfaces/acados_c/ocp_nlp_interface.h:109-140) after
    codegen; here it is a plain python object whose callables get traced
    into the solver's XLA program.
    """

    N: int
    nx: int
    nu: int
    np_: int  # parameter dimension
    step_fn: Callable  # (x, u, p, t, dt) -> x_next  (discrete dynamics)
    # optional fused step+Jacobian: (x, u, p, t, dt) -> (x_next, A, B);
    # the linearizer prefers it over jacfwd(step_fn) (see
    # sim.integrator.make_step_jac_fn — the forward-VDE fast path).
    # When nz > 0, returns (x_next, A, B, z0, Jz) — z at the interval
    # start + dz/d(x,u) (reference dzduxt, ocp_nlp_dynamics_cont.c:851)
    step_jac_fn: Optional[Callable] = None
    # DAE algebraic dimension; when > 0, cost/constraint specs flagged
    # with_z receive z through an affine model at each linearization
    nz: int = 0
    # exact z(t0) evaluator (x, u, p, t, dt) -> (nz,) for merit/trial
    # evaluations (sim.irk.make_irk_z0_fun)
    z_fun: Optional[Callable] = None
    cost_0: CostSpec = None
    cost: CostSpec = None
    cost_e: CostSpec = None
    con_0: ConstraintSpec = None
    con: ConstraintSpec = None
    con_e: ConstraintSpec = None
    exact_hessian: bool = False  # GAUSS_NEWTON (default) vs EXACT
    # which Lagrangian terms contribute second-order information in EXACT
    # mode (reference exact_hess_cost/dyn/constr,
    # acados_ocp_options.py:96-98; all default on)
    exact_hess_cost: bool = True
    exact_hess_dyn: bool = True
    exact_hess_constr: bool = True
    # stage-0 box rows are a full-state equality (constraints.x0 /
    # idxbxe_0 == range(nx)): enables initial-state elimination in the
    # QP (reference: HPIPM d_ocp_qp_reduce_eq_dof via idxbxe tagging)
    x0_equality: bool = False

    @property
    def nc(self) -> int:
        """Unified constraint rows, padded across stage classes."""
        return max(self.con_0.nrows, self.con.nrows, self.con_e.nrows, 1)


@pytree_dataclass
class NlpData:
    """Runtime-changeable problem data (everything the reference lets you
    `set` between solves without re-codegen: yref, W, bounds, parameters,
    slack penalties — acados_ocp_solver.py cost_set/constraints_set).

    Row-bound arrays are already in unified row layout per stage class.
    Shapes: *_0 (…), path arrays lead with (N-1, …), *_e (…).
    """

    p: jnp.ndarray          # (N+1, np)
    ts: jnp.ndarray         # (N+1,) stage times
    dts: jnp.ndarray        # (N,) interval lengths
    cost_scale: jnp.ndarray  # (N+1,) stage cost scaling (default dts, 1 at N)
    yref_0: Any
    W_0: Any
    yref: Any               # (N-1, ny)
    W: Any                  # (N-1, ny, ny)
    yref_e: Any
    W_e: Any
    lb_0: jnp.ndarray       # (nc,) padded unified lower bounds, stage 0
    ub_0: jnp.ndarray
    lb: jnp.ndarray         # (N-1, nc)
    ub: jnp.ndarray
    lb_e: jnp.ndarray
    ub_e: jnp.ndarray
    Zl_0: jnp.ndarray       # (nc,) quadratic soft penalties (0 on hard rows)
    Zu_0: jnp.ndarray
    zl_0: jnp.ndarray
    zu_0: jnp.ndarray
    Zl: jnp.ndarray         # (N-1, nc)
    Zu: jnp.ndarray
    zl: jnp.ndarray
    zu: jnp.ndarray
    Zl_e: jnp.ndarray
    Zu_e: jnp.ndarray
    zl_e: jnp.ndarray
    zu_e: jnp.ndarray


def cost_data_stage0(data: NlpData):
    return {"yref": data.yref_0, "W": data.W_0}


def cost_data_path(data: NlpData):
    return {"yref": data.yref, "W": data.W}


def cost_data_term(data: NlpData):
    return {"yref": data.yref_e, "W": data.W_e}
