"""AcadosOcp -> internal formulation + default runtime data.

The reference equivalent of this module is the codegen pipeline:
make_consistent (acados_ocp.py:267-733) + casadi_function_generation +
tera template rendering + C compilation (SURVEY.md §3.1). Here there is no
codegen — the jax callables are traced directly into the jitted solver —
so "building" reduces to dimension inference, folding box/general/nonlinear
constraints into unified rows, and laying out the runtime NlpData arrays.
"""
from __future__ import annotations

import inspect

import jax.numpy as jnp
import numpy as np

from acados_tpu.interface.acados_ocp import AcadosOcp, _dim_of
from acados_tpu.ocp_nlp.formulation import (ConstraintSpec, CostSpec,
                                            NlpData, OcpNlpFormulation)
from acados_tpu.sim.integrator import (SimOpts, make_step_fn,
                                       make_step_jac_fn)
from acados_tpu.utils.types import ACADOS_INFTY


def _norm4(f):
    """Normalize (x, u[, p[, t]]) callables to (x, u, p, t)."""
    if f is None:
        return None
    n = len(inspect.signature(f).parameters)
    if n == 2:
        return lambda x, u, p, t: f(x, u)
    if n == 3:
        return lambda x, u, p, t: f(x, u, p)
    return f


def _norm_z(f):
    """Normalize a stage callable that may reference the algebraic
    variable z. Returns (fn, with_z):
      with_z=False: fn(x, u, p, t)   (plain _norm4 path)
      with_z=True:  fn(x, u, z, p, t)
    z participation is declared by a parameter literally named 'z'
    (reference analog: the CasADi expression containing model.z;
    problem formulation tex:125 l(x,u,z,...), h(x,u,z,...))."""
    if f is None:
        return None, False
    params = list(inspect.signature(f).parameters)
    if "z" not in params:
        return _norm4(f), False
    n = len(params)
    if n == 3:    # (x, u, z)
        return (lambda x, u, z, p, t: f(x, u, z)), True
    if n == 4:    # (x, u, z, p)
        return (lambda x, u, z, p, t: f(x, u, z, p)), True
    if n == 5:    # (x, u, z, p, t)
        return f, True
    raise ValueError("z-dependent expressions must take "
                     "(x, u, z[, p[, t]])")


def _norm_term(f):
    """Normalize terminal (x[, p[, t]]) callables to (x, u, p, t)."""
    if f is None:
        return None
    n = len(inspect.signature(f).parameters)
    if n == 1:
        return lambda x, u, p, t: f(x)
    if n == 2:
        return lambda x, u, p, t: f(x, p)
    return lambda x, u, p, t: f(x, p, t)


class StageLayout:
    """Row offsets of the unified constraint block for one stage class."""

    def __init__(self, spec: ConstraintSpec):
        self.nbx, self.nbu = spec.nbx, spec.nbu
        self.ng, self.nh = spec.ng, spec.nh
        self.nphi = spec.nphi
        self.off_bx = 0
        self.off_bu = self.nbx
        self.off_g = self.nbx + self.nbu
        self.off_h = self.off_g + self.ng
        self.off_phi = self.off_h + self.nh
        self.nrows = spec.nrows


def _linear_ls_yfun_z(Vx, Vu, Vz):
    """LINEAR_LS with an algebraic block: y = Vx x + Vu u + Vz z
    (reference ocp_nlp_cost_ls.c:243 Vz)."""
    Vx = np.asarray(Vx, np.float64)
    Vu = None if Vu is None else np.asarray(Vu, np.float64)
    Vz = np.asarray(Vz, np.float64)

    def y(x, u, z, p, t):
        out = jnp.asarray(Vx, x.dtype) @ x + jnp.asarray(Vz, x.dtype) @ z
        if Vu is not None:
            out = out + jnp.asarray(Vu, x.dtype) @ u
        return out

    return y, Vx.shape[0]


def _linear_ls_yfun(Vx, Vu):
    Vx = np.asarray(Vx, np.float64)
    Vu = None if Vu is None else np.asarray(Vu, np.float64)

    def y(x, u, p, t):
        out = jnp.asarray(Vx, x.dtype) @ x
        if Vu is not None:
            out = out + jnp.asarray(Vu, x.dtype) @ u
        return out

    return y, Vx.shape[0]


def _resolve_auto_cost(ocp: AcadosOcp) -> None:
    """'AUTO' cost detection (reference acados_ocp.py:2399
    detect_cost_type): when a stage cost is declared AUTO, probe the
    EXTERNAL cost expression numerically — if its Hessian over (x, u) is
    constant (quadratic cost) and the linear term lies in the range of the
    Hessian, reformulate as LINEAR_LS (Vx/Vu/W/yref); otherwise fall back
    to EXTERNAL. The reference decides symbolically via
    `ca.is_quadratic`; here: Hessian-constancy at random probes plus an
    exact reconstruction check."""
    import jax

    c, m = ocp.cost, ocp.model
    nx, nu = _dim_of(m.x), _dim_of(m.u)
    rng = np.random.default_rng(0)

    def detect(which):
        sfx = {"0": "_0", "path": "", "e": "_e"}[which]
        ext = getattr(m, "cost_expr_ext_cost" + sfx, None)
        if ext is None and which in ("0", "e"):
            ext = m.cost_expr_ext_cost
        if ext is None:
            raise ValueError(
                "AUTO cost detection requires cost_expr_ext_cost"
                f"{sfx} (reference acados_ocp.py:2427)")
        f4 = _norm4(ext)
        nu_eff = 0 if which == "e" else nu
        nw = nx + nu_eff
        p0 = jnp.zeros((_dim_of(m.p),))

        def fw(w):
            return f4(w[:nx], jnp.concatenate(
                [w[nx:], jnp.zeros((nu - nu_eff,), w.dtype)]), p0, 0.0)

        hess = jax.jit(jax.hessian(fw))
        H0 = np.asarray(hess(jnp.zeros(nw)))
        for _ in range(3):
            Hp = np.asarray(hess(jnp.asarray(rng.normal(size=nw))))
            if not np.allclose(Hp, H0, rtol=1e-8, atol=1e-10):
                return "EXTERNAL", None
        g0 = np.asarray(jax.grad(fw)(jnp.zeros(nw)))
        idx = [i for i in range(nw) if np.any(np.abs(H0[i]) > 1e-12)]
        if not idx:
            return "EXTERNAL", None  # zero/linear cost: keep as-is
        Hs = H0[np.ix_(idx, idx)]
        gs = g0[idx]
        try:
            yref = -np.linalg.solve(Hs, gs)
        except np.linalg.LinAlgError:
            return "EXTERNAL", None
        if np.any(np.abs(np.delete(g0, idx)) > 1e-10):
            return "EXTERNAL", None  # linear term outside Hessian range
        V = np.zeros((len(idx), nw))
        for r, i in enumerate(idx):
            V[r, i] = 1.0
        # reconstruction check incl. the constant offset
        w = rng.normal(size=nw)
        ls_val = 0.5 * (V @ w - yref) @ Hs @ (V @ w - yref)
        f_val = float(fw(jnp.asarray(w))) - float(fw(jnp.zeros(nw))) \
            + 0.5 * yref @ Hs @ yref
        if not np.isclose(ls_val, f_val, rtol=1e-8, atol=1e-8):
            return "EXTERNAL", None
        return "LINEAR_LS", (V[:, :nx], V[:, nx:] if nu_eff else None,
                             Hs, yref)

    for which, attr in (("0", "cost_type_0"), ("path", "cost_type"),
                        ("e", "cost_type_e")):
        if getattr(c, attr, None) != "AUTO":
            continue
        kind, ls = detect(which)
        sfx = {"0": "_0", "path": "", "e": "_e"}[which]
        setattr(c, attr, kind)
        if kind == "LINEAR_LS":
            Vx, Vu, W, yref = ls
            setattr(c, "Vx" + sfx, Vx)
            if which != "e":
                setattr(c, "Vu" + sfx, Vu)
            setattr(c, "W" + sfx, W)
            setattr(c, "yref" + sfx, yref)


def _build_cost_spec(ocp: AcadosOcp, which: str):
    """which in {'0', 'path', 'e'}; falls back to the path cost type when
    the _0 variant is unset (reference make_consistent behavior)."""
    c, m = ocp.cost, ocp.model
    if which == "0":
        kind = c.cost_type_0 or c.cost_type
        if kind == "LINEAR_LS":
            Vx = c.Vx_0 if c.Vx_0 is not None else c.Vx
            Vu = c.Vu_0 if c.Vu_0 is not None else c.Vu
            Vz = c.Vz_0 if c.Vz_0 is not None else c.Vz
            if Vz is not None:
                y, ny = _linear_ls_yfun_z(Vx, Vu, Vz)
                return CostSpec(kind=kind, ny=ny, y_fun=y, with_z=True)
            y, ny = _linear_ls_yfun(Vx, Vu)
            return CostSpec(kind=kind, ny=ny, y_fun=y,
                            Vx=np.asarray(Vx, np.float64),
                            Vu=None if Vu is None
                            else np.asarray(Vu, np.float64))
        if kind == "NONLINEAR_LS":
            f, wz = _norm_z(m.cost_y_expr_0 or m.cost_y_expr)
            yref = c.yref_0 if c.yref_0 is not None else c.yref
            return CostSpec(kind=kind, ny=_dim_of(yref), y_fun=f,
                            with_z=wz)
        if kind == "CONL":
            f, wz = _norm_z(m.cost_y_expr_0 or m.cost_y_expr)
            psi = m.cost_psi_expr_0 or m.cost_psi_expr
            return CostSpec(kind=kind, ny=_dim_of(c.yref_0 if c.yref_0 is
                                                  not None else c.yref),
                            y_fun=f, psi_fun=psi, with_z=wz)
        if kind == "EXTERNAL":
            f, wz = _norm_z(m.cost_expr_ext_cost_0 or m.cost_expr_ext_cost)
            return CostSpec(kind=kind, ext_fun=f, with_z=wz)
    elif which == "path":
        kind = c.cost_type
        if kind == "LINEAR_LS":
            if c.Vz is not None:
                y, ny = _linear_ls_yfun_z(c.Vx, c.Vu, c.Vz)
                return CostSpec(kind=kind, ny=ny, y_fun=y, with_z=True)
            y, ny = _linear_ls_yfun(c.Vx, c.Vu)
            return CostSpec(kind=kind, ny=ny, y_fun=y,
                            Vx=np.asarray(c.Vx, np.float64),
                            Vu=None if c.Vu is None
                            else np.asarray(c.Vu, np.float64))
        if kind == "NONLINEAR_LS":
            f, wz = _norm_z(m.cost_y_expr)
            return CostSpec(kind=kind, ny=_dim_of(c.yref), y_fun=f,
                            with_z=wz)
        if kind == "CONL":
            f, wz = _norm_z(m.cost_y_expr)
            return CostSpec(kind=kind, ny=_dim_of(c.yref), y_fun=f,
                            psi_fun=m.cost_psi_expr, with_z=wz)
        if kind == "EXTERNAL":
            f, wz = _norm_z(m.cost_expr_ext_cost)
            return CostSpec(kind=kind, ext_fun=f, with_z=wz)
    else:
        kind = c.cost_type_e or c.cost_type
        if kind == "LINEAR_LS":
            if c.Vx_e is None:
                # no terminal cost specified -> zero terminal cost
                return CostSpec(kind="EXTERNAL",
                                ext_fun=lambda x, u, p, t: jnp.zeros(
                                    (), x.dtype))
            y, ny = _linear_ls_yfun(c.Vx_e, None)
            return CostSpec(kind="LINEAR_LS", ny=ny, y_fun=y,
                            Vx=np.asarray(c.Vx_e, np.float64))
        if kind == "NONLINEAR_LS":
            return CostSpec(kind=kind, ny=_dim_of(c.yref_e),
                            y_fun=_norm_term(m.cost_y_expr_e))
        if kind == "CONL":
            return CostSpec(kind=kind, ny=_dim_of(c.yref_e),
                            y_fun=_norm_term(m.cost_y_expr_e),
                            psi_fun=m.cost_psi_expr_e)
        if kind == "EXTERNAL":
            f = m.cost_expr_ext_cost_e
            if f is None:
                return CostSpec(kind="EXTERNAL",
                                ext_fun=lambda x, u, p, t: jnp.zeros(
                                    (), x.dtype))
            return CostSpec(kind="EXTERNAL", ext_fun=_norm_term(f))
    raise ValueError(f"unsupported cost type {kind!r}")


def _wrap_cost_integrator(spec, points_fn, weights):
    """cost_discretization = INTEGRATOR: evaluate the Lagrange cost at
    the dynamics integrator's quadrature points instead of the Euler
    point (reference cost_discretization, acados_ocp_options.py:2285 —
    "only supported for IRK integrator"; scope check acados_ocp.py:
    1176-1178 restricts to NONLINEAR_LS and CONVEX_OVER_NONLINEAR; value
    pinned by the exact-value CI oracle test_cost_integration_value.py:46).

    points_fn(x, u, p, t, dtk) -> (Xs (nq, nx), Zs (nq, nz) | None,
    Ts (nq,)); weights (nq,) sum to 1 (the external dt factor comes from
    NlpData.cost_scale = dts).

    LS family: the integral of the weighted residual norm IS a weighted
    least squares over the stacked stage residuals, so Gauss-Newton
    structure is preserved exactly (sum_q w_q J_q' W J_q). CONL: stacked
    inner residuals with the outer psi applied per point — the
    generalized GN Hessian sum_q w_q J_q' psi''(r_q) J_q (CostSpec
    stacked-CONL branch). EXTERNAL: plain quadrature of the scalar cost
    (an extension over the reference's scope). z-dependent integrands
    receive the per-point algebraic stage values Zs (IRK only — ERK has
    no z)."""
    import dataclasses as _dc

    wq = np.asarray(weights, np.float64)

    def call_pt(f0, x, u, p, t, dtk):
        Xs, Zs, Ts = points_fn(x, u, p, t, dtk)
        if spec.with_z:
            return jnp.stack([f0(xi, u, zi, p, ti) for xi, zi, ti in
                              zip(Xs, Zs, Ts)])
        return jnp.stack([f0(xi, u, p, ti) for xi, ti in zip(Xs, Ts)])

    if spec.kind in ("LINEAR_LS", "NONLINEAR_LS", "CONL"):
        y0 = spec.y_fun

        def y_int(x, u, p, t, dtk):
            return call_pt(y0, x, u, p, t, dtk)

        return _dc.replace(
            spec, kind=("CONL" if spec.kind == "CONL" else "NONLINEAR_LS"),
            y_fun=y_int, Vx=None, Vu=None, needs_dt=True, with_z=False,
            quad_weights=wq)
    if spec.kind == "EXTERNAL":
        e0 = spec.ext_fun

        def e_int(x, u, p, t, dtk):
            vals = call_pt(e0, x, u, p, t, dtk)
            return jnp.sum(jnp.asarray(wq, x.dtype) * vals)

        return _dc.replace(spec, ext_fun=e_int, needs_dt=True,
                           with_z=False)
    raise ValueError(spec.kind)


def _erk_points_fn(f4, num_stages, num_steps):
    """Quadrature points of the explicit-RK chain (our ERK extension of
    the reference's IRK-only INTEGRATOR support)."""
    from acados_tpu.sim.butcher import erk_tableau

    A_t, b_t, c_t = erk_tableau(num_stages)
    ns, m = num_stages, num_steps

    def points(x, u, p, t, dtk):
        h = dtk / m
        Ax = A_t.astype(x.dtype)
        bx = b_t.astype(x.dtype)
        cx = c_t.astype(x.dtype)
        pts_x, pts_t = [], []
        xcur = x
        for s_ in range(m):
            t0 = t + s_ * h
            ks = []
            for si in range(ns):
                xi = xcur
                for sj in range(si):
                    if A_t[si, sj] != 0.0:
                        xi = xi + (h * Ax[si, sj]) * ks[sj]
                ks.append(f4(xi, u, p, t0 + cx[si] * h))
                pts_x.append(xi)
                pts_t.append(t0 + cx[si] * h)
            for sj in range(ns):
                xcur = xcur + (h * bx[sj]) * ks[sj]
        return (jnp.stack(pts_x), None, jnp.stack(pts_t))

    weights = np.tile(np.asarray(b_t, np.float64) / m, m)
    return points, weights


def _idx(v):
    return tuple(int(i) for i in np.atleast_1d(v)) if v is not None else ()


def _build_con_specs(ocp: AcadosOcp, nx, nu):
    con, m = ocp.constraints, ocp.model

    idxbx_0 = _idx(con.idxbx_0)
    if con.x0 is not None and not idxbx_0:
        idxbx_0 = tuple(range(nx))
    h0, h0_wz = _norm_z(m.con_h_expr_0 or m.con_h_expr)
    nh0 = _dim_of(con.lh_0 if con.lh_0 is not None else con.lh) \
        if h0 is not None else 0

    hp, hp_wz = _norm_z(m.con_h_expr)
    nhp = _dim_of(con.lh if con.lh is not None else con.uh) \
        if hp is not None else 0

    he = _norm_term(m.con_h_expr_e) if m.con_h_expr_e is not None else None
    nhe = _dim_of(con.lh_e if con.lh_e is not None else con.uh_e) \
        if he is not None else 0

    # BGP phi(r) rows (reference con_phi_expr/con_r_expr + lphi/uphi)
    def bgp(phi_expr, r_expr, lphi, uphi, term=False):
        if phi_expr is None or r_expr is None:
            return 0, None, None
        nphi = _dim_of(lphi if lphi is not None else uphi)
        r_n = _norm_term(r_expr) if term else _norm4(r_expr)
        return nphi, phi_expr, r_n

    nphi0, phi0, r0 = bgp(m.con_phi_expr_0 or m.con_phi_expr,
                          m.con_r_expr_0 or m.con_r_expr,
                          con.lphi_0 if con.lphi_0 is not None
                          else con.lphi,
                          con.uphi_0 if con.uphi_0 is not None
                          else con.uphi)
    nphip, phip, rp = bgp(m.con_phi_expr, m.con_r_expr, con.lphi,
                          con.uphi)
    nphie, phie, re_ = bgp(m.con_phi_expr_e, m.con_r_expr_e, con.lphi_e,
                           con.uphi_e, term=True)

    Cg = None if con.C is None else np.atleast_2d(con.C)
    Dg = None if con.D is None else np.atleast_2d(con.D)
    Ce = None if con.C_e is None else np.atleast_2d(con.C_e)

    def soft_rows(layout_nbx, layout_nbu, layout_ng, layout_nh, idxsbx,
                  idxsbu, idxsg, idxsh, idxsphi=None):
        rows = [i for i in _idx(idxsbx)]
        rows += [layout_nbx + i for i in _idx(idxsbu)]
        rows += [layout_nbx + layout_nbu + i for i in _idx(idxsg)]
        rows += [layout_nbx + layout_nbu + layout_ng + i
                 for i in _idx(idxsh)]
        rows += [layout_nbx + layout_nbu + layout_ng + layout_nh + i
                 for i in _idx(idxsphi)]
        return tuple(rows)

    idxbu = _idx(con.idxbu)
    idxbx = _idx(con.idxbx)
    con_0 = ConstraintSpec(
        nx=nx, nu=nu, idxbx=idxbx_0, idxbu=idxbu, Cg=Cg, Dg=Dg,
        nh=nh0, h_fun=h0, with_z=h0_wz, nphi=nphi0, phi_fun=phi0,
        r_fun=r0,
        soft_rows=soft_rows(len(idxbx_0), len(idxbu),
                            0 if Cg is None else Cg.shape[0], nh0,
                            None, con.idxsbu, con.idxsg,
                            con.idxsh_0 if con.idxsh_0 is not None
                            else con.idxsh,
                            con.idxsphi_0 if con.idxsphi_0 is not None
                            else con.idxsphi))
    con_p = ConstraintSpec(
        nx=nx, nu=nu, idxbx=idxbx, idxbu=idxbu, Cg=Cg, Dg=Dg,
        with_z=hp_wz,
        nh=nhp, h_fun=hp, nphi=nphip, phi_fun=phip, r_fun=rp,
        soft_rows=soft_rows(len(idxbx), len(idxbu),
                            0 if Cg is None else Cg.shape[0], nhp,
                            con.idxsbx, con.idxsbu, con.idxsg, con.idxsh,
                            con.idxsphi))
    idxbx_e = _idx(con.idxbx_e)
    con_e = ConstraintSpec(
        nx=nx, nu=nu, idxbx=idxbx_e, idxbu=(), Cg=Ce, Dg=None,
        nh=nhe, h_fun=he, nphi=nphie, phi_fun=phie, r_fun=re_,
        soft_rows=soft_rows(len(idxbx_e), 0,
                            0 if Ce is None else Ce.shape[0], nhe,
                            con.idxsbx_e, None, None, con.idxsh_e,
                            con.idxsphi_e))
    return con_0, con_p, con_e


def _class_bounds(layout: StageLayout, nc, lbx, ubx, lbu, ubu, lg, ug,
                  lh, uh, lphi=None, uphi=None):
    """Fold per-kind bound vectors into unified (nc,) lower/upper rows."""
    lb = np.full(nc, -ACADOS_INFTY)
    ub = np.full(nc, ACADOS_INFTY)

    def put(off, n, lo, hi):
        if n == 0:
            return
        if lo is not None:
            lb[off:off + n] = np.atleast_1d(lo)
        if hi is not None:
            ub[off:off + n] = np.atleast_1d(hi)

    put(layout.off_bx, layout.nbx, lbx, ubx)
    put(layout.off_bu, layout.nbu, lbu, ubu)
    put(layout.off_g, layout.ng, lg, ug)
    put(layout.off_h, layout.nh, lh, uh)
    put(layout.off_phi, layout.nphi, lphi, uphi)
    # disable padded rows entirely
    lb[layout.nrows:] = -ACADOS_INFTY
    ub[layout.nrows:] = ACADOS_INFTY
    return lb, ub


def _class_slack_penalties(spec: ConstraintSpec, nc, Zl, Zu, zl, zu):
    """Scatter per-slack penalty vectors (ordered [sbx, sbu, sg, sh] like
    the spec's soft_rows) onto the unified rows."""
    out = [np.zeros(nc) for _ in range(4)]
    for vec, dst in zip((Zl, Zu, zl, zu), out):
        if vec is None:
            # default tiny quadratic penalty to keep the QP well-posed
            continue
        vec = np.atleast_1d(vec)
        for j, row in enumerate(spec.soft_rows):
            dst[row] = vec[j] if j < len(vec) else vec[-1]
    return out


def build_ocp(ocp: AcadosOcp):
    """AcadosOcp -> (OcpNlpFormulation, NlpData (numpy dict), layouts)."""
    m, c, con, so = ocp.model, ocp.cost, ocp.constraints, ocp.solver_options
    if "AUTO" in (c.cost_type, c.cost_type_0, c.cost_type_e):
        _resolve_auto_cost(ocp)
    nx = _dim_of(m.x, ocp.dims.nx or 0)
    nu = _dim_of(m.u, ocp.dims.nu or 0)
    np_dim = _dim_of(m.p, ocp.dims.np or 0)
    # p_global tail (see AcadosModel.p_global): stage callables receive
    # p_full = [p_stage | p_global | global_data]
    npg = _dim_of(getattr(m, "p_global", None))
    ngd = 0
    if getattr(m, "p_global_precompute_fun", None) is not None:
        if npg == 0:
            raise ValueError("p_global_precompute_fun needs model.p_global")
        _pg_probe = np.asarray(
            m.p_global_precompute_fun(jnp.zeros((npg,))))
        ngd = int(_pg_probe.reshape(-1).shape[0])
    np_dim = np_dim + npg + ngd
    N = so.N_horizon or ocp.dims.N
    if N is None:
        raise ValueError("set solver_options.N_horizon")

    # ---- time grid (reference: time_steps/shooting_nodes handling) -------
    if so.time_steps is not None:
        dts = np.asarray(so.time_steps, np.float64)
    elif so.shooting_nodes is not None:
        nodes = np.asarray(so.shooting_nodes, np.float64)
        dts = np.diff(nodes)
    else:
        if so.tf is None:
            raise ValueError("set solver_options.tf")
        dts = np.full(N, float(so.tf) / N)
    ts = np.concatenate([[0.0], np.cumsum(dts)])

    # ---- dynamics step function ------------------------------------------
    step_jac_fn = None
    if so.integrator_type == "DISCRETE":
        disc = _norm4(m.disc_dyn_expr)
        step_fn = lambda x, u, p, t, dt: disc(x, u, p, t)
    else:
        # LIFTED_IRK in the NLP context: the reference's payoff (one Newton
        # per SQP iteration, sim_lifted_irk_integrator.c:655) comes from
        # caching stage memory across outer iterations; in a jit-fused SQP
        # the converged IRK Newton loop fuses into the same XLA program, so
        # the OCP path maps LIFTED_IRK -> IRK (standalone lifted stepping
        # lives in sim/lifted_irk.py + AcadosSimSolver).
        itype = ("IRK" if so.integrator_type == "LIFTED_IRK"
                 else so.integrator_type)
        sim_opts = SimOpts(
            integrator_type=itype,
            num_stages=so.sim_method_num_stages,
            num_steps=so.sim_method_num_steps,
            newton_iter=so.sim_method_newton_iter,
            collocation_type=so.collocation_type)
        step_fn = make_step_fn(
            f_expl=m.f_expl_expr, f_impl=m.f_impl_expr, nx=nx, nu=nu,
            nz=_dim_of(m.z), opts=sim_opts)
        step_jac_fn = make_step_jac_fn(
            f_expl=m.f_expl_expr, f_impl=m.f_impl_expr, nx=nx, nu=nu,
            nz=_dim_of(m.z), opts=sim_opts,
            jac_reuse=bool(so.sim_method_jac_reuse))

    con_0, con_p, con_e = _build_con_specs(ocp, nx, nu)
    cost_0 = _build_cost_spec(ocp, "0")
    cost_p = _build_cost_spec(ocp, "path")
    cost_e = _build_cost_spec(ocp, "e")

    if so.cost_discretization == "INTEGRATOR":
        if so.integrator_type == "ERK":
            from acados_tpu.sim.integrator import normalize_dynamics
            pts_fn, wts = _erk_points_fn(
                normalize_dynamics(m.f_expl_expr),
                so.sim_method_num_stages, so.sim_method_num_steps)
        elif so.integrator_type in ("IRK", "LIFTED_IRK"):
            # the reference's supported integrator for INTEGRATOR cost
            # (acados_ocp_options.py:2285)
            from acados_tpu.sim.integrator import (
                implicit_from_explicit, normalize_dynamics,
                normalize_implicit_dynamics)
            fi = (normalize_implicit_dynamics(m.f_impl_expr)
                  if m.f_impl_expr is not None
                  else implicit_from_explicit(
                      normalize_dynamics(m.f_expl_expr)))
            from acados_tpu.sim.irk import make_irk_stage_points
            pts_fn, wts = make_irk_stage_points(
                fi, nx=nx, nz=_dim_of(m.z),
                num_stages=so.sim_method_num_stages,
                num_steps=so.sim_method_num_steps,
                newton_iter=so.sim_method_newton_iter,
                collocation=so.collocation_type)
        else:
            raise NotImplementedError(
                "cost_discretization INTEGRATOR supports ERK and IRK "
                "(the reference supports IRK only, "
                "acados_ocp_options.py:2285); got "
                f"{so.integrator_type}")
        cost_0 = _wrap_cost_integrator(cost_0, pts_fn, wts)
        cost_p = _wrap_cost_integrator(cost_p, pts_fn, wts)
        # terminal (Mayer) term has no integral — untouched

    # --- algebraic variables in the NLP layer (DAE-constrained OCP) ------
    nz = _dim_of(m.z)
    any_z = (cost_0.with_z or cost_p.with_z or con_0.with_z
             or con_p.with_z)
    z_fun = None
    if any_z:
        if nz == 0:
            raise ValueError("cost/constraint expressions reference z "
                             "but model.z declares nz == 0")
        if so.integrator_type not in ("IRK", "LIFTED_IRK"):
            raise ValueError(
                "z-dependent cost/constraints need an implicit DAE "
                "integrator (IRK/LIFTED_IRK); got "
                f"{so.integrator_type}")
        from acados_tpu.sim.integrator import normalize_implicit_dynamics
        from acados_tpu.sim.irk import make_irk_z0_fun
        fi = normalize_implicit_dynamics(m.f_impl_expr)
        _z0 = make_irk_z0_fun(fi, nx=nx, nz=nz,
                              num_stages=so.sim_method_num_stages,
                              newton_iter=so.sim_method_newton_iter,
                              collocation=so.collocation_type)
        nsteps = so.sim_method_num_steps
        z_fun = lambda x, u, p, t, dt: _z0(x, u, p, t, dt / nsteps)

    if nz > 0 and not any_z and step_jac_fn is not None:
        # DAE model whose cost/constraints never read z: drop the z
        # outputs so the linearizer stays on the 3-tuple fast path
        _sj = step_jac_fn
        step_jac_fn = lambda x, u, p, t, dt: _sj(x, u, p, t, dt)[:3]

    # stage-0 full-state equality detection (reference idxbxe_0; x0 sugar
    # implies it) — the static license for QP initial-state elimination
    idxbxe_0 = _idx(con.idxbxe_0)
    if con.x0 is not None and not idxbxe_0:
        idxbxe_0 = tuple(range(nx))
    x0_equality = (con_0.idxbx == tuple(range(nx))
                   and idxbxe_0 == tuple(range(nx)))

    form = OcpNlpFormulation(
        N=N, nx=nx, nu=nu, np_=np_dim, step_fn=step_fn,
        step_jac_fn=step_jac_fn,
        nz=nz if any_z else 0, z_fun=z_fun,
        cost_0=cost_0, cost=cost_p, cost_e=cost_e,
        con_0=con_0, con=con_p, con_e=con_e,
        exact_hessian=(so.hessian_approx == "EXACT"),
        exact_hess_cost=bool(so.exact_hess_cost),
        exact_hess_dyn=bool(so.exact_hess_dyn),
        exact_hess_constr=bool(so.exact_hess_constr),
        x0_equality=x0_equality)
    nc = form.nc

    lay_0, lay_p, lay_e = (StageLayout(con_0), StageLayout(con_p),
                           StageLayout(con_e))

    # ---- bounds -----------------------------------------------------------
    lbx_0 = con.lbx_0 if con.lbx_0 is not None else con.x0
    ubx_0 = con.ubx_0 if con.ubx_0 is not None else con.x0
    lb_0, ub_0 = _class_bounds(lay_0, nc, lbx_0, ubx_0, con.lbu, con.ubu,
                               con.lg, con.ug, con.lh_0 if con.lh_0 is not
                               None else con.lh,
                               con.uh_0 if con.uh_0 is not None else con.uh,
                               con.lphi_0 if con.lphi_0 is not None
                               else con.lphi,
                               con.uphi_0 if con.uphi_0 is not None
                               else con.uphi)
    lb_p, ub_p = _class_bounds(lay_p, nc, con.lbx, con.ubx, con.lbu,
                               con.ubu, con.lg, con.ug, con.lh, con.uh,
                               con.lphi, con.uphi)
    lb_e, ub_e = _class_bounds(lay_e, nc, con.lbx_e, con.ubx_e, None, None,
                               con.lg_e, con.ug_e, con.lh_e, con.uh_e,
                               con.lphi_e, con.uphi_e)

    # ---- slack penalties ---------------------------------------------------
    Zl_0, Zu_0, zl_0, zu_0 = _class_slack_penalties(
        con_0, nc, c.Zl_0 if c.Zl_0 is not None else c.Zl,
        c.Zu_0 if c.Zu_0 is not None else c.Zu,
        c.zl_0 if c.zl_0 is not None else c.zl,
        c.zu_0 if c.zu_0 is not None else c.zu)
    Zl_p, Zu_p, zl_p, zu_p = _class_slack_penalties(con_p, nc, c.Zl, c.Zu,
                                                    c.zl, c.zu)
    Zl_e, Zu_e, zl_e, zu_e = _class_slack_penalties(con_e, nc, c.Zl_e,
                                                    c.Zu_e, c.zl_e, c.zu_e)

    # ---- cost data ---------------------------------------------------------
    ny0 = form.cost_0.ny
    nyp = form.cost.ny
    nye = form.cost_e.ny
    yref_0 = np.zeros(ny0) if ny0 else np.zeros(0)
    if c.yref_0 is not None:
        yref_0 = np.asarray(c.yref_0, np.float64)
    elif c.yref is not None and ny0 == _dim_of(c.yref):
        yref_0 = np.asarray(c.yref, np.float64)
    W_0 = np.asarray(c.W_0 if c.W_0 is not None else
                     (c.W if c.W is not None else np.zeros((ny0, ny0))),
                     np.float64)
    yref_p = np.asarray(c.yref if c.yref is not None else np.zeros(nyp),
                        np.float64)
    W_p = np.asarray(c.W if c.W is not None else np.zeros((nyp, nyp)),
                     np.float64)
    yref_e = np.asarray(c.yref_e if c.yref_e is not None else np.zeros(nye),
                        np.float64)
    W_e = np.asarray(c.W_e if c.W_e is not None else np.zeros((nye, nye)),
                     np.float64)

    if c.cost_scaling is not None:
        cost_scale = np.asarray(c.cost_scaling, np.float64)
    else:
        # reference default: Lagrange term scaled by time step, Mayer by 1
        cost_scale = np.concatenate([dts, [1.0]])

    np_stage = np_dim - npg - ngd
    p0 = np.zeros(np_stage) if ocp.parameter_values is None \
        else np.asarray(ocp.parameter_values, np.float64)
    if npg:
        pg0 = (np.zeros(npg)
               if getattr(ocp, "p_global_values", None) is None
               else np.asarray(ocp.p_global_values, np.float64))
        gd0 = (np.asarray(m.p_global_precompute_fun(
            jnp.asarray(pg0))).reshape(-1) if ngd else np.zeros(0))
        p0 = np.concatenate([p0, pg0, gd0])

    data = dict(
        p=np.tile(p0, (N + 1, 1)),
        ts=ts, dts=dts, cost_scale=cost_scale,
        yref_0=yref_0, W_0=W_0,
        yref=np.tile(yref_p, (N - 1, 1)),
        W=np.tile(W_p, (N - 1, 1, 1)),
        yref_e=yref_e, W_e=W_e,
        lb_0=lb_0, ub_0=ub_0,
        lb=np.tile(lb_p, (N - 1, 1)), ub=np.tile(ub_p, (N - 1, 1)),
        lb_e=lb_e, ub_e=ub_e,
        Zl_0=Zl_0, Zu_0=Zu_0, zl_0=zl_0, zu_0=zu_0,
        Zl=np.tile(Zl_p, (N - 1, 1)), Zu=np.tile(Zu_p, (N - 1, 1)),
        zl=np.tile(zl_p, (N - 1, 1)), zu=np.tile(zu_p, (N - 1, 1)),
        Zl_e=Zl_e, Zu_e=Zu_e, zl_e=zl_e, zu_e=zu_e,
    )
    layouts = {"0": lay_0, "p": lay_p, "e": lay_e}
    return form, data, layouts


def data_to_jax(data: dict, dtype) -> NlpData:
    return NlpData(**{k: jnp.asarray(v, dtype) for k, v in data.items()})
