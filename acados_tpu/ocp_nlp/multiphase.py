"""Multi-phase OCP formulation: per-phase dynamics/cost/constraints.

TPU-native counterpart of the reference multi-phase machinery
(/root/reference/interfaces/acados_template/acados_template/
acados_multiphase_ocp.py:95-247 + the multi-solver capsule
acados_multi_solver.in.c): the horizon is partitioned into contiguous
phases, each with its own model, cost and constraint modules; stage 0
takes the first phase's initial cost/constraints, stage N the last
phase's terminal ones; transition phases are N=1 DISCRETE-dynamics
phases mapping between state spaces.

TPU mapping of phase-varying dims (SURVEY hard part (c)): every phase is
padded to the global (nx_max, nu_max); padded state coordinates get
identity dynamics, zero cost gradient and an eps quadratic cost so the
Riccati cost-to-go stays positive definite, and padded controls get an
eps penalty. Phases are *contiguous* stage ranges, so the linearization
loops over phases at trace time (one vmap per phase segment, results
concatenated) — no lax.switch, no wasted branch evaluation.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acados_tpu.ocp_nlp.formulation import (ConstraintSpec, CostSpec,
                                            cost_data_stage0,
                                            cost_data_term)
from acados_tpu.ocp_qp.data import OcpQp
from acados_tpu.utils.types import ACADOS_INFTY


@dataclasses.dataclass(frozen=True)
class PhaseSegment:
    """One phase: intervals [start, stop) of the global horizon.

    Path stages owned by the phase are max(start, 1) .. min(stop, N) - 1
    (stage `start` of phase i > 0 belongs to phase i, matching the
    reference's stage->phase map).
    """

    start: int
    stop: int
    step_fn: Callable          # padded (x, u, p, t, dt) -> x_next
    cost: CostSpec
    con: ConstraintSpec


@dataclasses.dataclass(frozen=True)
class OcpNlpMpFormulation:
    """Multi-phase analog of OcpNlpFormulation (same consumer API: the
    linearize/eval entry points dispatch on `segments`)."""

    N: int
    nx: int
    nu: int
    np_: int
    segments: Tuple[PhaseSegment, ...]
    cost_0: CostSpec = None
    con_0: ConstraintSpec = None
    cost_e: CostSpec = None
    con_e: ConstraintSpec = None
    exact_hessian: bool = False

    @property
    def nc(self) -> int:
        rows = [self.con_0.nrows, self.con_e.nrows] \
            + [s.con.nrows for s in self.segments]
        return max(rows + [1])

    @property
    def step_fn(self):
        """Stage-dispatching dynamics (used by code that integrates a
        single interval, e.g. AS-RTI SIMULATE advancement at interval 0)."""
        segs = self.segments

        def step(x, u, p, t, dt, k=0):
            for s in segs:
                if s.start <= k < s.stop:
                    return s.step_fn(x, u, p, t, dt)
            return segs[-1].step_fn(x, u, p, t, dt)

        return step

    def phase_of_interval(self, k: int) -> int:
        for i, s in enumerate(self.segments):
            if s.start <= k < s.stop:
                return i
        raise IndexError(k)


def _pad_rows(arr, nc, axis=0):
    pad = nc - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


def build_static_rows_mp(form: OcpNlpMpFormulation, dtype):
    """Per-stage constant row structure (multi-phase version of
    linearize.build_static_rows)."""
    nc, N = form.nc, form.N

    def cls_const(spec):
        C0, D0 = spec.base_CD(dtype)
        mask = jnp.concatenate([jnp.ones(spec.nrows, dtype),
                                jnp.zeros(nc - spec.nrows, dtype)])
        return (_pad_rows(C0, nc), _pad_rows(D0, nc), mask,
                _pad_rows(spec.soft_row_mask(dtype), nc))

    C_0, D_0, m_0, s_0 = cls_const(form.con_0)
    C_e, D_e, m_e, s_e = cls_const(form.con_e)

    seg_rows = []
    masks = [m_0[None]]
    softs = [s_0[None]]
    for s in form.segments:
        Cp, Dp, mp_, sp = cls_const(s.con)
        n_path = _seg_path_count(form, s)
        seg_rows.append((Cp, Dp))
        if n_path > 0:
            masks.append(jnp.tile(mp_[None], (n_path, 1)))
            softs.append(jnp.tile(sp[None], (n_path, 1)))
    masks.append(m_e[None])
    softs.append(s_e[None])
    return dict(C_0=C_0, D_0=D_0, C_e=C_e, D_e=D_e, seg_rows=seg_rows,
                mask=jnp.concatenate(masks), soft=jnp.concatenate(softs))


def _seg_path_count(form, s: PhaseSegment) -> int:
    """Number of path stages (1..N-1) owned by segment s."""
    lo = max(s.start, 1)
    hi = min(s.stop, form.N)
    return max(hi - lo, 0)


def _seg_path_range(form, s: PhaseSegment):
    return max(s.start, 1), min(s.stop, form.N)


def linearize_mp(form: OcpNlpMpFormulation, static_rows, data, it, lm):
    """Assemble the delta-form QP for a multi-phase problem: trace-time
    loop over phases, one vmap per contiguous segment."""
    N, nx, nu, nc = form.N, form.nx, form.nu, form.nc
    dt = it.x.dtype
    x, u = it.x, it.u
    eyeW = jnp.eye(nx + nu, dtype=dt)

    # ---- dynamics per segment --------------------------------------------
    A_parts, B_parts, b_parts = [], [], []
    for s in form.segments:
        def dyn_one(xk, uk, pk, tk, dtk, xk1, fn=s.step_fn):
            w = jnp.concatenate([xk, uk])
            phi = lambda w_: fn(w_[:nx], w_[nx:], pk, tk, dtk)
            xnext = phi(w)
            J = jax.jacfwd(phi)(w)
            return J[:, :nx], J[:, nx:], xnext - xk1

        sl = slice(s.start, s.stop)
        Ak, Bk, bk = jax.vmap(dyn_one)(x[s.start:s.stop], u[sl],
                                       data.p[s.start:s.stop],
                                       data.ts[s.start:s.stop],
                                       data.dts[sl], x[s.start + 1:
                                                       s.stop + 1])
        A_parts.append(Ak)
        B_parts.append(Bk)
        b_parts.append(bk)
    A = jnp.concatenate(A_parts)
    B = jnp.concatenate(B_parts)
    b = jnp.concatenate(b_parts)

    # ---- cost -------------------------------------------------------------
    def cost_one(spec, cdata, xk, uk, pk, tk, scale):
        H, g = spec.quad_approx(xk, uk, pk, tk, cdata, form.exact_hessian)
        return scale * H, scale * g

    H0, g0 = cost_one(form.cost_0, cost_data_stage0(data), x[0], u[0],
                      data.p[0], data.ts[0], data.cost_scale[0])
    Hp_parts, gp_parts = [], []
    for s in form.segments:
        lo, hi = _seg_path_range(form, s)
        if hi <= lo:
            continue
        # data.yref/W carry path stages 1..N-1 at index k-1
        Hk, gk = jax.vmap(
            lambda xk, uk, pk, tk, sc, yr, Wk, spec=s.cost: cost_one(
                spec, {"yref": yr, "W": Wk}, xk, uk, pk, tk, sc)
        )(x[lo:hi], u[lo:hi], data.p[lo:hi], data.ts[lo:hi],
          data.cost_scale[lo:hi], data.yref[lo - 1:hi - 1],
          data.W[lo - 1:hi - 1])
        Hp_parts.append(Hk)
        gp_parts.append(gk)
    Hp = jnp.concatenate(Hp_parts) if Hp_parts \
        else jnp.zeros((0, nx + nu, nx + nu), dt)
    gp = jnp.concatenate(gp_parts) if gp_parts \
        else jnp.zeros((0, nx + nu), dt)
    He, ge = cost_one(form.cost_e, cost_data_term(data), x[N],
                      jnp.zeros((nu,), dt), data.p[N], data.ts[N],
                      data.cost_scale[N])

    H_path = jnp.concatenate([H0[None], Hp], axis=0) + lm * eyeW
    g_path = jnp.concatenate([g0[None], gp], axis=0)
    Q = jnp.concatenate([H_path[:, :nx, :nx],
                         (He[:nx, :nx] + lm * jnp.eye(nx, dtype=dt))[None]])
    S = H_path[:, nx:, :nx]
    R = H_path[:, nx:, nx:]
    q = jnp.concatenate([g_path[:, :nx], ge[:nx][None]])
    r = g_path[:, nx:]

    # ---- constraint rows ---------------------------------------------------
    def rows_one(spec, Cb, Db, xk, uk, pk, tk):
        gval = _pad_rows(spec.eval_rows(xk, uk, pk, tk), nc)
        C, D = Cb, Db
        if spec.nh or spec.nphi:
            Jx, Ju = spec.h_jac(xk, uk, pk, tk)
            o = spec.nbx + spec.nbu + spec.ng
            C = jax.lax.dynamic_update_slice(C, Jx, (o, 0))
            D = jax.lax.dynamic_update_slice(D, Ju, (o, 0))
        return gval, C, D

    g0v, C0, D0 = rows_one(form.con_0, static_rows["C_0"],
                           static_rows["D_0"], x[0], u[0], data.p[0],
                           data.ts[0])
    g_parts, C_parts, D_parts = [g0v[None]], [C0[None]], [D0[None]]
    for s, (Cp_b, Dp_b) in zip(form.segments, static_rows["seg_rows"]):
        lo, hi = _seg_path_range(form, s)
        if hi <= lo:
            continue
        gk, Ck, Dk = jax.vmap(lambda xk, uk, pk, tk, spec=s.con,
                              Cb=Cp_b, Db=Dp_b: rows_one(
                                  spec, Cb, Db, xk, uk, pk, tk))(
            x[lo:hi], u[lo:hi], data.p[lo:hi], data.ts[lo:hi])
        g_parts.append(gk)
        C_parts.append(Ck)
        D_parts.append(Dk)
    gev, Ce, _De = rows_one(form.con_e, static_rows["C_e"],
                            static_rows["D_e"], x[N],
                            jnp.zeros((nu,), dt), data.p[N], data.ts[N])
    g_all = jnp.concatenate(g_parts + [gev[None]])
    C = jnp.concatenate(C_parts + [Ce[None]])
    D = jnp.concatenate(D_parts)

    lb_all = jnp.concatenate([data.lb_0[None], data.lb, data.lb_e[None]])
    ub_all = jnp.concatenate([data.ub_0[None], data.ub, data.ub_e[None]])
    exists = static_rows["mask"]
    inf_thresh = 0.5 * ACADOS_INFTY
    mask_l = exists * (lb_all > -inf_thresh)
    mask_u = exists * (ub_all < inf_thresh)
    lg = jnp.where(mask_l > 0, lb_all - g_all, -1.0)
    ug = jnp.where(mask_u > 0, ub_all - g_all, 1.0)

    sc_all = data.cost_scale[:, None]
    Zl = jnp.concatenate([data.Zl_0[None], data.Zl, data.Zl_e[None]]) \
        * sc_all
    Zu = jnp.concatenate([data.Zu_0[None], data.Zu, data.Zu_e[None]]) \
        * sc_all
    zl = jnp.concatenate([data.zl_0[None], data.zl, data.zl_e[None]]) \
        * sc_all
    zu = jnp.concatenate([data.zu_0[None], data.zu, data.zu_e[None]]) \
        * sc_all

    return OcpQp(Q=Q, R=R, S=S, q=q, r=r, A=A, B=B, b=b, C=C, D=D,
                 lg=lg, ug=ug, mask_l=mask_l, mask_u=mask_u,
                 Zl=Zl, Zu=Zu, zl=zl, zu=zu,
                 soft_mask=static_rows["soft"])


def eval_constraints_mp(form: OcpNlpMpFormulation, data, x, u):
    N, nc, nu = form.N, form.nc, form.nu
    dt = x.dtype
    parts = [_pad_rows(form.con_0.eval_rows(x[0], u[0], data.p[0],
                                            data.ts[0]), nc)[None]]
    for s in form.segments:
        lo, hi = _seg_path_range(form, s)
        if hi <= lo:
            continue
        parts.append(jax.vmap(lambda xk, uk, pk, tk, spec=s.con: _pad_rows(
            spec.eval_rows(xk, uk, pk, tk), nc))(
            x[lo:hi], u[lo:hi], data.p[lo:hi], data.ts[lo:hi]))
    parts.append(_pad_rows(form.con_e.eval_rows(
        x[N], jnp.zeros((nu,), dt), data.p[N], data.ts[N]), nc)[None])
    return jnp.concatenate(parts)


def eval_cost_mp(form: OcpNlpMpFormulation, data, x, u, sl, su, soft_mask):
    N, nu = form.N, form.nu
    dt = x.dtype
    c = form.cost_0.value(x[0], u[0], data.p[0], data.ts[0],
                          cost_data_stage0(data)) * data.cost_scale[0]
    for s in form.segments:
        lo, hi = _seg_path_range(form, s)
        if hi <= lo:
            continue
        ck = jax.vmap(lambda xk, uk, pk, tk, yr, Wk, spec=s.cost:
                      spec.value(xk, uk, pk, tk, {"yref": yr, "W": Wk}))(
            x[lo:hi], u[lo:hi], data.p[lo:hi], data.ts[lo:hi],
            data.yref[lo - 1:hi - 1], data.W[lo - 1:hi - 1])
        c = c + jnp.sum(ck * data.cost_scale[lo:hi])
    c = c + form.cost_e.value(x[N], jnp.zeros((nu,), dt), data.p[N],
                              data.ts[N], cost_data_term(data)) \
        * data.cost_scale[N]
    Zl = jnp.concatenate([data.Zl_0[None], data.Zl, data.Zl_e[None]])
    Zu = jnp.concatenate([data.Zu_0[None], data.Zu, data.Zu_e[None]])
    zl = jnp.concatenate([data.zl_0[None], data.zl, data.zl_e[None]])
    zu = jnp.concatenate([data.zu_0[None], data.zu, data.zu_e[None]])
    sc = data.cost_scale[:, None] * soft_mask
    return c + jnp.sum(sc * (zl * sl + 0.5 * Zl * sl ** 2
                             + zu * su + 0.5 * Zu * su ** 2))


def eval_dyn_gap_mp(form: OcpNlpMpFormulation, data, x, u):
    parts = []
    for s in form.segments:
        def one(xk, uk, pk, tk, dtk, xk1, fn=s.step_fn):
            return fn(xk, uk, pk, tk, dtk) - xk1

        sl = slice(s.start, s.stop)
        parts.append(jax.vmap(one)(x[s.start:s.stop], u[sl],
                                   data.p[s.start:s.stop],
                                   data.ts[s.start:s.stop], data.dts[sl],
                                   x[s.start + 1:s.stop + 1]))
    return jnp.concatenate(parts)
