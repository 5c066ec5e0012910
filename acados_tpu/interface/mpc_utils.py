"""MPC convenience utilities: cost/constraint evaluation, cost-state
augmentation, constraint-structure detection.

Counterpart of the reference mpc_utils
(/root/reference/interfaces/acados_template/acados_template/mpc_utils.py:
43 AcadosCostConstraintEvaluator, :389 create_model_with_cost_state,
:462 detect_constraint_structure, :649 J_to_idx). Where the reference builds
CasADi functions from symbolic expressions, this reuses the builder's cost /
constraint specs (jax callables traced at evaluation time), and structure
detection is numeric (randomized Jacobian-constancy probes) instead of
symbolic expression walking.
"""
from __future__ import annotations

import copy
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def J_to_idx(J) -> np.ndarray:
    """Selection-matrix -> index-vector conversion (reference
    mpc_utils.py:649 / acados_ocp_constraints.py J_to_idx)."""
    J = np.asarray(J)
    idx = np.zeros(J.shape[0], dtype=int)
    for i in range(J.shape[0]):
        nz = np.nonzero(J[i])[0]
        if len(nz) != 1 or J[i, nz[0]] != 1:
            raise ValueError(f"J row {i} is not a unit selection row")
        idx[i] = nz[0]
    return idx


class AcadosCostConstraintEvaluator:
    """Evaluate an AcadosOcp's cost (incl. slack penalties) and constraint
    violations outside the solver (reference mpc_utils.py:43) — e.g. for
    closed-loop performance accounting with the *exact* stage cost the
    solver optimizes.

    evaluate(x, u, stage=0) -> dict with 'cost' (slack-penalized, scaled
    like the solver scales it), 'cost_without_slacks', and per-row
    'violation' of the unified constraint block.
    evaluate_ocp_cost(iterate) -> total cost of a whole trajectory
    {'x': (N+1, nx), 'u': (N, nu)}.
    """

    def __init__(self, ocp):
        from acados_tpu.interface.builder import build_ocp, data_to_jax
        ocp = copy.deepcopy(ocp)
        self._form, data_np, _ = build_ocp(ocp)
        self._data = data_to_jax(data_np, jnp.float64)
        self._N = self._form.N

        form, data = self._form, self._data

        def stage_eval(x, u, k):
            from acados_tpu.ocp_nlp.formulation import (
                cost_data_stage0, cost_data_path, cost_data_term)
            t = data.ts[k]
            is0 = k == 0
            # python-level stage classing (k is concrete here)
            if is0:
                spec, con = form.cost_0, form.con_0
                cd = cost_data_stage0(data)
                lb, ub = data.lb_0, data.ub_0
                Zl, Zu, zl, zu = data.Zl_0, data.Zu_0, data.zl_0, data.zu_0
            else:
                spec, con = form.cost, form.con
                cd = jax.tree.map(lambda a: a[k - 1], cost_data_path(data))
                lb, ub = data.lb[k - 1], data.ub[k - 1]
                Zl, Zu = data.Zl[k - 1], data.Zu[k - 1]
                zl, zu = data.zl[k - 1], data.zu[k - 1]
            p = data.p[k]
            base = spec.value(x, u, p, t, cd)
            rows = con.eval_rows(x, u, p, t)
            nrows = rows.shape[0]
            lo_v = jnp.maximum(lb[:nrows] - rows, 0.0)
            up_v = jnp.maximum(rows - ub[:nrows], 0.0)
            sm = con.soft_row_mask(rows.dtype)
            slack_cost = jnp.sum(sm * (zl[:nrows] * lo_v
                                       + 0.5 * Zl[:nrows] * lo_v ** 2
                                       + zu[:nrows] * up_v
                                       + 0.5 * Zu[:nrows] * up_v ** 2))
            scale = data.cost_scale[k]
            return {"cost_without_slacks": scale * base,
                    "cost": scale * (base + slack_cost),
                    "violation": jnp.maximum(lo_v, up_v)}

        def term_eval(x):
            from acados_tpu.ocp_nlp.formulation import cost_data_term
            t = data.ts[self._N]
            p = data.p[self._N]
            u0 = jnp.zeros((form.nu,), x.dtype)
            base = form.cost_e.value(x, u0, p, t, cost_data_term(data))
            rows = form.con_e.eval_rows(x, u0, p, t)
            nrows = rows.shape[0]
            lo_v = jnp.maximum(data.lb_e[:nrows] - rows, 0.0)
            up_v = jnp.maximum(rows - data.ub_e[:nrows], 0.0)
            sm = form.con_e.soft_row_mask(rows.dtype)
            slack_cost = jnp.sum(sm * (data.zl_e[:nrows] * lo_v
                                       + 0.5 * data.Zl_e[:nrows] * lo_v ** 2
                                       + data.zu_e[:nrows] * up_v
                                       + 0.5 * data.Zu_e[:nrows] * up_v ** 2))
            scale = data.cost_scale[self._N]
            return {"cost_without_slacks": scale * base,
                    "cost": scale * (base + slack_cost),
                    "violation": jnp.maximum(lo_v, up_v)}

        self._stage_eval = stage_eval
        self._term_eval = jax.jit(term_eval)

    def update_all(self, solver):
        """Refresh runtime data (yref/W/bounds/penalties) from a solver
        (reference: update_all(acados_solver))."""
        self._data = solver._data if hasattr(solver, "_data") else self._data

    def evaluate(self, x, u, step: int = 0) -> Dict[str, np.ndarray]:
        out = self._stage_eval(jnp.asarray(x, jnp.float64),
                               jnp.asarray(u, jnp.float64), int(step))
        return {k: np.asarray(v) for k, v in out.items()}

    def evaluate_ocp_cost(self, iterate) -> float:
        """Total trajectory cost; iterate is a dict/obj with x (N+1, nx)
        and u (N, nu) (reference evaluate_ocp_cost)."""
        xs = np.asarray(iterate["x"] if isinstance(iterate, dict)
                        else iterate.x)
        us = np.asarray(iterate["u"] if isinstance(iterate, dict)
                        else iterate.u)
        total = 0.0
        for k in range(self._N):
            total += float(self.evaluate(xs[k], us[k], k)["cost"])
        total += float(np.asarray(
            self._term_eval(jnp.asarray(xs[self._N], jnp.float64))["cost"]))
        return total


def create_model_with_cost_state(ocp) -> Tuple[object, np.ndarray]:
    """Augment the model with a cost state integrating the path cost plus
    slack penalties (reference mpc_utils.py:389).

    Returns (augmented AcadosModel, parameter_values). The augmented
    explicit dynamics is f_aug(x_aug, u, p, t) with
    x_aug = [x; cost_state], d(cost_state)/dt = path cost rate + slack
    violation penalties (l1 + quadratic), exactly the terms the solver's
    soft constraints penalize.
    """
    from acados_tpu.interface.builder import build_ocp, data_to_jax
    from acados_tpu.ocp_nlp.formulation import cost_data_path
    from acados_tpu.interface.acados_ocp import _dim_of
    from acados_tpu.sim.integrator import normalize_dynamics

    ocp2 = copy.deepcopy(ocp)
    form, data_np, _ = build_ocp(ocp2)
    data = data_to_jax(data_np, jnp.float64)
    nx = form.nx
    f = normalize_dynamics(ocp.model.f_expl_expr)
    if f is None:
        raise ValueError("create_model_with_cost_state needs f_expl_expr")

    # evaluate the *path* stage-class cost/penalties at interior-stage data
    cd = jax.tree.map(lambda a: a[0], cost_data_path(data))
    lb, ub = data.lb[0], data.ub[0]
    Zl, Zu, zl, zu = data.Zl[0], data.Zu[0], data.zl[0], data.zu[0]

    def cost_rate(x, u, p, t):
        base = form.cost.value(x, u, p, t, cd)
        rows = form.con.eval_rows(x, u, p, t)
        nr = rows.shape[0]
        sm = form.con.soft_row_mask(rows.dtype)
        lo = jnp.maximum(lb[:nr] - rows, 0.0)
        up = jnp.maximum(rows - ub[:nr], 0.0)
        pen = jnp.sum(sm * (zl[:nr] * lo + 0.5 * Zl[:nr] * lo ** 2
                            + zu[:nr] * up + 0.5 * Zu[:nr] * up ** 2))
        return base + pen

    def f_aug(x_aug, u, p, t):
        x = x_aug[:nx]
        return jnp.concatenate([f(x, u, p, t),
                                cost_rate(x, u, p, t)[None]])

    model = copy.deepcopy(ocp.model)
    model.name = (model.name or "model") + "_with_cost_state"
    model.x = nx + 1
    model.f_expl_expr = f_aug
    model.f_impl_expr = None
    pv = (np.asarray(ocp.parameter_values)
          if getattr(ocp, "parameter_values", None) is not None
          else np.zeros(_dim_of(ocp.model.p)))
    return model, pv


def detect_constraint_structure(model, constraints, stage_type: str = "path",
                                n_probe: int = 6, tol: float = 1e-9,
                                seed: int = 0):
    """Classify each nonlinear-constraint row h_i(x, u) as a pure variable
    bound, a general-linear row, or genuinely nonlinear, and move it into
    the corresponding field (reference mpc_utils.py:462 does this
    symbolically; here: randomized Jacobian-constancy probes).

    Mutates `constraints` in place: rows detected as bounds extend
    idxbx/lbx/ubx (or idxbu/lbu/ubu), rows detected linear extend C/D/lg/ug,
    the rest stay in con_h_expr. stage_type in {'initial','path','terminal'}.
    """
    from acados_tpu.interface.acados_ocp import _dim_of
    from acados_tpu.sim.integrator import normalize_dynamics

    sfx = {"initial": "_0", "path": "", "terminal": "_e"}[stage_type]
    h = getattr(model, "con_h_expr" + sfx, None)
    if h is None:
        return
    nx, nu = _dim_of(model.x), _dim_of(model.u)
    hf = normalize_dynamics(h)
    p0 = np.zeros(_dim_of(model.p))
    rng = np.random.default_rng(seed)
    jac = jax.jit(jax.jacfwd(
        lambda xu: hf(xu[:nx], xu[nx:], jnp.asarray(p0), 0.0)))
    Js = np.stack([np.asarray(jac(jnp.asarray(rng.normal(size=nx + nu))))
                   for _ in range(n_probe)])
    nh = Js.shape[1]
    row_var = np.abs(Js - Js[0]).max(axis=(0, 2))
    J0 = Js[0]
    h0 = np.asarray(hf(jnp.zeros(nx), jnp.zeros(nu), jnp.asarray(p0), 0.0))

    # moving h rows into bounds/general-linear fields shifts every row
    # index; the soft-slack index layout (idxsh/idxsg offsets over
    # nbu+nbx+ng, reference acados_ocp_constraints) would need remapping
    # alongside — refuse rather than silently slack the wrong rows
    for sname in ("idxsh" + sfx, "idxsg" + sfx):
        sidx = getattr(constraints, sname, None)
        if sidx is not None and np.asarray(sidx).size:
            raise NotImplementedError(
                f"detect_constraint_structure does not remap soft-slack "
                f"indices ({sname} is non-empty); detect before softening "
                f"or keep the rows in h")

    lh = np.atleast_1d(np.asarray(getattr(constraints, "lh" + sfx)))
    uh = np.atleast_1d(np.asarray(getattr(constraints, "uh" + sfx)))

    keep, bx, bu, lin = [], [], [], []
    for i in range(nh):
        if row_var[i] > tol:
            keep.append(i)
            continue
        nz = np.nonzero(np.abs(J0[i]) > tol)[0]
        if len(nz) == 1 and abs(J0[i, nz[0]] - 1.0) < tol \
                and abs(h0[i]) < tol:
            (bx if nz[0] < nx else bu).append(i)
        else:
            lin.append(i)

    def _append(name, arr):
        old = getattr(constraints, name, None)
        if old is None or (hasattr(old, "size") and np.asarray(old).size == 0):
            setattr(constraints, name, np.asarray(arr))
        else:
            setattr(constraints, name,
                    np.concatenate([np.atleast_1d(np.asarray(old)),
                                    np.atleast_1d(np.asarray(arr))]))

    for i in bx:
        _append("idxbx" + sfx, [int(np.nonzero(np.abs(J0[i]) > tol)[0][0])])
        _append("lbx" + sfx, [lh[i]])
        _append("ubx" + sfx, [uh[i]])
    if stage_type != "terminal":
        for i in bu:
            _append("idxbu" + sfx,
                    [int(np.nonzero(np.abs(J0[i]) > tol)[0][0]) - nx])
            _append("lbu" + sfx, [lh[i]])
            _append("ubu" + sfx, [uh[i]])
    else:
        keep = sorted(keep + bu)
    if lin:
        Cn = J0[lin][:, :nx]
        Dn = J0[lin][:, nx:]
        Cold = getattr(constraints, "C" + sfx, None)
        if Cold is None or np.asarray(Cold).size == 0:
            setattr(constraints, "C" + sfx, Cn)
            if stage_type != "terminal":
                setattr(constraints, "D" + sfx, Dn)
        else:
            setattr(constraints, "C" + sfx, np.vstack([np.asarray(Cold), Cn]))
            if stage_type != "terminal":
                setattr(constraints, "D" + sfx,
                        np.vstack([np.atleast_2d(getattr(constraints,
                                                         "D" + sfx)), Dn]))
        _append("lg" + sfx, lh[lin] - h0[lin])
        _append("ug" + sfx, uh[lin] - h0[lin])

    if keep:
        keep_j = jnp.asarray(np.asarray(keep, dtype=int))

        def h_kept(x, u, p=None, t=None):
            return hf(x, u,
                      p if p is not None else jnp.zeros_like(jnp.asarray(p0)),
                      0.0 if t is None else t)[keep_j]

        setattr(model, "con_h_expr" + sfx, h_kept)
        setattr(constraints, "lh" + sfx, lh[np.asarray(keep)])
        setattr(constraints, "uh" + sfx, uh[np.asarray(keep)])
    else:
        setattr(model, "con_h_expr" + sfx, None)
        setattr(constraints, "lh" + sfx, None)
        setattr(constraints, "uh" + sfx, None)


def create_ocp_with_control_horizon(ocp, Nc: int, Nr: int = None):
    """Move-blocking: Nc shooting intervals with free controls, then the
    last applied control held constant over Nr remaining intervals
    (reference mpc_utils.py:665). Returns an AcadosMultiphaseOcp with
    phases [original x Nc, transition x 1, held-control x Nr]; the
    transition stage's control is the decision variable that is frozen.

    Supports ERK/DISCRETE dynamics and NONLINEAR_LS / LINEAR_LS /
    EXTERNAL path costs.
    """
    import jax.numpy as jnp
    from acados_tpu.interface.acados_ocp import (AcadosModel, AcadosOcp,
                                                 _dim_of)
    from acados_tpu.interface.multiphase import AcadosMultiphaseOcp
    from acados_tpu.sim.integrator import normalize_dynamics

    so = ocp.solver_options
    Np = so.N_horizon
    if Nr is None:
        Nr = Np - Nc
    if Nc == Np or Nr == 0:
        return copy.deepcopy(ocp)
    if Nc > Np:
        raise ValueError("control horizon cannot exceed prediction horizon")
    if Nc <= 0:
        raise ValueError("control horizon must be at least 1")
    if so.integrator_type not in ("ERK", "DISCRETE"):
        raise NotImplementedError(
            f"create_ocp_with_control_horizon: {so.integrator_type}")

    nx, nu = _dim_of(ocp.model.x), _dim_of(ocp.model.u)
    Ts = float(so.tf) / Np

    ph0 = copy.deepcopy(ocp)

    # transition: x -> [x; u], the stage control becomes the held value
    ph1 = AcadosOcp()
    m1 = AcadosModel()
    m1.name = (ocp.model.name or "model") + "_trns"
    m1.x, m1.u = nx, nu
    m1.disc_dyn_expr = lambda x, u: jnp.concatenate([x, u])
    ph1.model = m1
    ph1.cost.cost_type = "NONLINEAR_LS"
    m1.cost_y_expr = lambda x, u: u
    ph1.cost.W = np.zeros((nu, nu))  # cost-less stage (reference: no ref)
    ph1.cost.yref = np.zeros(nu)
    for f in ("lbu", "ubu", "idxbu"):
        setattr(ph1.constraints, f,
                copy.deepcopy(getattr(ocp.constraints, f)))

    # held-control phase: x_aug = [x; u], no controls
    ph2 = AcadosOcp()
    m2 = AcadosModel()
    m2.name = (ocp.model.name or "model") + "_held"
    m2.x, m2.u = nx + nu, 0
    if so.integrator_type == "ERK":
        f0 = normalize_dynamics(ocp.model.f_expl_expr)
        m2.f_expl_expr = lambda x, u, p, t: jnp.concatenate(
            [f0(x[:nx], x[nx:], p, t), jnp.zeros((nu,), x.dtype)])
    else:
        d0 = normalize_dynamics(ocp.model.disc_dyn_expr)
        m2.disc_dyn_expr = lambda x, u, p, t: jnp.concatenate(
            [d0(x[:nx], x[nx:], p, t), x[nx:]])
    ph2.model = m2
    ct = ocp.cost.cost_type
    ph2.cost.cost_type = "NONLINEAR_LS" if ct == "LINEAR_LS" else ct
    if ct == "NONLINEAR_LS":
        y0 = ocp.model.cost_y_expr
        m2.cost_y_expr = lambda x, u: y0(x[:nx], x[nx:])
        ph2.cost.W = copy.deepcopy(ocp.cost.W)
        ph2.cost.yref = copy.deepcopy(ocp.cost.yref)
    elif ct == "LINEAR_LS":
        Vx, Vu = np.asarray(ocp.cost.Vx), np.asarray(ocp.cost.Vu)
        Vaug = np.hstack([Vx, Vu])
        m2.cost_y_expr = lambda x, u: jnp.asarray(Vaug, x.dtype) @ x
        ph2.cost.W = copy.deepcopy(ocp.cost.W)
        ph2.cost.yref = copy.deepcopy(ocp.cost.yref)
    elif ct == "EXTERNAL":
        e0 = ocp.model.cost_expr_ext_cost
        m2.cost_expr_ext_cost = lambda x, u: e0(x[:nx], x[nx:])
    else:
        raise NotImplementedError(f"cost_type {ct}")
    # terminal cost from the original OCP
    ph2.cost.cost_type_e = ocp.cost.cost_type_e
    if ocp.cost.cost_type_e == "NONLINEAR_LS":
        ye = ocp.model.cost_y_expr_e
        m2.cost_y_expr_e = lambda x: ye(x[:nx])
        ph2.cost.W_e = copy.deepcopy(ocp.cost.W_e)
        ph2.cost.yref_e = copy.deepcopy(ocp.cost.yref_e)
    elif ocp.cost.cost_type_e == "LINEAR_LS":
        Vxe = np.asarray(ocp.cost.Vx_e)
        Vxe_aug = np.hstack([Vxe, np.zeros((Vxe.shape[0], nu))])
        ph2.cost.cost_type_e = "NONLINEAR_LS"
        m2.cost_y_expr_e = lambda x: jnp.asarray(Vxe_aug, x.dtype) @ x
        ph2.cost.W_e = copy.deepcopy(ocp.cost.W_e)
        ph2.cost.yref_e = copy.deepcopy(ocp.cost.yref_e)
    elif ocp.cost.cost_type_e == "EXTERNAL":
        ee = ocp.model.cost_expr_ext_cost_e
        m2.cost_expr_ext_cost_e = lambda x: ee(x[:nx])
    elif ocp.cost.cost_type_e is not None:
        raise NotImplementedError(
            f"cost_type_e {ocp.cost.cost_type_e} for control horizon")
    # state bounds carry over; held control keeps its bounds as state rows
    con0 = ocp.constraints
    if con0.idxbx is not None and np.asarray(con0.idxbx).size:
        ph2.constraints.idxbx = np.asarray(con0.idxbx)
        ph2.constraints.lbx = copy.deepcopy(con0.lbx)
        ph2.constraints.ubx = copy.deepcopy(con0.ubx)

    mocp = AcadosMultiphaseOcp([Nc, 1, Nr])
    mocp.set_phase(ph0, 0)
    mocp.set_phase(ph1, 1)
    mocp.set_phase(ph2, 2)
    mocp.solver_options = copy.deepcopy(so)
    mocp.solver_options.N_horizon = None
    mocp.solver_options.tf = float(so.tf) + 1.0
    mocp.solver_options.time_steps = np.array(
        Nc * [Ts] + [1.0] + Nr * [Ts])
    mocp.mocp_opts.integrator_type = [so.integrator_type, "DISCRETE",
                                      so.integrator_type]
    return mocp
