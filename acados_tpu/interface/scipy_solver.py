"""Independent cross-check solver on scipy (general-purpose NLP).

TPU-native counterpart of the reference's AcadosCasadiOcpSolver
(/root/reference/interfaces/acados_template/acados_template/
acados_casadi_ocp_solver.py:41-398): transcribe the SAME AcadosOcp into a
generic dense NLP and hand it to an independent solver (there: IPOPT via
CasADi; here: scipy.optimize SLSQP with jax-AD gradients/Jacobians) — the
cross-implementation parity oracle of the reference test suite
(casadi_tests workflow, SURVEY.md §4.2).

Not a production path: dense, single-instance, CPU. Use it to validate
the structure-exploiting solvers on small problems.
"""
from __future__ import annotations

import numpy as np
from scipy import optimize

import jax
import jax.numpy as jnp

from acados_tpu.interface.acados_ocp import AcadosOcp
from acados_tpu.interface.builder import build_ocp, data_to_jax
from acados_tpu.ocp_nlp.linearize import (build_static_rows,
                                          eval_constraints, eval_cost,
                                          eval_dyn_gap)


class AcadosScipyOcpSolver:
    """Drop-in cross-check solver: same AcadosOcp in, independent
    optimizer underneath. Soft constraints are treated as hard (the
    oracle solves the idealized problem)."""

    def __init__(self, ocp: AcadosOcp, tol=1e-9, maxiter=500):
        self.acados_ocp = ocp
        self.form, self._data, self.layouts = build_ocp(ocp)
        self.tol = tol
        self.maxiter = maxiter
        self.N = self.form.N
        self._x = None
        self._u = None

        form = self.form
        N, nx, nu = form.N, form.nx, form.nu
        data = data_to_jax(self._data, jnp.float64)
        mask = np.asarray(build_static_rows(form, jnp.float64)["mask"])

        def unpack(w):
            x = w[:(N + 1) * nx].reshape(N + 1, nx)
            u = w[(N + 1) * nx:].reshape(N, nu)
            return x, u

        zero_soft = jnp.zeros(((N + 1), form.nc))

        def f_obj(w):
            x, u = unpack(w)
            return eval_cost(form, data, x, u, zero_soft, zero_soft,
                             jnp.zeros_like(zero_soft))

        def f_dyn(w):
            x, u = unpack(w)
            return eval_dyn_gap(form, data, x, u).reshape(-1)

        def f_rows(w):
            x, u = unpack(w)
            return eval_constraints(form, data, x, u)

        self._f_obj = jax.jit(f_obj)
        self._g_obj = jax.jit(jax.grad(f_obj))
        self._f_dyn = jax.jit(f_dyn)
        self._J_dyn = jax.jit(jax.jacfwd(f_dyn))
        self._f_rows = jax.jit(f_rows)
        self._J_rows = jax.jit(jax.jacfwd(f_rows))

        lb_all = np.concatenate([self._data["lb_0"][None],
                                 self._data["lb"],
                                 self._data["lb_e"][None]])
        ub_all = np.concatenate([self._data["ub_0"][None],
                                 self._data["ub"],
                                 self._data["ub_e"][None]])
        inf_thr = 0.5e10
        self._rows_l = (mask > 0) & (lb_all > -inf_thr)
        self._rows_u = (mask > 0) & (ub_all < inf_thr)
        self._lb = lb_all
        self._ub = ub_all

    def solve(self, x_init=None, u_init=None) -> int:
        form = self.form
        N, nx, nu = form.N, form.nx, form.nu
        x0 = np.zeros((N + 1, nx)) if x_init is None else \
            np.asarray(x_init, np.float64)
        u0 = np.zeros((N, nu)) if u_init is None else \
            np.asarray(u_init, np.float64)
        w0 = np.concatenate([x0.reshape(-1), u0.reshape(-1)])

        rl, ru = self._rows_l, self._rows_u

        def ineq(w):
            g = np.asarray(self._f_rows(w))
            return np.concatenate([(g - self._lb)[rl],
                                   (self._ub - g)[ru]])

        def ineq_jac(w):
            J = np.asarray(self._J_rows(w))
            return np.concatenate([J[rl], -J[ru]])

        res = optimize.minimize(
            lambda w: float(self._f_obj(w)), w0,
            jac=lambda w: np.asarray(self._g_obj(w)),
            constraints=[
                dict(type="eq", fun=lambda w: np.asarray(self._f_dyn(w)),
                     jac=lambda w: np.asarray(self._J_dyn(w))),
                dict(type="ineq", fun=ineq, jac=ineq_jac),
            ],
            method="SLSQP",
            options=dict(maxiter=self.maxiter, ftol=self.tol))
        w = res.x
        self._x = w[:(N + 1) * nx].reshape(N + 1, nx)
        self._u = w[(N + 1) * nx:].reshape(N, nu)
        self._result = res
        return 0 if res.success else 2

    def get(self, stage: int, field: str):
        if field == "x":
            return self._x[stage].copy()
        if field == "u":
            return self._u[stage].copy()
        raise ValueError(field)

    def get_cost(self) -> float:
        return float(self._result.fun)
