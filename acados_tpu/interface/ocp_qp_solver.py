"""Standalone OCP-QP description + solver interface (no NLP wrapper).

Counterpart of the reference QP-only Python surface
(/root/reference/interfaces/acados_template/acados_template/acados_ocp_qp.py:
23 AcadosOcpQp with per-stage list fields, and acados_ocp_qp_solver.py):
describe a linear-quadratic OCP directly — Q/R/S/q/r, A/B/b, bounds,
general-linear rows, soft slacks — and solve it with any registered QP
backend (Riccati IPM, condensed variants, ADMM) without going through
AcadosOcp/SQP.

Reference stores one list entry per stage (HPIPM's colmaj setters); here
set(stage, field) fills dense stage-stacked arrays, the TPU-native QP data
model (`ocp_qp/data.py`), and `solve()` runs jitted.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from acados_tpu.ocp_qp.data import OcpQp, OcpQpDims, zero_qp
from acados_tpu.ocp_qp.ipm import (IpmOpts, solve_ocp_qp,
                                   solve_ocp_qp_sens_adj,
                                   solve_ocp_qp_sens_frw)
from acados_tpu.ocp_qp.registry import get_qp_backend


class AcadosOcpQp:
    """Mutable QP description with per-stage set() (reference
    acados_ocp_qp.py:23). Fields follow the unified-row data model:
    box bounds and general rows both live in (C, D, lg, ug) — use
    `add_bounds_rows` / `set` on C/D to populate them."""

    def __init__(self, N: int, nx: int, nu: int, nc: int = 0,
                 dtype=jnp.float64):
        self.dims = OcpQpDims(N=N, nx=nx, nu=nu, nc=max(nc, 1))
        self._qp = zero_qp(self.dims, dtype)
        self._dtype = dtype

    # ---- field access -----------------------------------------------------
    _STAGE_FIELDS = {"Q": "Q", "R": "R", "S": "S", "q": "q", "r": "r",
                     "A": "A", "B": "B", "b": "b", "C": "C", "D": "D",
                     "lg": "lg", "ug": "ug", "Zl": "Zl", "Zu": "Zu",
                     "zl": "zl", "zu": "zu", "mask_l": "mask_l",
                     "mask_u": "mask_u", "soft_mask": "soft_mask"}

    def set(self, stage: int, field: str, value):
        if field not in self._STAGE_FIELDS:
            raise ValueError(f"unknown QP field {field}")
        arr = getattr(self._qp, field)
        v = jnp.asarray(np.asarray(value, np.float64), arr.dtype)
        padded = jnp.zeros(arr.shape[1:], arr.dtype)
        sl = tuple(slice(0, s) for s in v.shape)
        padded = padded.at[sl].set(v)
        # pytree dataclasses are frozen; rebuild via replace
        self._qp = self._qp.replace(**{field: arr.at[stage].set(padded)})

    def get(self, stage: int, field: str):
        if field not in self._STAGE_FIELDS:
            raise ValueError(f"unknown QP field {field}")
        return np.asarray(getattr(self._qp, field)[stage])

    @property
    def qp(self) -> OcpQp:
        return self._qp


class AcadosOcpQpSolver:
    """Solve an AcadosOcpQp with a registered backend (reference
    acados_ocp_qp_solver.py; backend enum ocp_qp_interface.h:60-106)."""

    def __init__(self, qp: AcadosOcpQp, solver: str = "RICCATI_IPM",
                 opts: Optional[IpmOpts] = None, cond_N: Optional[int] = None):
        self.qp_desc = qp
        self.opts = opts or IpmOpts()
        self.cond_N = cond_N
        self._backend_name = solver
        if solver == "RICCATI_IPM" and cond_N is None:
            self._solve = jax.jit(
                lambda q: solve_ocp_qp(q, self.opts))
        else:
            backend = get_qp_backend(solver)
            if cond_N is not None:
                from acados_tpu.ocp_qp.xcond import solve_ocp_qp_xcond
                self._solve = jax.jit(lambda q: solve_ocp_qp_xcond(
                    q, self.opts, cond_N=cond_N, backend=backend))
            else:
                self._solve = jax.jit(lambda q: backend(q, self.opts))
        self.sol = None
        self.info = None

    def solve(self) -> int:
        sol, info = self._solve(self.qp_desc.qp)
        self.sol, self.info = jax.block_until_ready((sol, info))
        return int(np.asarray(self.info.status))

    def get(self, stage: int, field: str):
        if self.sol is None:
            raise RuntimeError("call solve() first")
        if field in ("x", "u", "pi", "lam_lg", "lam_ug", "sl", "su"):
            return np.asarray(getattr(self.sol, field)[stage])
        raise ValueError(field)

    def get_stats(self, field: str):
        if self.info is None:
            raise RuntimeError("call solve() first")
        return np.asarray(getattr(self.info, field))

    # ---- QP solution sensitivities (HPIPM sens_frw/adj analogs) ----------
    def eval_sens_forw(self, d_qp: OcpQp):
        """Forward sensitivity in data direction d_qp
        (reference ocp_qp_hpipm.c:489)."""
        return solve_ocp_qp_sens_frw(self.qp_desc.qp, self.sol, d_qp,
                                     self.opts)

    def eval_sens_adj(self, seed_x, seed_u):
        """Adjoint sensitivity for solution seed
        (reference ocp_qp_hpipm.c:503)."""
        return solve_ocp_qp_sens_adj(self.qp_desc.qp, self.sol,
                                     jnp.asarray(seed_x),
                                     jnp.asarray(seed_u), self.opts)
