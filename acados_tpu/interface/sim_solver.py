"""AcadosSim / AcadosSimSolver: standalone integrator interface.

API mirror of the reference (acados_sim.py, acados_sim_solver.py:348 —
`simulate(x, u, p)` plus set/get of seeds and sensitivity options), backed
by the jax integrators in acados_tpu.sim instead of a generated C capsule.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from acados_tpu.interface.acados_ocp import AcadosModel, _dim_of
from acados_tpu.sim.integrator import SimOpts, make_step_fn, simulate


@dataclasses.dataclass
class AcadosSimOpts:
    """Reference: acados_sim.py sim options."""

    T: Optional[float] = None
    integrator_type: str = "ERK"
    num_stages: int = 4
    num_steps: int = 1
    newton_iter: int = 3
    collocation_type: str = "GAUSS_LEGENDRE"
    sens_forw: bool = True
    sens_adj: bool = False
    sens_hess: bool = False
    dtype: str = "float64"


@dataclasses.dataclass
class AcadosSim:
    model: AcadosModel = dataclasses.field(default_factory=AcadosModel)
    solver_options: AcadosSimOpts = dataclasses.field(
        default_factory=AcadosSimOpts)
    parameter_values: Optional[np.ndarray] = None


class AcadosSimSolver:
    """Reference: acados_sim_solver.py. simulate() returns x_next; the full
    sim_out surface (S_forw/S_adj/S_hess/zn) is reachable via get()."""

    def __init__(self, sim: AcadosSim, json_file=None, build=None,
                 generate=None, verbose=False):
        del json_file, build, generate, verbose
        self.acados_sim = sim
        so = sim.solver_options
        self.nx = _dim_of(sim.model.x)
        self.nu = _dim_of(sim.model.u)
        self.nz = _dim_of(sim.model.z)
        self.np = _dim_of(sim.model.p)
        self.dtype = jnp.float64 if so.dtype == "float64" else jnp.float32
        self.T = float(so.T)
        self._step = make_step_fn(
            f_expl=sim.model.f_expl_expr, f_impl=sim.model.f_impl_expr,
            nx=self.nx, nz=self.nz,
            opts=SimOpts(integrator_type=so.integrator_type,
                         num_stages=so.num_stages, num_steps=so.num_steps,
                         newton_iter=so.newton_iter,
                         collocation_type=so.collocation_type))
        self._p = np.zeros(self.np) if sim.parameter_values is None \
            else np.asarray(sim.parameter_values, np.float64)
        self._seed_adj = np.zeros(self.nx)
        self._out = None
        self._x = np.zeros(self.nx)
        self._u = np.zeros(self.nu)

        so_ = so

        def run(x, u, p, seed_adj):
            return simulate(self._step, x, u, p, t0=0.0, dt=self.T,
                            seed_adj=seed_adj, sens_forw=so_.sens_forw,
                            sens_adj=so_.sens_adj, sens_hess=so_.sens_hess,
                            nz=self.nz)

        self._run = jax.jit(run)

    def set(self, field: str, value):
        value = np.atleast_1d(np.asarray(value, np.float64))
        if field == "x":
            self._x = value
        elif field == "u":
            self._u = value
        elif field == "p":
            self._p = value
        elif field == "seed_adj":
            self._seed_adj = value
        elif field == "T":
            self.T = float(value[0])
        else:
            raise ValueError(field)

    def solve(self) -> int:
        self._out = jax.block_until_ready(self._run(
            jnp.asarray(self._x, self.dtype),
            jnp.asarray(self._u, self.dtype),
            jnp.asarray(self._p, self.dtype),
            jnp.asarray(self._seed_adj, self.dtype)))
        return 0

    def get(self, field: str):
        if self._out is None:
            raise RuntimeError("call solve()/simulate() first")
        if field == "x" or field == "xn":
            return np.asarray(self._out.xn)
        if field == "S_forw":
            return np.asarray(self._out.S_forw)
        if field == "Sx":
            return np.asarray(self._out.S_forw)[:, :self.nx]
        if field == "Su":
            return np.asarray(self._out.S_forw)[:, self.nx:]
        if field == "S_adj":
            return np.asarray(self._out.S_adj)
        if field == "S_hess":
            return np.asarray(self._out.S_hess)
        if field == "z" or field == "zn":
            return np.asarray(self._out.zn)
        raise ValueError(field)

    def simulate(self, x=None, u=None, p=None, xdot=None, z=None):
        """Reference: acados_sim_solver.py simulate() convenience."""
        del xdot, z
        if x is not None:
            self.set("x", x)
        if u is not None:
            self.set("u", u)
        if p is not None:
            self.set("p", p)
        status = self.solve()
        if status != 0:
            raise RuntimeError(f"sim solver status {status}")
        return self.get("xn")
