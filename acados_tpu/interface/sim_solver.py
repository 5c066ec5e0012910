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
        self._p = np.zeros(self.np) if sim.parameter_values is None \
            else np.asarray(sim.parameter_values, np.float64)
        self._lifted_K = None
        if so.integrator_type == "LIFTED_IRK":
            # lifted stage variables live in solver memory across calls
            # (reference sim_lifted_irk_memory, sim_lifted_irk_integrator.c)
            from acados_tpu.sim.integrator import \
                normalize_implicit_dynamics, normalize_dynamics
            from acados_tpu.sim.irk import implicit_from_explicit
            from acados_tpu.sim.lifted_irk import make_lifted_irk_step
            if sim.model.f_impl_expr is not None:
                fi = normalize_implicit_dynamics(sim.model.f_impl_expr)
            else:
                fi = implicit_from_explicit(
                    normalize_dynamics(sim.model.f_expl_expr))
            lstep, K0 = make_lifted_irk_step(
                fi, nx=self.nx, nz=self.nz, num_stages=so.num_stages,
                num_steps=so.num_steps, newton_iter=1,
                collocation=so.collocation_type)
            self._lifted_K = jnp.asarray(K0, self.dtype)
            self._lstep = lstep
            self._step = None
        else:
            self._step = make_step_fn(
                f_expl=sim.model.f_expl_expr, f_impl=sim.model.f_impl_expr,
                nx=self.nx, nu=self.nu, nz=self.nz,
                p=self._p,
                opts=SimOpts(integrator_type=so.integrator_type,
                             num_stages=so.num_stages,
                             num_steps=so.num_steps,
                             newton_iter=so.newton_iter,
                             collocation_type=so.collocation_type))
        self._seed_adj = np.zeros(self.nx)
        self._out = None
        self._x = np.zeros(self.nx)
        self._u = np.zeros(self.nu)

        so_ = so

        if self._lifted_K is not None:
            # lifted state K is an explicit argument so the jitted program
            # sees fresh stage values each call (functional solver memory)
            def run_lifted(x, u, p, seed_adj, K):
                def stepK(xx, uu, pp, t0, dt):
                    xn, _ = self._lstep(xx, uu, pp, t0, dt, K)
                    return xn
                out = simulate(stepK, x, u, p, t0=0.0, dt=self.T,
                               seed_adj=seed_adj, sens_forw=so_.sens_forw,
                               sens_adj=so_.sens_adj,
                               sens_hess=so_.sens_hess, nz=self.nz)
                _, K_next = self._lstep(x, u, p, 0.0, self.T, K)
                return out, K_next

            self._run_lifted = jax.jit(run_lifted)
            self._run = None
        else:
            def run(x, u, p, seed_adj):
                return simulate(self._step, x, u, p, t0=0.0, dt=self.T,
                                seed_adj=seed_adj, sens_forw=so_.sens_forw,
                                sens_adj=so_.sens_adj,
                                sens_hess=so_.sens_hess, nz=self.nz)

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
        args = (jnp.asarray(self._x, self.dtype),
                jnp.asarray(self._u, self.dtype),
                jnp.asarray(self._p, self.dtype),
                jnp.asarray(self._seed_adj, self.dtype))
        if self._lifted_K is not None:
            out, K_next = self._run_lifted(*args, self._lifted_K)
            self._out = jax.block_until_ready(out)
            self._lifted_K = K_next
        else:
            self._out = jax.block_until_ready(self._run(*args))
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


class AcadosSimBatchSolver:
    """Batched standalone integrator (reference AcadosSimBatchSolver,
    acados_sim_batch_solver.py: N_batch capsules + OpenMP parallel-for).

    TPU-native inversion: ONE vmapped+jitted step over the batch axis —
    no per-instance capsules, one XLA program; shard the batch over a
    device mesh for multi-chip (parallel/mesh.py).
    """

    def __init__(self, sim: AcadosSim, N_batch: int,
                 num_threads_in_batch_solve: int = None):
        del num_threads_in_batch_solve  # OpenMP knob has no TPU analog
        if N_batch < 1:
            raise ValueError("N_batch must be positive")
        self.N_batch = N_batch
        self._one = AcadosSimSolver(sim)
        so = sim.solver_options
        if so.integrator_type == "LIFTED_IRK":
            raise NotImplementedError(
                "batched lifted IRK: vmap make_lifted_irk_step directly")
        self.nx, self.nu, self.np = self._one.nx, self._one.nu, self._one.np
        self.dtype = self._one.dtype
        step = self._one._step
        T = self._one.T
        sens_forw = so.sens_forw

        def one(x, u, p):
            return simulate(step, x, u, p, t0=0.0, dt=T,
                            sens_forw=sens_forw, nz=self._one.nz)

        self._run = jax.jit(jax.vmap(one))
        self._out = None

    def simulate(self, x, u, p=None):
        """x: (N_batch, nx), u: (N_batch, nu) -> xn (N_batch, nx)."""
        x = jnp.asarray(np.atleast_2d(x), self.dtype)
        u = jnp.asarray(np.atleast_2d(u), self.dtype)
        if p is None:
            p = jnp.zeros((x.shape[0], self.np), self.dtype)
        else:
            p = jnp.asarray(np.atleast_2d(p), self.dtype)
        self._out = jax.block_until_ready(self._run(x, u, p))
        return np.asarray(self._out.xn)

    def get(self, field: str):
        if self._out is None:
            raise RuntimeError("call simulate() first")
        if field in ("x", "xn"):
            return np.asarray(self._out.xn)
        if field == "S_forw":
            return np.asarray(self._out.S_forw)
        raise ValueError(field)

    @property
    def sim_solvers(self):
        """Reference API parity: list-like access; here the batch is one
        program, so expose the prototype solver only."""
        return [self._one]
