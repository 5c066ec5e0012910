"""Integrator factory + standalone simulation with sensitivities.

Counterpart of the reference sim layer front-end (`sim_config` vtable,
/root/reference/acados/sim/sim_common.h:162-196, and the standalone
AcadosSimSolver path, acados_sim_solver.py:348): builds a one-interval step
function from model + options, and evaluates the reference's `sim_out`
surface (xn, S_forw, S_adj, S_hess, zn — sim_common.h:102-117) via jax AD on
the step map instead of CasADi VDE/adjoint/Hessian external functions.
"""
from __future__ import annotations

import inspect

import jax
import jax.numpy as jnp

from acados_tpu.sim.erk import make_erk_step
from acados_tpu.sim.irk import implicit_from_explicit, make_irk_step
from acados_tpu.utils.struct import pytree_dataclass, static_field


def normalize_dynamics(f):
    """Accept f(x, u), f(x, u, p) or f(x, u, p, t); return f(x, u, p, t)."""
    if f is None:
        return None
    nargs = len(inspect.signature(f).parameters)
    if nargs == 2:
        return lambda x, u, p, t: f(x, u)
    if nargs == 3:
        return lambda x, u, p, t: f(x, u, p)
    if nargs == 4:
        return f
    raise ValueError("dynamics must take (x,u[,p[,t]])")


def normalize_implicit_dynamics(f):
    """Accept f(xdot, x, z, u[, p[, t]]); return f(xdot, x, z, u, p, t)."""
    if f is None:
        return None
    nargs = len(inspect.signature(f).parameters)
    if nargs == 4:
        return lambda xd, x, z, u, p, t: f(xd, x, z, u)
    if nargs == 5:
        return lambda xd, x, z, u, p, t: f(xd, x, z, u, p)
    if nargs == 6:
        return f
    raise ValueError("implicit dynamics must take (xdot,x,z,u[,p[,t]])")


@pytree_dataclass
class SimOpts:
    """Integrator options (reference sim opts: sim_common.h:120-158 —
    ns stages, num_steps, newton_iter, collocation_type)."""

    integrator_type: str = static_field(default="ERK")
    # ERK | IRK | GNSF | LIFTED_IRK (sim_interface.h:43-49)
    num_stages: int = static_field(default=4)
    num_steps: int = static_field(default=1)
    newton_iter: int = static_field(default=3)
    collocation_type: str = static_field(default="GAUSS_LEGENDRE")


def make_step_fn(f_expl=None, f_impl=None, nx=None, nz=0,
                 opts: SimOpts = None, nu=None, p=None):
    """Build step(x, u, p, t0, dt) -> x_next (ODE) from model functions.

    For IRK with nz > 0 the step returns only x_next; use `make_dae_step_fn`
    to also get z.
    """
    opts = opts or SimOpts()
    if opts.integrator_type == "ERK":
        if f_expl is None:
            raise ValueError("ERK requires explicit dynamics f_expl")
        return make_erk_step(normalize_dynamics(f_expl),
                             num_stages=opts.num_stages,
                             num_steps=opts.num_steps)
    elif opts.integrator_type == "IRK":
        if f_impl is not None:
            fi = normalize_implicit_dynamics(f_impl)
        else:
            fi = implicit_from_explicit(normalize_dynamics(f_expl))
        ns = opts.num_stages if opts.integrator_type == "IRK" else 3
        irk = make_irk_step(fi, nx=nx, nz=nz, num_stages=ns,
                            num_steps=opts.num_steps,
                            newton_iter=opts.newton_iter,
                            collocation=opts.collocation_type)
        if nz == 0:
            return lambda x, u, p, t0, dt: irk(x, u, p, t0, dt)[0]
        return irk
    elif opts.integrator_type == "GNSF":
        # structure-exploiting collocation (reference sim_gnsf.c:2160);
        # numeric structure detection replaces the reference's symbolic
        # gnsf.py:758 pass. Falls back to IRK when no structure is found
        # (reference errors out instead; fallback is strictly safer).
        from acados_tpu.sim.gnsf import make_gnsf_step_from_ode
        if f_expl is None:
            raise ValueError("GNSF requires explicit dynamics f_expl")
        if nu is None:
            raise ValueError("GNSF structure detection needs nu")
        fe = normalize_dynamics(f_expl)
        gstep = make_gnsf_step_from_ode(
            fe, nx=nx, nu=nu, p=p, num_stages=opts.num_stages,
            num_steps=opts.num_steps, newton_iter=max(opts.newton_iter, 3))
        if gstep is None:
            return make_step_fn(f_expl=f_expl, nx=nx, nz=nz,
                                opts=SimOpts(integrator_type="IRK",
                                             num_stages=opts.num_stages,
                                             num_steps=opts.num_steps,
                                             newton_iter=opts.newton_iter))
        if nz == 0:
            return lambda x, u, p, t0, dt: gstep(x, u, p, t0, dt)[0]
        return gstep
    elif opts.integrator_type == "LIFTED_IRK":
        raise ValueError(
            "LIFTED_IRK carries stage memory across calls; use "
            "sim.lifted_irk.make_lifted_irk_step (functional lifted state) "
            "or AcadosSimSolver(integrator_type='LIFTED_IRK') which holds "
            "the lifted variables between simulate() calls")
    raise ValueError(f"unknown integrator_type {opts.integrator_type}")


def make_step_jac_fn(f_expl=None, f_impl=None, nx=None, nz=0,
                     opts: SimOpts = None, jac_reuse: bool = False,
                     nu=None):
    # nu: accepted for API symmetry with make_step_fn (unused)
    """Build step_jac(x, u, p, t0, dt) -> (x_next, A, B) — the fused
    step + forward-sensitivity evaluation the SQP linearization uses
    (reference: sim call packing S_forw into BAbt,
    ocp_nlp_dynamics_cont.c:842-851).

    Returns None for integrator types without a dedicated fast path
    (the caller then falls back to `jax.jacfwd` of the plain step).
    """
    opts = opts or SimOpts()
    # NOTE: an explicit forward-VDE fast path for ERK (hand-written
    # sensitivity recursion through ops.smallmm) was built and measured
    # in round 4: it is SLOWER than jax.jacfwd of the step (XLA fuses
    # the outer-jacfwd program better than per-stage model AD), so ERK
    # keeps the jacfwd fallback. IRK keeps its fused path below — there
    # the win comes from sharing ONE stage factorization across all
    # sensitivity columns, which jacfwd cannot do.
    if opts.integrator_type in ("IRK", "LIFTED_IRK"):
        if f_impl is not None:
            fi = normalize_implicit_dynamics(f_impl)
            explicit_ode = False
        else:
            fi = implicit_from_explicit(normalize_dynamics(f_expl))
            explicit_ode = True
        from acados_tpu.sim.irk import make_irk_step_jac
        return make_irk_step_jac(
            fi, nx=nx, nz=nz, num_stages=opts.num_stages,
            num_steps=opts.num_steps, newton_iter=opts.newton_iter,
            collocation=opts.collocation_type, jac_reuse=jac_reuse,
            explicit_ode=explicit_ode)
    return None


@pytree_dataclass
class SimOut:
    """Mirrors reference sim_out (sim_common.h:102-117)."""

    xn: jnp.ndarray       # (nx,)
    S_forw: jnp.ndarray   # (nx, nx+nu) forward sensitivities [dx/dx0, dx/du]
    S_adj: jnp.ndarray    # (nx+nu,)    adjoint seed' * S_forw
    S_hess: jnp.ndarray   # (nx+nu, nx+nu) second-order adjoint sensitivity
    zn: jnp.ndarray       # (nz,)


def simulate(step, x, u, p=None, t0=0.0, dt=1.0, seed_adj=None,
             sens_forw=True, sens_adj=False, sens_hess=False, nz=0):
    """One integration interval + requested sensitivities (reference
    sim_in seeds: sim_common.h:71-88; opts sens_*: sim_common.h:129-133)."""
    if p is None:
        p = jnp.zeros((0,), x.dtype)
    nx, nu = x.shape[-1], u.shape[-1]

    def fwd(xu):
        xx, uu = xu[:nx], xu[nx:]
        out = step(xx, uu, p, t0, dt)
        return out[0] if isinstance(out, tuple) else out

    xu = jnp.concatenate([x, u])
    xn = fwd(xu)
    S_forw = (jax.jacfwd(fwd)(xu) if sens_forw
              else jnp.zeros((nx, nx + nu), x.dtype))
    if seed_adj is None:
        seed_adj = jnp.zeros((nx,), x.dtype)
    if sens_adj or sens_hess:
        adj_fn = lambda v: jax.vjp(fwd, v)[1](seed_adj)[0]
        S_adj = adj_fn(xu)
        S_hess = (jax.jacfwd(adj_fn)(xu) if sens_hess
                  else jnp.zeros((nx + nu, nx + nu), x.dtype))
    else:
        S_adj = jnp.zeros((nx + nu,), x.dtype)
        S_hess = jnp.zeros((nx + nu, nx + nu), x.dtype)
    if nz > 0:
        out = step(x, u, p, t0, dt)
        zn = out[1]
    else:
        zn = jnp.zeros((0,), x.dtype)
    return SimOut(xn=xn, S_forw=S_forw, S_adj=S_adj, S_hess=S_hess, zn=zn)
