"""zoRO: zero-order robust optimization custom update.

Reference: the custom-update hook compiled into the capsule
(/root/reference/interfaces/acados_template/acados_template/
zoro_description.py:42-103 + custom_update_templates/
custom_update_function_zoro_template.in.c): between solver calls,
propagate the uncertainty covariance

    P_{k+1} = (A_k + B_k K) P_k (A_k + B_k K)' + W

along the current linearization and tighten the constraint bounds by
backoff_scaling_gamma * sqrt(row variance), so the nominal NMPC satisfies
the constraints for the disturbed system (docs/features/index.md:118-123).

Here the hook is a jitted function over the solver's current iterate —
no template codegen; `AcadosOcpSolver.custom_update()` dispatches to it
when a ZoroDescription is attached (ocp.zoro_description, like the
reference).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ZoroDescription:
    """Reference: zoro_description.py:42-103 (subset: the W/P0/K
    covariance propagation + bound backoff)."""

    backoff_scaling_gamma: float = 1.0
    P0_mat: Optional[np.ndarray] = None     # initial covariance
    W_mat: Optional[np.ndarray] = None      # process noise covariance
    fdbk_K_mat: Optional[np.ndarray] = None  # feedback gain (nu, nx)


def make_zoro_update(solver):
    """Build the jitted covariance propagation for `solver`."""
    form = solver.form
    desc = solver.acados_ocp.zoro_description
    nx, nu, N = form.nx, form.nu, form.N
    dt = solver.dtype
    P0 = jnp.asarray(desc.P0_mat if desc.P0_mat is not None
                     else np.zeros((nx, nx)), dt)
    Wm = jnp.asarray(desc.W_mat if desc.W_mat is not None
                     else np.zeros((nx, nx)), dt)
    K = jnp.asarray(desc.fdbk_K_mat if desc.fdbk_K_mat is not None
                    else np.zeros((nu, nx)), dt)

    from acados_tpu.ocp_nlp.linearize import build_static_rows, linearize

    @jax.jit
    def propagate(data, it):
        static_rows = build_static_rows(form, dt)
        qp = linearize(form, static_rows, data, it, jnp.asarray(0.0, dt))
        Acl = qp.A + jnp.einsum("kij,jl->kil", qp.B, K)

        def step(P, A_k):
            P_next = A_k @ P @ A_k.T + Wm
            return P_next, P

        _, Ps = jax.lax.scan(step, P0, Acl)
        P_all = jnp.concatenate([Ps, (Acl[-1] @ Ps[-1] @ Acl[-1].T
                                      + Wm)[None]])
        # row variances: diag(G P G') with G = [C; D K-free part]; the
        # control rows use u = K dx feedback -> row Jacobian C + D K
        CDK = qp.C.at[:-1].add(jnp.einsum("kij,jl->kil", qp.D, K))
        var = jnp.einsum("kij,kjl,kil->ki", CDK, P_all, CDK)
        backoff = desc.backoff_scaling_gamma * jnp.sqrt(
            jnp.maximum(var, 0.0))
        return backoff

    return propagate


def zoro_custom_update(solver) -> None:
    """Tighten the solver's bound data in place (the reference's
    custom_update C function)."""
    from acados_tpu.interface.builder import data_to_jax

    if getattr(solver, "_zoro_fn", None) is None:
        solver._zoro_fn = make_zoro_update(solver)
        # keep the original (unshrunk) bounds as the tightening base
        solver._zoro_base = {k: solver._data[k].copy()
                             for k in ("lb", "ub", "lb_e", "ub_e")}
    data = data_to_jax(solver._data, solver.dtype)
    backoff = np.asarray(solver._zoro_fn(data, solver._iterate_jax()))
    inf_thr = 0.5e10
    for key, sl, sign in (("lb", slice(1, solver.N), +1),
                          ("ub", slice(1, solver.N), -1)):
        base = solver._zoro_base[key]
        b = backoff[sl]
        tight = base + sign * b
        keep = np.abs(base) < inf_thr  # only tighten finite bounds
        solver._data[key] = np.where(keep, tight, base)
    base_e = solver._zoro_base["lb_e"]
    keep_e = np.abs(base_e) < inf_thr
    solver._data["lb_e"] = np.where(keep_e, base_e + backoff[solver.N],
                                    base_e)
    base_e = solver._zoro_base["ub_e"]
    keep_e = np.abs(base_e) < inf_thr
    solver._data["ub_e"] = np.where(keep_e, base_e - backoff[solver.N],
                                    base_e)
