"""QP scaling: objective + constraint-row scaling for conditioning.

TPU-native counterpart of the reference qpscaling module
(/root/reference/acados/ocp_nlp/ocp_nlp_qpscaling.c):
- objective scaling (OBJECTIVE_GERSHGORIN, :476-541): estimate the largest
  absolute Hessian eigenvalue with Gershgorin circles over all stage
  Hessians (incl. slack Z); obj_factor = min(1, ub_max_abs_eig / est),
  raised again if the scaled gradient inf-norm would drop below
  lb_norm_inf_grad_obj;
- constraint scaling (:544-...): each row is divided by the inf-norm of
  its coefficients (bounds rows have unit coefficients and stay as-is);
  slack penalties follow the row's units (Z / s^2, z / s).

The solution of the scaled QP maps back by
  pi -> pi / obj_factor,  lam_i -> lam_i * s_i / obj_factor,
  sl_i -> sl_i / s_i,     t_i -> t_i / s_i.
"""
from __future__ import annotations

import jax.numpy as jnp

from acados_tpu.ocp_qp.data import OcpQp, OcpQpSol


def scale_qp(qp: OcpQp, ub_max_abs_eig: float = 1e5,
             lb_norm_inf_grad_obj: float = 1e-4,
             scale_constraints: bool = True, unit_rows_0: int = 0):
    """Returns (qp_scaled, (obj_factor, row_scales)).

    unit_rows_0 > 0: keep the first unit_rows_0 stage-0 row scales at
    1.0 — the x0-elimination path reads dx0 straight from lg on those
    rows (and they leave the barrier entirely, so their conditioning is
    irrelevant). The reference applies reduce_eq_dof before any scaling
    sees those rows (ocp_qp_partial_condensing.c:542)."""
    dt = qp.q.dtype

    # --- objective factor (Gershgorin bound on the stage Hessians) --------
    def gersh(M):
        return jnp.max(jnp.sum(jnp.abs(M), axis=-1))

    max_eig = jnp.maximum(gersh(qp.Q), gersh(qp.R))
    max_eig = jnp.maximum(max_eig, 2.0 * gersh(qp.S))
    max_eig = jnp.maximum(max_eig, jnp.max(qp.Zl * qp.soft_mask))
    max_eig = jnp.maximum(max_eig, jnp.max(qp.Zu * qp.soft_mask))
    obj_factor = jnp.minimum(1.0, ub_max_abs_eig
                             / jnp.maximum(max_eig, 1e-30))
    grad_norm = jnp.maximum(jnp.max(jnp.abs(qp.q)),
                            jnp.max(jnp.abs(qp.r)))
    # keep the scaled gradient above the floor (reference :522-535)
    lb_factor = lb_norm_inf_grad_obj / jnp.maximum(grad_norm, 1e-30)
    obj_factor = jnp.maximum(obj_factor, jnp.minimum(1.0, lb_factor))
    obj_factor = obj_factor.astype(dt)

    # --- constraint row scales -------------------------------------------
    if scale_constraints:
        coeff = jnp.max(jnp.abs(qp.C), axis=-1)
        coeff = coeff.at[:-1].set(jnp.maximum(
            coeff[:-1], jnp.max(jnp.abs(qp.D), axis=-1)))
        s = 1.0 / jnp.maximum(coeff, 1.0)
        s = jnp.where((qp.mask_l + qp.mask_u) > 0, s, 1.0).astype(dt)
        if unit_rows_0 > 0:
            s = s.at[0, :unit_rows_0].set(1.0)
    else:
        s = jnp.ones_like(qp.lg)

    qp_s = qp.replace(
        Q=obj_factor * qp.Q, R=obj_factor * qp.R, S=obj_factor * qp.S,
        q=obj_factor * qp.q, r=obj_factor * qp.r,
        C=s[:, :, None] * qp.C, D=s[:-1, :, None] * qp.D,
        lg=s * qp.lg, ug=s * qp.ug,
        Zl=obj_factor * qp.Zl / s ** 2, Zu=obj_factor * qp.Zu / s ** 2,
        zl=obj_factor * qp.zl / s, zu=obj_factor * qp.zu / s)
    return qp_s, (obj_factor, s)


def unscale_sol(sol: OcpQpSol, scales) -> OcpQpSol:
    obj_factor, s = scales
    return OcpQpSol(
        x=sol.x, u=sol.u, pi=sol.pi / obj_factor,
        lam_lg=sol.lam_lg * s / obj_factor,
        lam_ug=sol.lam_ug * s / obj_factor,
        t_lg=sol.t_lg / s, t_ug=sol.t_ug / s,
        sl=sol.sl / s, su=sol.su / s)
