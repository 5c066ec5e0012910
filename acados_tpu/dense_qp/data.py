"""Dense QP data model.

TPU-native counterpart of the reference's dense QP layer
(/root/reference/acados/dense_qp/dense_qp_common.{c,h}, HPIPM `d_dense_qp`
types): one flat variable vector w with two-sided, maskable, softenable
general rows — the target of full condensing and the home of the dense
IPM backend (reference backends: dense_qp_hpipm.c, dense_qp_qpoases.c).

    min   1/2 w'H w + h'w  +  soft-slack penalties
    s.t.  lg <= G w <= ug   (per-side masks; soft rows get sl, su >= 0)

Box bounds are rows of G with unit rows — on TPU one fused dense row block
beats separate bound/general paths (same argument as ocp_qp/data.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from acados_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class DenseQp:
    """One dense QP instance (vmap over a leading batch axis to batch).

    Shapes: H (nv, nv), h (nv,), G (ng, nv), everything else (ng,).
    """

    H: jnp.ndarray
    h: jnp.ndarray
    G: jnp.ndarray
    lg: jnp.ndarray
    ug: jnp.ndarray
    mask_l: jnp.ndarray
    mask_u: jnp.ndarray
    Zl: jnp.ndarray
    Zu: jnp.ndarray
    zl: jnp.ndarray
    zu: jnp.ndarray
    soft_mask: jnp.ndarray


@pytree_dataclass
class DenseQpSol:
    """Primal-dual solution (HPIPM `d_dense_qp_sol` analog)."""

    w: jnp.ndarray
    lam_lg: jnp.ndarray
    lam_ug: jnp.ndarray
    t_lg: jnp.ndarray
    t_ug: jnp.ndarray
    sl: jnp.ndarray
    su: jnp.ndarray
