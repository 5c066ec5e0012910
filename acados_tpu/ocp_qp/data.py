"""Batched stage-blocked OCP-QP data model.

TPU-native replacement for HPIPM's `d_ocp_qp` family (the reference typedefs
them at /root/reference/acados/ocp_qp/ocp_qp_common.h:49-54): instead of
BLASFEO panel-major stage matrices in one arena, the QP is a pytree of dense
stage-stacked arrays with static shapes, so a batch of B problem instances is
just `jax.vmap` over the leading axis and XLA tiles the per-stage small-matrix
algebra onto the MXU.

The quadratic program over stages k = 0..N:

    min   sum_k  1/2 x_k'Q_k x_k + 1/2 u_k'R_k u_k + u_k'S_k x_k
                 + q_k'x_k + r_k'u_k
          + sum_soft  zl's_l + 1/2 s_l'Zl s_l + zu's_u + 1/2 s_u'Zu s_u
    s.t.  x_{k+1} = A_k x_k + B_k u_k + b_k              k = 0..N-1
          lg_k <= C_k x_k + D_k u_k <= ug_k  (rows; two-sided, maskable,
                                              optionally softened by slacks
                                              s_l, s_u >= 0)

Box bounds (reference idxbx/idxbu), general-linear rows (C/D) and linearized
nonlinear rows (h) are all folded into the unified (C, D, lg, ug) rows at
construction time — one constraint matmul per stage instead of three code
paths (reference keeps them separate for sparsity on CPU:
ocp_nlp_constraints_bgh.c:1274; on TPU the fused dense row block wins).

Initial-state conditions (reference: idxbx_0 with lbx_0 == ubx_0) are plain
equality rows (lg == ug) — the infeasible-start IPM drives them to equality
exactly like HPIPM does.
"""
from __future__ import annotations

import jax.numpy as jnp

from acados_tpu.utils.struct import pytree_dataclass, static_field


@pytree_dataclass
class OcpQpDims:
    """Static dimensions of a (single) OCP-QP.

    Reference: ocp_nlp_common.h:153-186 allows every dim to vary per stage;
    here stage-varying dims are padded to the per-problem maximum and disabled
    rows are masked (SURVEY.md §7 hard part (c)).
    """

    N: int = static_field()
    nx: int = static_field()
    nu: int = static_field()
    nc: int = static_field()  # unified two-sided constraint rows per stage


@pytree_dataclass
class OcpQp:
    """One OCP-QP instance (vmap the solver over a leading batch axis).

    Shapes (no batch axis):
      Q  (N+1, nx, nx)   q  (N+1, nx)
      R  (N,   nu, nu)   r  (N,   nu)      S (N, nu, nx)
      A  (N,   nx, nx)   B  (N,   nx, nu)  b (N, nx)
      C  (N+1, nc, nx)   D  (N,   nc, nu)
      lg (N+1, nc)       ug (N+1, nc)
      mask_l/mask_u (N+1, nc) in {0., 1.}: per-side row enables. A row with
        only an upper bound sets mask_l = 0 (the reference instead passes
        lb = -ACADOS_INFTY, which is fine in f64 but catastrophically
        absorbs O(1) slack updates in f32 on TPU); masking both sides is
        the reference's constraint-masking dmask feature.
      Zl/Zu/zl/zu (N+1, nc)                soft_mask (N+1, nc) in {0., 1.}
    """

    Q: jnp.ndarray
    R: jnp.ndarray
    S: jnp.ndarray
    q: jnp.ndarray
    r: jnp.ndarray
    A: jnp.ndarray
    B: jnp.ndarray
    b: jnp.ndarray
    C: jnp.ndarray
    D: jnp.ndarray
    lg: jnp.ndarray
    ug: jnp.ndarray
    mask_l: jnp.ndarray
    mask_u: jnp.ndarray
    Zl: jnp.ndarray
    Zu: jnp.ndarray
    zl: jnp.ndarray
    zu: jnp.ndarray
    soft_mask: jnp.ndarray

    @property
    def dims(self) -> OcpQpDims:
        Np1, nx = self.q.shape[-2], self.q.shape[-1]
        nu = self.r.shape[-1]
        nc = self.lg.shape[-1]
        return OcpQpDims(N=Np1 - 1, nx=nx, nu=nu, nc=nc)


def zero_qp(dims: OcpQpDims, dtype=jnp.float32) -> OcpQp:
    """An all-zero QP of the given dimensions (masks off, bounds +-0)."""
    N, nx, nu, nc = dims.N, dims.nx, dims.nu, dims.nc
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    return OcpQp(
        Q=z(N + 1, nx, nx), R=z(N, nu, nu), S=z(N, nu, nx),
        q=z(N + 1, nx), r=z(N, nu),
        A=z(N, nx, nx), B=z(N, nx, nu), b=z(N, nx),
        C=z(N + 1, nc, nx), D=z(N, nc, nu),
        lg=z(N + 1, nc), ug=z(N + 1, nc),
        mask_l=z(N + 1, nc), mask_u=z(N + 1, nc),
        Zl=z(N + 1, nc), Zu=z(N + 1, nc), zl=z(N + 1, nc), zu=z(N + 1, nc),
        soft_mask=z(N + 1, nc),
    )


@pytree_dataclass
class OcpQpSol:
    """Primal-dual solution of an OCP-QP.

    Mirrors the fields of HPIPM's `d_ocp_qp_sol` the reference exposes
    (ocp_qp_common.h:49-54; Python side acados_ocp_solver.py get(stage, 'pi'/
    'lam'/...)): primal x/u, dynamics multipliers pi, two-sided inequality
    multipliers and slacks, soft slacks sl/su.
    """

    x: jnp.ndarray        # (N+1, nx)
    u: jnp.ndarray        # (N,   nu)
    pi: jnp.ndarray       # (N,   nx)   multiplier of x_{k+1} = A x + B u + b
    lam_lg: jnp.ndarray   # (N+1, nc)
    lam_ug: jnp.ndarray   # (N+1, nc)
    t_lg: jnp.ndarray     # (N+1, nc)
    t_ug: jnp.ndarray     # (N+1, nc)
    sl: jnp.ndarray       # (N+1, nc)   soft lower slack (0 on hard rows)
    su: jnp.ndarray       # (N+1, nc)
