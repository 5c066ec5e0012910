"""Backward Riccati factorization / solve for equality-constrained LQ problems.

TPU-native replacement for HPIPM's Riccati-recursion kernel that the reference
calls per interior-point iteration (`d_ocp_qp_ipm_solve`,
/root/reference/acados/ocp_qp/ocp_qp_hpipm.c:347). Design notes:

- factor() and solve() are split, mirroring HPIPM's condense_lhs /
  condense_rhs_and_solve split the reference RTI path relies on
  (ocp_qp_xcond_solver.c:591,623): one factorization serves the IPM
  predictor + corrector right-hand sides, the RTI feedback phase, and
  forward/adjoint QP solution sensitivities (ocp_qp_hpipm.c:489,503).
- Everything is `lax.scan` over stages with static shapes; a batch of B
  instances is `jax.vmap` over the leading axis, turning each stage's small
  (nx, nu) algebra into (B, nx, nu) batched matmuls that XLA maps to the MXU.
- The initial state is a *free* variable solved from P_0 (x0-equality rows in
  the QP drive it to the prescribed value via the IPM barrier, exactly like
  HPIPM treats lbx_0 == ubx_0 box constraints).

Convention: dynamics multiplier pi_k is attached to the constraint
(A_k x_k + B_k u_k + b_k - x_{k+1}), so the costate identity is
pi_k = P_{k+1} dx_{k+1} + p_{k+1}.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class RiccatiFactor:
    """Factorization of the LQ problem's KKT system.

    P   (N+1, nx, nx)  cost-to-go Hessians
    Luu (N,   nu, nu)  lower Cholesky of Huu_k = Rb_k + B_k' P_{k+1} B_k
    K   (N,   nu, nx)  feedback gains, du = K dx + kff
    LP0 (nx, nx)       lower Cholesky of P_0 (free-initial-state solve)
    """

    P: jnp.ndarray
    Luu: jnp.ndarray
    K: jnp.ndarray
    LP0: jnp.ndarray


def riccati_factor(Qb, Rb, Sb, A, B, reg_eps: float = 0.0) -> RiccatiFactor:
    """Backward Riccati factorization.

    Args:
      Qb: (N+1, nx, nx) stage cost Hessian x-block (barrier-augmented).
      Rb: (N, nu, nu) u-block. Sb: (N, nu, nx) cross block.
      A: (N, nx, nx), B: (N, nx, nu) dynamics.
      reg_eps: diagonal regularization added before each Cholesky.
    """
    nx = Qb.shape[-1]
    nu = Rb.shape[-1]
    eye_u = jnp.eye(nu, dtype=Rb.dtype) * reg_eps
    eye_x = jnp.eye(nx, dtype=Qb.dtype) * reg_eps

    def step(P, inp):
        A_k, B_k, Qb_k, Rb_k, Sb_k = inp
        PA = P @ A_k
        PB = P @ B_k
        Huu = Rb_k + B_k.T @ PB
        Hux = Sb_k + B_k.T @ PA
        Luu = jnp.linalg.cholesky(Huu + eye_u)
        K = -jax.scipy.linalg.cho_solve((Luu, True), Hux)
        P_new = Qb_k + A_k.T @ PA + Hux.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        return P_new, (P, Luu, K)

    P_N = Qb[-1]
    P0, (P_next_seq, Luu, K) = jax.lax.scan(
        step, P_N, (A, B, Qb[:-1], Rb, Sb), reverse=True
    )
    # P_next_seq[k] = P_{k+1}; assemble full P = [P_0, P_1, ..., P_N].
    P_full = jnp.concatenate([P0[None], P_next_seq], axis=0)
    LP0 = jnp.linalg.cholesky(P0 + eye_x)
    return RiccatiFactor(P=P_full, Luu=Luu, K=K, LP0=LP0)


def riccati_solve(fact: RiccatiFactor, A, B, qb, rb, b, dx0=None):
    """Solve the LQ problem for one right-hand side using a factorization.

    Args:
      fact: output of `riccati_factor`.
      A, B: dynamics matrices (same as passed to factor).
      qb: (N+1, nx) gradients. rb: (N, nu). b: (N, nx) dynamics residual rhs.
      dx0: optional (nx,) fixed initial state; if None, x0 is solved as a
        free variable from P_0 (the eliminate-x0 RTI fast path passes dx0).

    Returns:
      (dx (N+1, nx), du (N, nu), dpi (N, nx)).
    """
    P_next = fact.P[1:]  # (N, nx, nx), P_{k+1}

    def bstep(p, inp):
        A_k, B_k, P_k1, Luu, K, qb_k, rb_k, b_k = inp
        Pb_p = P_k1 @ b_k + p
        h_u = rb_k + B_k.T @ Pb_p
        kff = -jax.scipy.linalg.cho_solve((Luu, True), h_u)
        p_new = qb_k + A_k.T @ Pb_p + K.T @ h_u
        return p_new, (kff, p)

    p0, (kff, p_next_seq) = jax.lax.scan(
        bstep, qb[-1], (A, B, P_next, fact.Luu, fact.K, qb[:-1], rb, b),
        reverse=True,
    )

    if dx0 is None:
        dx0 = -jax.scipy.linalg.cho_solve((fact.LP0, True), p0)

    def fstep(dx, inp):
        A_k, B_k, b_k, K, kff_k, P_k1, p_k1 = inp
        du = K @ dx + kff_k
        dx_next = A_k @ dx + B_k @ du + b_k
        pi_k = P_k1 @ dx_next + p_k1
        return dx_next, (du, dx_next, pi_k)

    _, (du, dx_rest, dpi) = jax.lax.scan(
        fstep, dx0, (A, B, b, fact.K, kff, P_next, p_next_seq)
    )
    dx = jnp.concatenate([dx0[None], dx_rest], axis=0)
    return dx, du, dpi
