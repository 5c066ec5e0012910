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

from acados_tpu.ops.small_chol import (UNROLL_MAX_N, cho_solve_unrolled,
                                       chol_unrolled)
from acados_tpu.ops.smallmm import mm, mTm, mv, mTv
from acados_tpu.utils.struct import pytree_dataclass


def _chol(H):
    """Cholesky dispatch: unrolled jnp for tiny static n ON TPU (fuses
    into the scan body — XLA's cholesky custom-call overhead dominates
    there); the lane-batched Pallas kernel for larger n on TPU (XLA's
    batched cholesky costs ~4 ms at (1024, 39, 39) where the kernel is
    noise-level — ops/batched_chol.py); LAPACK elsewhere (CPU oracles
    keep LAPACK rounding)."""
    if jax.default_backend() == "tpu":
        if H.shape[-1] <= UNROLL_MAX_N:
            return chol_unrolled(H)
        from acados_tpu.ops.batched_chol import chol_any
        return chol_any(H)
    return jnp.linalg.cholesky(H)


def _cho_solve(L, B):
    if L.shape[-1] <= UNROLL_MAX_N and jax.default_backend() == "tpu":
        return cho_solve_unrolled(L, B)
    return jax.scipy.linalg.cho_solve((L, True), B)


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


def riccati_factor(Qb, Rb, Sb, A, B, reg_eps: float = 0.0,
                   unroll: int = 1) -> RiccatiFactor:
    """Backward Riccati factorization.

    Args:
      Qb: (N+1, nx, nx) stage cost Hessian x-block (barrier-augmented).
      Rb: (N, nu, nu) u-block. Sb: (N, nu, nx) cross block.
      A: (N, nx, nx), B: (N, nx, nu) dynamics.
      reg_eps: diagonal regularization added before each Cholesky.
      unroll: lax.scan unroll factor — the stage recursions are tiny
        (nx, nu) algebra, so on TPU the per-step loop dispatch dominates;
        unrolling fuses steps into one kernel (see IpmOpts.riccati_unroll).
    """
    nx = Qb.shape[-1]
    nu = Rb.shape[-1]
    eye_u = jnp.eye(nu, dtype=Rb.dtype) * reg_eps
    eye_x = jnp.eye(nx, dtype=Qb.dtype) * reg_eps

    def step(P, inp):
        # small-matrix products via ops.smallmm: the MXU pads nx to the
        # 128 systolic tile, so a batch of these tiny matmuls through
        # dot_general costs ~20x the VPU broadcast-reduce form (measured
        # 1.6 ms -> ~0 ms per factor sweep at B=4096, nx=4)
        A_k, B_k, Qb_k, Rb_k, Sb_k = inp
        PA = mm(P, A_k)
        PB = mm(P, B_k)
        Huu = Rb_k + mTm(B_k, PB)
        Hux = Sb_k + mTm(B_k, PA)
        Luu = _chol(Huu + eye_u)
        K = -_cho_solve(Luu, Hux)
        P_new = Qb_k + mTm(A_k, PA) + mTm(Hux, K)
        P_new = 0.5 * (P_new + jnp.swapaxes(P_new, -1, -2))
        return P_new, (P, Luu, K)

    P_N = Qb[-1]
    P0, (P_next_seq, Luu, K) = jax.lax.scan(
        step, P_N, (A, B, Qb[:-1], Rb, Sb), reverse=True, unroll=unroll
    )
    # P_next_seq[k] = P_{k+1}; assemble full P = [P_0, P_1, ..., P_N].
    P_full = jnp.concatenate([P0[None], P_next_seq], axis=0)
    LP0 = _chol(P0 + eye_x)
    return RiccatiFactor(P=P_full, Luu=Luu, K=K, LP0=LP0)


def riccati_backward(fact: RiccatiFactor, A, B, qb, rb, b):
    """Backward value-gradient sweep only: returns (kff (N, nu),
    p (N+1, nx)) — the affine policy du = K dx + kff and cost-to-go
    gradients. Used by DDP's nonlinear forward rollout
    (reference ocp_nlp_ddp.c evaluates the same policy via HPIPM's
    Riccati and applies it through the true dynamics)."""
    P_next = fact.P[1:]

    def bstep(p, inp):
        A_k, B_k, P_k1, Luu, K, qb_k, rb_k, b_k = inp
        Pb_p = mv(P_k1, b_k) + p
        h_u = rb_k + mTv(B_k, Pb_p)
        kff = -_cho_solve(Luu, h_u)
        p_new = qb_k + mTv(A_k, Pb_p) + mTv(K, h_u)
        return p_new, (kff, p)

    p0, (kff, p_next_seq) = jax.lax.scan(
        bstep, qb[-1], (A, B, P_next, fact.Luu, fact.K, qb[:-1], rb, b),
        reverse=True,
    )
    p = jnp.concatenate([p0[None], p_next_seq], axis=0)
    return kff, p


def riccati_solve(fact: RiccatiFactor, A, B, qb, rb, b, dx0=None,
                  unroll: int = 1):
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
        Pb_p = mv(P_k1, b_k) + p
        h_u = rb_k + mTv(B_k, Pb_p)
        kff = -_cho_solve(Luu, h_u)
        p_new = qb_k + mTv(A_k, Pb_p) + mTv(K, h_u)
        return p_new, (kff, p)

    p0, (kff, p_next_seq) = jax.lax.scan(
        bstep, qb[-1], (A, B, P_next, fact.Luu, fact.K, qb[:-1], rb, b),
        reverse=True, unroll=unroll,
    )

    if dx0 is None:
        dx0 = -_cho_solve(fact.LP0, p0)

    def fstep(dx, inp):
        A_k, B_k, b_k, K, kff_k, P_k1, p_k1 = inp
        du = mv(K, dx) + kff_k
        dx_next = mv(A_k, dx) + mv(B_k, du) + b_k
        pi_k = mv(P_k1, dx_next) + p_k1
        return dx_next, (du, dx_next, pi_k)

    _, (du, dx_rest, dpi) = jax.lax.scan(
        fstep, dx0, (A, B, b, fact.K, kff, P_next, p_next_seq),
        unroll=unroll
    )
    dx = jnp.concatenate([dx0[None], dx_rest], axis=0)
    return dx, du, dpi


# ---------------------------------------------------------------------------
# Parallel-in-time Riccati (log-depth associative scan)
# ---------------------------------------------------------------------------
#
# The reference's Riccati (HPIPM, ocp_qp_hpipm.c:347) is sequential O(N)
# over stages — fine on CPU, latency-bound on TPU where each step is tiny
# (nx, nu) algebra. Here the backward sweep is re-formulated as an
# associative operation on conditional value-function elements
# (Sarkka & Garcia-Fernandez, "Temporal Parallelization of Dynamic
# Programming and Linear Quadratic Control" — PAPERS.md items 2-5), so
# `jax.lax.associative_scan` evaluates it in O(log N) depth. Each element
# represents
#
#   V_e(x, z) = sup_lam [lam'(z - A_e x - b_e) - 0.5 lam' C_e lam]
#               + 0.5 x' J_e x - eta_e' x
#
# i.e. the stage's cost-to-go from x to z with u eliminated:
#   A_e = A - B R^{-1} S,  b_e = b - B R^{-1} r,  C_e = B R^{-1} B',
#   J_e = Q - S' R^{-1} S, eta_e = -(q - S' R^{-1} r).
# The terminal element is (0, 0, 0, -q_N, Q_N). Composition
# (earlier i) ⊗ (later j), all inverses as solves of I + C_i J_j:
#   A = A_j (I + C_i J_j)^{-1} A_i
#   b = A_j (I + C_i J_j)^{-1} (b_i + C_i eta_j) + b_j
#   C = A_j (I + C_i J_j)^{-1} C_i A_j' + C_j
#   eta = A_i' (I + J_j C_i)^{-1} (eta_j - J_j b_i) + eta_i
#   J = A_i' (I + J_j C_i)^{-1} J_j A_i + J_i
# The suffix-combined element at k has J = P_k, eta = -p_k.
#
# The rhs-only backward pass (predictor/corrector share one factorization)
# and the forward rollout are affine recursions; both run as associative
# scans over affine-map composition.


def _compose_affine(inner, outer):
    """Affine-map composition outer o inner: x -> Mo (Mi x + vi) + vo.

    Argument order matches `lax.associative_scan`'s reduction in both
    directions: the first argument is the already-combined subtree the
    current element wraps around (prefix scan: lower indices, inner of the
    forward rollout; reverse scan: higher indices, inner of the backward
    p-recursion)."""
    Mi, vi = inner
    Mo, vo = outer
    return Mo @ Mi, Mo @ vi + vo


def parallel_riccati_factor(Qb, Rb, Sb, A, B,
                            reg_eps: float = 0.0) -> RiccatiFactor:
    """Drop-in replacement for `riccati_factor` with log-depth scans."""
    nx = Qb.shape[-1]
    nu = Rb.shape[-1]
    dt = Qb.dtype
    eye_u = jnp.eye(nu, dtype=dt) * reg_eps
    eye_x = jnp.eye(nx, dtype=dt)

    # per-stage elimination of u (batched over stages)
    LR = _chol(Rb + eye_u)
    RiS = _cho_solve(LR, Sb)
    RiBt = _cho_solve(LR, jnp.swapaxes(B, -1, -2))
    A_e = A - jnp.einsum("kij,kjl->kil", B, RiS)
    C_e = jnp.einsum("kij,kjl->kil", B, RiBt)
    J_e = Qb[:-1] - jnp.einsum("kji,kjl->kil", Sb, RiS)
    # terminal element
    A_el = jnp.concatenate([A_e, jnp.zeros((1, nx, nx), dt)])
    C_el = jnp.concatenate([C_e, jnp.zeros((1, nx, nx), dt)])
    J_el = jnp.concatenate([J_e, Qb[-1][None]])

    def combine(ej, ei):
        # reverse scan: jax passes (later, earlier); we need i (earlier)
        # ⊗ j (later)
        from acados_tpu.ops.linsolve import linsolve
        Aj, Cj, Jj = ej
        Ai, Ci, Ji = ei
        M = eye_x + Ci @ Jj
        # one factorization, both right-hand sides (lane-batched Pallas
        # inverse on TPU — XLA's pivoted LU serializes here)
        MiAC = linsolve(M, jnp.concatenate([Ai, Ci], axis=-1))
        MiAi, MiCi = MiAC[..., :nx], MiAC[..., nx:]
        A_n = Aj @ MiAi
        C_n = Aj @ MiCi @ Aj.T + Cj
        J_n = Ai.T @ Jj @ MiAi + Ji
        J_n = 0.5 * (J_n + J_n.T)
        return (A_n, C_n, J_n)

    _, _, J_suffix = jax.lax.associative_scan(
        jax.vmap(combine), (A_el, C_el, J_el), reverse=True)
    P = J_suffix  # (N+1, nx, nx); P[k] = cost-to-go Hessian at stage k

    # per-stage gains from P_{k+1} (batched)
    P1 = P[1:]
    PB = jnp.einsum("kij,kjl->kil", P1, B)
    PA = jnp.einsum("kij,kjl->kil", P1, A)
    Huu = Rb + jnp.einsum("kji,kjl->kil", B, PB)
    Hux = Sb + jnp.einsum("kji,kjl->kil", B, PA)
    Luu = _chol(Huu + eye_u)
    K = -_cho_solve(Luu, Hux)
    LP0 = _chol(P[0] + reg_eps * eye_x)
    return RiccatiFactor(P=P, Luu=Luu, K=K, LP0=LP0)


def parallel_riccati_solve(fact: RiccatiFactor, A, B, qb, rb, b, dx0=None):
    """Drop-in replacement for `riccati_solve` with log-depth scans."""
    P1 = fact.P[1:]
    E = A + jnp.einsum("kij,kjl->kil", B, fact.K)  # closed loop

    # backward affine recursion p_k = qhat_k + E_k' p_{k+1}
    Pb = jnp.einsum("kij,kj->ki", P1, b)
    qhat = (qb[:-1] + jnp.einsum("kji,kj->ki", fact.K, rb)
            + jnp.einsum("kji,kj->ki", E, Pb))
    Et = jnp.swapaxes(E, -1, -2)
    nx = qb.shape[-1]
    eye = jnp.eye(nx, dtype=qb.dtype)
    M_el = jnp.concatenate([Et, jnp.zeros((1, nx, nx), qb.dtype)])
    v_el = jnp.concatenate([qhat, qb[-1][None]])

    M_suf, v_suf = jax.lax.associative_scan(
        jax.vmap(_compose_affine), (M_el, v_el), reverse=True)
    p = v_suf  # p_k for k = 0..N (suffix maps applied to p_{N+1} = 0)

    h_u = rb + jnp.einsum("kji,kj->ki", B, Pb + p[1:])
    kff = -_cho_solve(fact.Luu, h_u)
    if dx0 is None:
        dx0 = -_cho_solve(fact.LP0, p[0])

    # forward affine recursion dx_{k+1} = E_k dx_k + (B kff + b)
    v_fwd = jnp.einsum("kij,kj->ki", B, kff) + b
    M_pre, v_pre = jax.lax.associative_scan(
        jax.vmap(_compose_affine),
        (jnp.concatenate([eye[None], E]),
         jnp.concatenate([jnp.zeros((1, nx), qb.dtype), v_fwd])))
    dx = jnp.einsum("kij,j->ki", M_pre, dx0) + v_pre  # (N+1, nx)

    du = jnp.einsum("kij,kj->ki", fact.K, dx[:-1]) + kff
    dpi = jnp.einsum("kij,kj->ki", P1, dx[1:]) + p[1:]
    return dx, du, dpi
