"""Full condensing: OCP-QP -> dense QP in w = (x0, u_0, ..., u_{N-1}).

TPU-native counterpart of /root/reference/acados/ocp_qp/ocp_qp_full_condensing.c
(wrapping HPIPM's dense condensing): all states except x0 are eliminated by
forward substitution  x_i = Gam_i x0 + Phi_i u + gam_i , producing one dense
QP of size nv = nx + N*nu with ng = (N+1)*nc rows — the right shape for the
dense IPM when nx*N is small (docs/features/index.md full-condensing guidance).

x0 stays a variable because the initial state enters as equality *rows*
(lg == ug) in this framework, not as eliminated parameters; the dense QP
carries those rows verbatim.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.dense_qp.data import DenseQp, DenseQpSol
from acados_tpu.ocp_qp.condensing import _condense_block
from acados_tpu.ocp_qp.data import OcpQp, OcpQpSol
from acados_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class FullCondCache:
    """State-elimination operators for expansion (i = 0..N incl. terminal)."""

    Gams: jnp.ndarray  # (N+1, nx, nx)
    Phis: jnp.ndarray  # (N+1, nx, N*nu)
    gams: jnp.ndarray  # (N+1, nx)


def full_condense(qp: OcpQp):
    """Condense an OcpQp into a DenseQp. Returns (dense_qp, cache)."""
    d = qp.dims
    N, nx, nu, nc = d.N, d.nx, d.nu, d.nc
    dt = qp.q.dtype

    (Q_b, R_b, S_b, q_b, r_b, A_N, B_N, b_N, C_b, D_b, lg_b, ug_b,
     (Gams, Phis, gams)) = _condense_block(
        qp.A, qp.B, qp.b, qp.Q[:N], qp.R, qp.S, qp.q[:N], qp.r,
        qp.C[:N], qp.D, qp.lg[:N], qp.ug[:N])

    # terminal stage: x_N = A_N x0 + B_N u + b_N
    QN, qN = qp.Q[N], qp.q[N]
    Qg = QN @ b_N + qN
    Hxx = Q_b + A_N.T @ QN @ A_N
    Hux = S_b + B_N.T @ QN @ A_N
    Huu = R_b + B_N.T @ QN @ B_N
    hx = q_b + A_N.T @ Qg
    hu = r_b + B_N.T @ Qg

    nv = nx + N * nu
    H = jnp.zeros((nv, nv), dt)
    H = H.at[:nx, :nx].set(Hxx).at[nx:, :nx].set(Hux) \
         .at[:nx, nx:].set(Hux.T).at[nx:, nx:].set(Huu)
    h = jnp.concatenate([hx, hu])

    # rows: path stages then terminal
    CN = qp.C[N]
    G = jnp.concatenate([
        jnp.concatenate([C_b, D_b], axis=1),
        jnp.concatenate([CN @ A_N, CN @ B_N], axis=1)])
    lg = jnp.concatenate([lg_b, qp.lg[N] - CN @ b_N])
    ug = jnp.concatenate([ug_b, qp.ug[N] - CN @ b_N])

    flat = lambda v: v.reshape((N + 1) * nc)
    dense = DenseQp(H=H, h=h, G=G, lg=lg, ug=ug,
                    mask_l=flat(qp.mask_l), mask_u=flat(qp.mask_u),
                    Zl=flat(qp.Zl), Zu=flat(qp.Zu),
                    zl=flat(qp.zl), zu=flat(qp.zu),
                    soft_mask=flat(qp.soft_mask))
    cache = FullCondCache(
        Gams=jnp.concatenate([Gams, A_N[None]]),
        Phis=jnp.concatenate([Phis, B_N[None]]),
        gams=jnp.concatenate([gams, b_N[None]]))
    return dense, cache


def full_expand(qp: OcpQp, cache: FullCondCache,
                sol_d: DenseQpSol) -> OcpQpSol:
    """Expand a dense solution to the full-horizon OcpQpSol.

    pi is recovered from stationarity at the eliminated states (same
    identity as partial_expand; the terminal one seeds the recursion:
    pi_{N-1} = Q_N x_N + q_N - C_N'lam_N).
    """
    d = qp.dims
    N, nx, nu, nc = d.N, d.nx, d.nu, d.nc
    x0 = sol_d.w[:nx]
    u = sol_d.w[nx:].reshape(N, nu)

    x = (jnp.einsum("iab,b->ia", cache.Gams, x0)
         + jnp.einsum("iau,u->ia", cache.Phis, sol_d.w[nx:])
         + cache.gams)

    rows = lambda v: v.reshape(N + 1, nc)
    lam_l, lam_u = rows(sol_d.lam_lg), rows(sol_d.lam_ug)
    lam_d = qp.mask_l * lam_l - qp.mask_u * lam_u

    pi_last = qp.Q[N] @ x[N] + qp.q[N] - qp.C[N].T @ lam_d[N]

    def step(pi_next, inp):
        Q_i, q_i, S_i, u_i, C_i, lam_i, A_i, x_i = inp
        pi_prev = (Q_i @ x_i + q_i + S_i.T @ u_i - C_i.T @ lam_i
                   + A_i.T @ pi_next)
        return pi_prev, pi_prev

    xs = (qp.Q[1:N], qp.q[1:N], qp.S[1:], u[1:], qp.C[1:N], lam_d[1:N],
          qp.A[1:], x[1:N])
    _, pis = jax.lax.scan(step, pi_last, xs, reverse=True)
    pi = jnp.concatenate([pis, pi_last[None]])

    return OcpQpSol(x=x, u=u, pi=pi, lam_lg=lam_l, lam_ug=lam_u,
                    t_lg=rows(sol_d.t_lg), t_ug=rows(sol_d.t_ug),
                    sl=rows(sol_d.sl), su=rows(sol_d.su))
