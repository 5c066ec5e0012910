"""Independent numpy oracles for validating the TPU framework.

Mirrors the reference's oracle strategy (SURVEY.md §4): KKT-residual
assertions instead of golden trajectories, plus an independent
general-purpose solver (scipy) standing in for the reference's
IPOPT-via-CasADi cross-check (acados_casadi_ocp_solver.py:41-398).
"""
from __future__ import annotations

import numpy as np


def dense_qp_from_ocp_qp(qp):
    """Assemble the dense form of an OcpQp (numpy, float64).

    Variable order: z = [x_0, u_0, x_1, u_1, ..., x_{N-1}, u_{N-1}, x_N].
    Returns dict with H, g, E, e (equalities E z = e), G, lg, ug, masks and
    soft data.
    """
    Q = np.asarray(qp.Q, np.float64)
    R = np.asarray(qp.R, np.float64)
    S = np.asarray(qp.S, np.float64)
    qv = np.asarray(qp.q, np.float64)
    rv = np.asarray(qp.r, np.float64)
    A = np.asarray(qp.A, np.float64)
    B = np.asarray(qp.B, np.float64)
    b = np.asarray(qp.b, np.float64)
    C = np.asarray(qp.C, np.float64)
    D = np.asarray(qp.D, np.float64)
    lg = np.asarray(qp.lg, np.float64)
    ug = np.asarray(qp.ug, np.float64)
    mask = np.asarray(qp.mask_l, np.float64) * 0.5 \
        + np.asarray(qp.mask_u, np.float64) * 0.5

    N = A.shape[0]
    nx = Q.shape[-1]
    nu = R.shape[-1]
    nz = (N + 1) * nx + N * nu

    def xi(k):
        return k * (nx + nu)

    def ui(k):
        return k * (nx + nu) + nx

    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(N):
        H[xi(k):xi(k) + nx, xi(k):xi(k) + nx] = Q[k]
        H[ui(k):ui(k) + nu, ui(k):ui(k) + nu] = R[k]
        H[ui(k):ui(k) + nu, xi(k):xi(k) + nx] = S[k]
        H[xi(k):xi(k) + nx, ui(k):ui(k) + nu] = S[k].T
        g[xi(k):xi(k) + nx] = qv[k]
        g[ui(k):ui(k) + nu] = rv[k]
    H[xi(N):xi(N) + nx, xi(N):xi(N) + nx] = Q[N]
    g[xi(N):xi(N) + nx] = qv[N]

    E = np.zeros((N * nx, nz))
    e = np.zeros(N * nx)
    for k in range(N):
        E[k * nx:(k + 1) * nx, xi(k):xi(k) + nx] = A[k]
        E[k * nx:(k + 1) * nx, ui(k):ui(k) + nu] = B[k]
        E[k * nx:(k + 1) * nx, xi(k + 1):xi(k + 1) + nx] = -np.eye(nx)
        e[k * nx:(k + 1) * nx] = -b[k]

    nc = lg.shape[-1]
    rows = []
    lo, hi = [], []
    for k in range(N + 1):
        for i in range(nc):
            if mask[k, i] <= 0:
                continue
            row = np.zeros(nz)
            row[xi(k):xi(k) + nx] = C[k, i]
            if k < N:
                row[ui(k):ui(k) + nu] = D[k, i]
            rows.append(row)
            lo.append(lg[k, i])
            hi.append(ug[k, i])
    G = np.array(rows) if rows else np.zeros((0, nz))
    return dict(H=H, g=g, E=E, e=e, G=G, lg=np.array(lo), ug=np.array(hi),
                N=N, nx=nx, nu=nu)


def solve_dense_eq_qp(dense):
    """Exact KKT solve for equality-constrained QP (no inequalities)."""
    H, g, E, e = dense["H"], dense["g"], dense["E"], dense["e"]
    nz, ne = H.shape[0], E.shape[0]
    KKT = np.zeros((nz + ne, nz + ne))
    KKT[:nz, :nz] = H
    KKT[:nz, nz:] = E.T
    KKT[nz:, :nz] = E
    rhs = np.concatenate([-g, e])
    sol = np.linalg.solve(KKT, rhs)
    return sol[:nz], sol[nz:]


def solve_dense_qp_scipy(dense, tol=1e-12):
    """Independent inequality-QP solve via scipy SLSQP (cross-check oracle)."""
    from scipy.optimize import LinearConstraint, minimize

    H, g = dense["H"], dense["g"]
    cons = []
    if dense["E"].shape[0]:
        cons.append(LinearConstraint(dense["E"], dense["e"], dense["e"]))
    if dense["G"].shape[0]:
        cons.append(LinearConstraint(dense["G"], dense["lg"], dense["ug"]))
    fun = lambda z: 0.5 * z @ H @ z + g @ z
    jac = lambda z: H @ z + g
    res = minimize(fun, np.zeros(H.shape[0]), jac=jac, method="SLSQP",
                   constraints=cons, options=dict(maxiter=500, ftol=tol))
    return res.x


def kkt_residuals_qp(qp, sol):
    """Infinity norms of KKT residuals of an OcpQp at a candidate solution.

    For convex QPs this is a complete optimality certificate: stationarity,
    primal feasibility, dual feasibility and complementarity all <= tol
    implies global optimality. Matches the residual definitions of the
    reference (ocp_nlp_common.c:3680) specialized to the QP.
    """
    x = np.asarray(sol.x, np.float64)
    u = np.asarray(sol.u, np.float64)
    pi = np.asarray(sol.pi, np.float64)
    lam_l = np.asarray(sol.lam_lg, np.float64)
    lam_u = np.asarray(sol.lam_ug, np.float64)
    sl = np.asarray(sol.sl, np.float64)
    su = np.asarray(sol.su, np.float64)

    Q = np.asarray(qp.Q, np.float64); R = np.asarray(qp.R, np.float64)
    S = np.asarray(qp.S, np.float64)
    qv = np.asarray(qp.q, np.float64); rv = np.asarray(qp.r, np.float64)
    A = np.asarray(qp.A, np.float64); B = np.asarray(qp.B, np.float64)
    b = np.asarray(qp.b, np.float64)
    C = np.asarray(qp.C, np.float64); D = np.asarray(qp.D, np.float64)
    lg = np.asarray(qp.lg, np.float64); ug = np.asarray(qp.ug, np.float64)
    mask_l = np.asarray(qp.mask_l, np.float64)
    mask_u = np.asarray(qp.mask_u, np.float64)
    mask = np.maximum(mask_l, mask_u)
    smask = np.asarray(qp.soft_mask, np.float64) * mask
    Zl = np.asarray(qp.Zl, np.float64); Zu = np.asarray(qp.Zu, np.float64)
    zl = np.asarray(qp.zl, np.float64); zu = np.asarray(qp.zu, np.float64)

    N = A.shape[0]
    lam_d = mask_l * lam_l - mask_u * lam_u

    res_stat = 0.0
    soft_comp = 0.0
    for k in range(N + 1):
        rx = Q[k] @ x[k] + qv[k] - C[k].T @ lam_d[k]
        if k < N:
            rx += S[k].T @ u[k] + A[k].T @ pi[k]
        if k > 0:
            rx -= pi[k - 1]
        res_stat = max(res_stat, np.abs(rx).max())
        if k < N:
            ru = (S[k] @ x[k] + R[k] @ u[k] + rv[k] + B[k].T @ pi[k]
                  - D[k].T @ lam_d[k])
            res_stat = max(res_stat, np.abs(ru).max())
        # soft slack stationarity: zl + Zl*sl - lam_l - lam_sl = 0 with
        # lam_sl >= 0 complementary to sl >= 0. Eliminating lam_sl =
        # zl + Zl*sl - lam_l, the exact KKT conditions on (sl, lam_sl)
        # are dual feasibility lam_sl >= 0 (-> stat) and complementarity
        # lam_sl * sl = 0 (-> comp). An interior-point solution never has
        # sl exactly 0, so a hard activity threshold would misclassify
        # boundary rows; the comp product is the threshold-free measure.
        for i in range(lg.shape[1]):
            if smask[k, i] > 0:
                gl = zl[k, i] + Zl[k, i] * sl[k, i] - lam_l[k, i]
                res_stat = max(res_stat, max(0.0, -gl))
                soft_comp = max(soft_comp, abs(gl) * sl[k, i])
                gu = zu[k, i] + Zu[k, i] * su[k, i] - lam_u[k, i]
                res_stat = max(res_stat, max(0.0, -gu))
                soft_comp = max(soft_comp, abs(gu) * su[k, i])

    res_eq = 0.0
    for k in range(N):
        rd = A[k] @ x[k] + B[k] @ u[k] + b[k] - x[k + 1]
        res_eq = max(res_eq, np.abs(rd).max())

    res_ineq = 0.0
    res_comp = 0.0
    for k in range(N + 1):
        gk = C[k] @ x[k] + (D[k] @ u[k] if k < N else 0.0)
        for i in range(lg.shape[1]):
            if mask[k, i] <= 0:
                continue
            viol_l = (lg[k, i] - gk[i] - smask[k, i] * sl[k, i]) \
                if mask_l[k, i] > 0 else 0.0
            viol_u = (gk[i] - ug[k, i] - smask[k, i] * su[k, i]) \
                if mask_u[k, i] > 0 else 0.0
            res_ineq = max(res_ineq, viol_l, viol_u, 0.0)
            if mask_l[k, i] > 0:
                res_comp = max(res_comp, abs(lam_l[k, i] * min(
                    gk[i] + smask[k, i] * sl[k, i] - lg[k, i], 1e9)))
            if mask_u[k, i] > 0:
                res_comp = max(res_comp, abs(lam_u[k, i] * min(
                    ug[k, i] - gk[i] + smask[k, i] * su[k, i], 1e9)))
    return dict(stat=res_stat, eq=res_eq, ineq=res_ineq,
                comp=max(res_comp, soft_comp))
