"""OCP-QP layer tests: Riccati + IPM vs dense KKT / scipy oracles.

Oracle style follows the reference's QP test tier
(/root/reference/test/ocp_qp/test_qpsolvers.cpp:117-268): mass-spring-style
random OCP-QPs swept over configurations, checked by KKT residuals and an
independent dense solve.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acados_tpu.ocp_qp.data import OcpQp, OcpQpDims, zero_qp
from acados_tpu.ocp_qp.ipm import IpmOpts, solve_ocp_qp
from acados_tpu.ocp_qp.riccati import riccati_factor, riccati_solve

from oracles import (dense_qp_from_ocp_qp, kkt_residuals_qp,
                     solve_dense_eq_qp, solve_dense_qp_scipy)


def random_ocp_qp(key, N=8, nx=4, nu=2, nc=3, with_ineq=True, soft=False,
                  x0_rows=True, seed_scale=1.0):
    """Random well-conditioned OCP-QP. First nx constraint rows at stage 0
    pin the initial state (lg == ug), mirroring acados' idxbx_0 handling."""
    ks = jax.random.split(key, 12)
    dt = jnp.float64
    Qs = jax.random.normal(ks[0], (N + 1, nx, nx), dt) * 0.3
    Q = jnp.einsum("kij,kil->kjl", Qs, Qs) + 1.0 * jnp.eye(nx, dtype=dt)
    Rs = jax.random.normal(ks[1], (N, nu, nu), dt) * 0.3
    R = jnp.einsum("kij,kil->kjl", Rs, Rs) + 1.0 * jnp.eye(nu, dtype=dt)
    S = jax.random.normal(ks[2], (N, nu, nx), dt) * 0.05
    q = jax.random.normal(ks[3], (N + 1, nx), dt) * seed_scale
    r = jax.random.normal(ks[4], (N, nu), dt) * seed_scale
    A = (jnp.eye(nx, dtype=dt)
         + 0.1 * jax.random.normal(ks[5], (N, nx, nx), dt))
    B = jax.random.normal(ks[6], (N, nx, nu), dt) * 0.3
    b = jax.random.normal(ks[7], (N, nx), dt) * 0.1

    nc_tot = nc + (nx if x0_rows else 0)
    C = jnp.zeros((N + 1, nc_tot, nx), dt)
    D = jnp.zeros((N, nc_tot, nu), dt)
    lg = jnp.zeros((N + 1, nc_tot), dt)
    ug = jnp.zeros((N + 1, nc_tot), dt)
    mask = jnp.zeros((N + 1, nc_tot), dt)  # both sides together here

    if x0_rows:
        x0 = jax.random.normal(ks[8], (nx,), dt) * 0.5
        C = C.at[0, :nx, :].set(jnp.eye(nx, dtype=dt))
        lg = lg.at[0, :nx].set(x0)
        ug = ug.at[0, :nx].set(x0)
        mask = mask.at[0, :nx].set(1.0)
    off = nx if x0_rows else 0

    if with_ineq:
        Cr = jax.random.normal(ks[9], (N + 1, nc, nx), dt)
        Dr = jax.random.normal(ks[10], (N, nc, nu), dt)
        C = C.at[:, off:, :].set(Cr)
        D = D.at[:, off:, :].set(Dr)
        # Guarantee a strictly feasible interior: center the bounds on the
        # zero-input rollout from x0 so u == 0 is strictly feasible.
        x_roll = [x0 if x0_rows else jnp.zeros(nx, dt)]
        for k in range(N):
            x_roll.append(A[k] @ x_roll[-1] + b[k])
        x_roll = jnp.stack(x_roll)
        g0 = jnp.einsum("kij,kj->ki", Cr, x_roll)
        widths = 0.2 + jax.random.uniform(ks[11], (2, N + 1, nc), dt,
                                          minval=0.0, maxval=1.5)
        lg = lg.at[:, off:].set(g0 - widths[0])
        ug = ug.at[:, off:].set(g0 + widths[1])
        mask = mask.at[:, off:].set(1.0)

    z = jnp.zeros((N + 1, nc_tot), dt)
    soft_mask = z
    Zl = Zu = z
    zl = zu = z
    if soft:
        soft_mask = soft_mask.at[:, off:].set(1.0)
        Zl = z.at[:, off:].set(10.0)
        Zu = z.at[:, off:].set(10.0)
        zl = z.at[:, off:].set(1.0)
        zu = z.at[:, off:].set(1.0)

    return OcpQp(Q=Q, R=R, S=S, q=q, r=r, A=A, B=B, b=b, C=C, D=D,
                 lg=lg, ug=ug, mask_l=mask, mask_u=mask,
                 Zl=Zl, Zu=Zu, zl=zl, zu=zu, soft_mask=soft_mask)


OPTS = IpmOpts(iter_max=50)


class TestRiccati:
    def test_equality_qp_matches_dense_kkt(self):
        """Riccati on an unconstrained LQ problem == dense KKT solve."""
        key = jax.random.PRNGKey(0)
        qp = random_ocp_qp(key, with_ineq=False, x0_rows=False)
        N, nx, nu = qp.dims.N, qp.dims.nx, qp.dims.nu
        fact = riccati_factor(qp.Q, qp.R, qp.S, qp.A, qp.B)
        dx, du, dpi = riccati_solve(fact, qp.A, qp.B, qp.q, qp.r, qp.b)

        dense = dense_qp_from_ocp_qp(qp)
        z, lam_eq = solve_dense_eq_qp(dense)
        for k in range(N + 1):
            np.testing.assert_allclose(
                np.asarray(dx[k]), z[k * (nx + nu):k * (nx + nu) + nx],
                atol=1e-9)
        for k in range(N):
            np.testing.assert_allclose(
                np.asarray(du[k]),
                z[k * (nx + nu) + nx:(k + 1) * (nx + nu)], atol=1e-9)
        # costate convention: pi_k multiplies (A x_k + B u_k + b - x_{k+1});
        # the dense oracle writes the same row block, so multipliers match.
        np.testing.assert_allclose(np.asarray(dpi).ravel(), lam_eq, atol=1e-9)


class TestIpm:
    @pytest.mark.parametrize("N,nx,nu,nc", [(8, 4, 2, 3), (20, 4, 1, 2),
                                            (5, 8, 3, 4), (40, 2, 1, 1)])
    def test_kkt_certificate(self, N, nx, nu, nc):
        qp = random_ocp_qp(jax.random.PRNGKey(N * 100 + nx), N=N, nx=nx,
                           nu=nu, nc=nc)
        sol, info = solve_ocp_qp(qp, OPTS)
        assert int(info.status) == 0, f"IPM status {info.status}"
        res = kkt_residuals_qp(qp, sol)
        assert res["stat"] < 1e-6, res
        assert res["eq"] < 1e-6, res
        assert res["ineq"] < 1e-6, res
        assert res["comp"] < 1e-6, res

    def test_matches_scipy_on_active_constraints(self):
        qp = random_ocp_qp(jax.random.PRNGKey(7), N=6, nx=3, nu=2, nc=2,
                           seed_scale=3.0)
        sol, info = solve_ocp_qp(qp, OPTS)
        assert int(info.status) == 0
        dense = dense_qp_from_ocp_qp(qp)
        z_ref = solve_dense_qp_scipy(dense)
        nx, nu, N = qp.dims.nx, qp.dims.nu, qp.dims.N
        z_ipm = []
        for k in range(N):
            z_ipm += [np.asarray(sol.x[k]), np.asarray(sol.u[k])]
        z_ipm.append(np.asarray(sol.x[N]))
        z_ipm = np.concatenate(z_ipm)
        np.testing.assert_allclose(z_ipm, z_ref, atol=5e-6)

    def test_x0_equality_rows_enforced(self):
        qp = random_ocp_qp(jax.random.PRNGKey(3))
        sol, info = solve_ocp_qp(qp, OPTS)
        assert int(info.status) == 0
        x0_target = np.asarray(qp.lg[0, :qp.dims.nx])
        np.testing.assert_allclose(np.asarray(sol.x[0]), x0_target,
                                   atol=1e-7)

    def test_masked_rows_equal_removed_rows(self):
        """Masking a constraint row == solving the QP without that row."""
        key = jax.random.PRNGKey(11)
        qp = random_ocp_qp(key, N=6, nx=3, nu=2, nc=3)
        # mask out the last inequality row everywhere (both sides)
        mask2 = qp.mask_l.at[:, -1].set(0.0)
        qp_masked = OcpQp(**{**{f: getattr(qp, f) for f in
                                qp.__dataclass_fields__},
                             "mask_l": mask2, "mask_u": mask2})
        sol_m, info_m = solve_ocp_qp(qp_masked, OPTS)
        assert int(info_m.status) == 0
        # build reduced-nc QP without that row
        sel = list(range(qp.dims.nc - 1))
        qp_red = OcpQp(
            Q=qp.Q, R=qp.R, S=qp.S, q=qp.q, r=qp.r, A=qp.A, B=qp.B, b=qp.b,
            C=qp.C[:, sel], D=qp.D[:, sel], lg=qp.lg[:, sel],
            ug=qp.ug[:, sel], mask_l=qp.mask_l[:, sel],
            mask_u=qp.mask_u[:, sel], Zl=qp.Zl[:, sel],
            Zu=qp.Zu[:, sel], zl=qp.zl[:, sel], zu=qp.zu[:, sel],
            soft_mask=qp.soft_mask[:, sel])
        sol_r, info_r = solve_ocp_qp(qp_red, OPTS)
        np.testing.assert_allclose(np.asarray(sol_m.x), np.asarray(sol_r.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(sol_m.u), np.asarray(sol_r.u),
                                   atol=1e-6)

    def test_batch_vmap_matches_serial(self):
        """Batched (vmap) solves == per-instance solves (the reference's
        batch==serial parity test, test_batch_solvers.py)."""
        keys = jax.random.split(jax.random.PRNGKey(42), 4)
        qps = [random_ocp_qp(k, N=6, nx=3, nu=2, nc=2) for k in keys]
        qp_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
        sol_b, info_b = jax.vmap(lambda q: solve_ocp_qp(q, OPTS))(qp_batch)
        for i, qp in enumerate(qps):
            sol_i, _ = solve_ocp_qp(qp, OPTS)
            np.testing.assert_allclose(np.asarray(sol_b.x[i]),
                                       np.asarray(sol_i.x), atol=1e-8)
            np.testing.assert_allclose(np.asarray(sol_b.u[i]),
                                       np.asarray(sol_i.u), atol=1e-8)


class TestSoftConstraints:
    def test_soft_qp_kkt(self):
        qp = random_ocp_qp(jax.random.PRNGKey(5), N=6, nx=3, nu=2, nc=2,
                           soft=True, seed_scale=5.0)
        sol, info = solve_ocp_qp(qp, OPTS)
        assert int(info.status) == 0
        res = kkt_residuals_qp(qp, sol)
        assert res["stat"] < 1e-6, res
        assert res["eq"] < 1e-6, res
        assert res["ineq"] < 1e-6, res

    def test_soft_equals_explicit_slack_reformulation(self):
        """Soft-constrained QP == hard QP with slacks appended as inputs.

        Validates the closed-form slack elimination against an explicit
        formulation solved by the same IPM on different code paths.
        """
        key = jax.random.PRNGKey(9)
        N, nx, nu, nc = 5, 3, 2, 2
        qp = random_ocp_qp(key, N=N, nx=nx, nu=nu, nc=nc, soft=True,
                           seed_scale=5.0)
        sol, info = solve_ocp_qp(qp, OPTS)
        assert int(info.status) == 0

        # Explicit reformulation: u_aug = [u; sl; su] (stage 0..N-1 only;
        # to keep shapes simple, restrict soft rows to stages 0..N-1 in this
        # test by masking stage-N soft rows to hard).
        qp_h = OcpQp(**{f: getattr(qp, f) for f in qp.__dataclass_fields__})
        sm = qp.soft_mask.at[N, :].set(0.0)
        qp = OcpQp(**{**{f: getattr(qp, f) for f in qp.__dataclass_fields__},
                      "soft_mask": sm})
        sol, info = solve_ocp_qp(qp, OPTS)
        assert int(info.status) == 0

        dt = qp.Q.dtype
        nu2 = nu + 2 * nc
        off = qp.dims.nc - nc  # x0 rows first
        R2 = jnp.zeros((N, nu2, nu2), dt)
        R2 = R2.at[:, :nu, :nu].set(qp.R)
        for i in range(nc):
            R2 = R2.at[:, nu + i, nu + i].set(qp.Zl[:N, off + i])
            R2 = R2.at[:, nu + nc + i, nu + nc + i].set(qp.Zu[:N, off + i])
        r2 = jnp.zeros((N, nu2), dt)
        r2 = r2.at[:, :nu].set(qp.r)
        r2 = r2.at[:, nu:nu + nc].set(qp.zl[:N, off:])
        r2 = r2.at[:, nu + nc:].set(qp.zu[:N, off:])
        S2 = jnp.zeros((N, nu2, nx), dt).at[:, :nu, :].set(qp.S)
        B2 = jnp.zeros((N, nx, nu2), dt).at[:, :, :nu].set(qp.B)

        # constraints: original rows but with slack columns; slack bounds >= 0
        nc2 = qp.dims.nc + 2 * nc + 2 * nc  # rows: orig softened (split into
        # two one-sided rows w/ slack) is complex; instead append slack to the
        # same two-sided row is not expressible -> use: row_l: g + sl >= lg
        # (upper inf), row_u: g - su <= ug (lower -inf), slack positivity.
        INF = 1e8
        rows = []
        for k in range(N + 1):
            pass
        nc_orig = qp.dims.nc
        n_rows = nc_orig + 2 * nc + 2 * nc
        C2 = jnp.zeros((N + 1, n_rows, nx), dt)
        D2 = jnp.zeros((N, n_rows, nu2), dt)
        lg2 = jnp.zeros((N + 1, n_rows), dt)
        ug2 = jnp.zeros((N + 1, n_rows), dt)
        mask2 = jnp.zeros((N + 1, n_rows), dt)

        # hard rows (x0 etc, and stage-N rows stay hard)
        C2 = C2.at[:, :nc_orig].set(qp.C)
        D2 = D2.at[:, :nc_orig, :nu].set(qp.D)
        lg2 = lg2.at[:, :nc_orig].set(qp.lg)
        ug2 = ug2.at[:, :nc_orig].set(qp.ug)
        # original soft rows at stages < N: replace by split rows
        mask_orig = qp.mask_l.at[:N, off:nc_orig].set(0.0)
        mask2 = mask2.at[:, :nc_orig].set(mask_orig)

        for i in range(nc):
            rl = nc_orig + i
            ru_ = nc_orig + nc + i
            psl = nc_orig + 2 * nc + i
            psu = nc_orig + 3 * nc + i
            # g + sl >= lg  (two-sided with huge upper)
            C2 = C2.at[:N, rl, :].set(qp.C[:N, off + i])
            D2 = D2.at[:, rl, :nu].set(qp.D[:, off + i])
            D2 = D2.at[:, rl, nu + i].set(1.0)
            lg2 = lg2.at[:N, rl].set(qp.lg[:N, off + i])
            ug2 = ug2.at[:N, rl].set(INF)
            mask2 = mask2.at[:N, rl].set(1.0)
            # g - su <= ug
            C2 = C2.at[:N, ru_, :].set(qp.C[:N, off + i])
            D2 = D2.at[:, ru_, :nu].set(qp.D[:, off + i])
            D2 = D2.at[:, ru_, nu + nc + i].set(-1.0)
            lg2 = lg2.at[:N, ru_].set(-INF)
            ug2 = ug2.at[:N, ru_].set(qp.ug[:N, off + i])
            mask2 = mask2.at[:N, ru_].set(1.0)
            # sl >= 0, su >= 0
            D2 = D2.at[:, psl, nu + i].set(1.0)
            lg2 = lg2.at[:N, psl].set(0.0)
            ug2 = ug2.at[:N, psl].set(INF)
            mask2 = mask2.at[:N, psl].set(1.0)
            D2 = D2.at[:, psu, nu + nc + i].set(1.0)
            lg2 = lg2.at[:N, psu].set(0.0)
            ug2 = ug2.at[:N, psu].set(INF)
            mask2 = mask2.at[:N, psu].set(1.0)

        z2 = jnp.zeros((N + 1, n_rows), dt)
        qp2 = OcpQp(Q=qp.Q, R=R2, S=S2, q=qp.q, r=r2, A=qp.A, B=B2, b=qp.b,
                    C=C2, D=D2, lg=lg2, ug=ug2, mask_l=mask2, mask_u=mask2,
                    Zl=z2, Zu=z2, zl=z2, zu=z2, soft_mask=z2)
        sol2, info2 = solve_ocp_qp(qp2, OPTS)
        assert int(info2.status) == 0
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(sol2.x),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(sol.u),
                                   np.asarray(sol2.u[:, :nu]), atol=1e-5)


class TestQpSensSeeds:
    """QP-level forward/adjoint sensitivity seeds (reference
    d_ocp_qp_ipm_sens_frw/adj, ocp_qp_hpipm.c:489,503) checked against
    finite differences and forward/adjoint consistency."""

    def _qp(self):
        import jax.numpy as jnp
        import sys as _sys
        _sys.path.insert(0, str(__import__("pathlib").Path(
            __file__).resolve().parent))
        from test_admm import make_di_qp
        # loose bounds: stable inactive set so the smoothed-barrier IFT
        # and a finite-difference re-solve agree (at an active bound the
        # true sensitivity is zero and only the barrier smoothing
        # differs — same behavior as HPIPM's sens at tau_min)
        _, _, _, qp = make_di_qp(ubu=50.0)
        return qp

    def test_forward_matches_fd(self):
        import jax
        import jax.numpy as jnp
        from acados_tpu.ocp_qp.ipm import (solve_ocp_qp,
                                           solve_ocp_qp_sens_frw)
        qp = self._qp()
        sol, info = solve_ocp_qp(qp)
        assert int(info.status) == 0
        d_qp = jax.tree.map(jnp.zeros_like, qp)
        d_qp = d_qp.replace(q=d_qp.q.at[3, 0].set(1.0))
        dx, du, dpi = solve_ocp_qp_sens_frw(qp, sol, d_qp)
        eps = 1e-6
        qp2 = qp.replace(q=qp.q.at[3, 0].add(eps))
        sol2, _ = solve_ocp_qp(qp2)
        fd = (np.asarray(sol2.x) - np.asarray(sol.x)) / eps
        np.testing.assert_allclose(np.asarray(dx), fd, atol=5e-4)

    def test_adjoint_consistent_with_forward(self):
        import jax
        import jax.numpy as jnp
        from acados_tpu.ocp_qp.ipm import (solve_ocp_qp,
                                           solve_ocp_qp_sens_adj,
                                           solve_ocp_qp_sens_frw)
        qp = self._qp()
        sol, _ = solve_ocp_qp(qp)
        rng = np.random.default_rng(0)
        seed_x = jnp.asarray(rng.standard_normal(np.asarray(sol.x).shape))
        seed_u = jnp.asarray(rng.standard_normal(np.asarray(sol.u).shape))
        grad = solve_ocp_qp_sens_adj(qp, sol, seed_x, seed_u)
        # <seed, frw(d)> == <adj(seed), d> for a random direction d
        d_qp = jax.tree.map(jnp.zeros_like, qp)
        d_qp = d_qp.replace(
            q=jnp.asarray(rng.standard_normal(np.asarray(qp.q).shape)),
            b=jnp.asarray(rng.standard_normal(np.asarray(qp.b).shape)))
        dx, du, _ = solve_ocp_qp_sens_frw(qp, sol, d_qp)
        lhs = float(jnp.sum(seed_x * dx) + jnp.sum(seed_u * du))
        rhs = float(jnp.sum(grad.q * d_qp.q) + jnp.sum(grad.b * d_qp.b))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-8)
