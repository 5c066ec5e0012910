"""Integrator tests vs high-precision scipy reference + finite differences.

Oracle style follows the reference's sim test tier
(/root/reference/test/sim/sim_test_ode.cpp:89-606, sim_test_dae.cpp,
sim_test_hessian.cpp): pendulum model, every integrator x sensitivity mode,
checked against a tight-tolerance reference integration.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from acados_tpu.sim.butcher import (erk_tableau, gauss_legendre_tableau,
                                    radau_iia_tableau)
from acados_tpu.sim.integrator import SimOpts, make_step_fn, simulate


def pendulum_ode(x, u, p, t):
    """Pendulum-on-cart (same physics as the reference getting-started
    model, examples/acados_python/getting_started/pendulum_model.py)."""
    M, m, g, l = 1.0, 0.1, 9.81, 0.8
    theta, dtheta, v = x[1], x[3], x[2]
    F = u[0]
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    denom = M + m - m * cth * cth
    return jnp.stack([
        v,
        dtheta,
        (-m * l * sth * dtheta**2 + m * g * cth * sth + F) / denom,
        (-m * l * cth * sth * dtheta**2 + F * cth + (M + m) * g * sth)
        / (l * denom),
    ])


X0 = np.array([0.1, 0.5, -0.2, 0.3])
U0 = np.array([2.0])
DT = 0.25


def scipy_ref(x0=X0, u=U0, dt=DT):
    f = lambda t, x: np.asarray(
        pendulum_ode(jnp.asarray(x), jnp.asarray(u), None, t))
    sol = solve_ivp(f, (0, dt), x0, rtol=1e-12, atol=1e-12, dense_output=True)
    return sol.y[:, -1]


class TestButcher:
    def test_radau_iia_known_nodes(self):
        _, _, c2 = radau_iia_tableau(2)
        np.testing.assert_allclose(c2, [1 / 3, 1.0], atol=1e-12)
        _, _, c3 = radau_iia_tableau(3)
        np.testing.assert_allclose(
            c3, [(4 - np.sqrt(6)) / 10, (4 + np.sqrt(6)) / 10, 1.0],
            atol=1e-12)

    def test_gauss_legendre_order(self):
        # 2-stage GL integrates polynomials up to degree 3 exactly
        A, b, c = gauss_legendre_tableau(2)
        for k in range(4):
            np.testing.assert_allclose(b @ (c ** k), 1 / (k + 1), atol=1e-13)

    def test_erk4_consistency(self):
        A, b, c = erk_tableau(4)
        np.testing.assert_allclose(b.sum(), 1.0)
        np.testing.assert_allclose(A.sum(axis=1), c)


class TestErk:
    @pytest.mark.parametrize("num_stages,num_steps,tol", [
        (4, 40, 1e-7), (2, 200, 1e-5), (1, 2000, 5e-3)])
    def test_vs_scipy(self, num_stages, num_steps, tol):
        step = make_step_fn(f_expl=pendulum_ode, nx=4, opts=SimOpts(
            integrator_type="ERK", num_stages=num_stages,
            num_steps=num_steps))
        xn = step(jnp.asarray(X0), jnp.asarray(U0), None, 0.0, DT)
        np.testing.assert_allclose(np.asarray(xn), scipy_ref(), atol=tol)

    def test_forward_sens_vs_finite_diff(self):
        step = make_step_fn(f_expl=pendulum_ode, nx=4, opts=SimOpts(
            integrator_type="ERK", num_stages=4, num_steps=10))
        out = simulate(step, jnp.asarray(X0), jnp.asarray(U0), dt=DT)
        eps = 1e-6
        for j in range(5):
            dxu = np.zeros(5)
            dxu[j] = eps
            xp = np.concatenate([X0, U0]) + dxu
            xm = np.concatenate([X0, U0]) - dxu
            fd = (np.asarray(step(jnp.asarray(xp[:4]), jnp.asarray(xp[4:]),
                                  None, 0.0, DT))
                  - np.asarray(step(jnp.asarray(xm[:4]), jnp.asarray(xm[4:]),
                                    None, 0.0, DT))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(out.S_forw[:, j]), fd,
                                       atol=1e-6)


class TestIrk:
    @pytest.mark.parametrize("colloc,ns,steps,tol", [
        ("GAUSS_LEGENDRE", 2, 20, 1e-7),
        ("GAUSS_LEGENDRE", 3, 10, 1e-9),
        ("RADAU_IIA", 3, 20, 1e-8)])
    def test_vs_scipy(self, colloc, ns, steps, tol):
        step = make_step_fn(f_expl=pendulum_ode, nx=4, opts=SimOpts(
            integrator_type="IRK", num_stages=ns, num_steps=steps,
            newton_iter=5, collocation_type=colloc))
        xn = step(jnp.asarray(X0), jnp.asarray(U0), None, 0.0, DT)
        np.testing.assert_allclose(np.asarray(xn), scipy_ref(), atol=tol)

    def test_forward_sens_implicit_diff(self):
        step = make_step_fn(f_expl=pendulum_ode, nx=4, opts=SimOpts(
            integrator_type="IRK", num_stages=3, num_steps=5,
            newton_iter=8))
        out = simulate(step, jnp.asarray(X0), jnp.asarray(U0), dt=DT,
                       sens_adj=True, sens_hess=True,
                       seed_adj=jnp.ones(4))
        # forward sens vs finite differences
        eps = 1e-6
        xu0 = np.concatenate([X0, U0])
        for j in range(5):
            d = np.zeros(5); d[j] = eps
            fp = np.asarray(step(jnp.asarray((xu0 + d)[:4]),
                                 jnp.asarray((xu0 + d)[4:]), None, 0.0, DT))
            fm = np.asarray(step(jnp.asarray((xu0 - d)[:4]),
                                 jnp.asarray((xu0 - d)[4:]), None, 0.0, DT))
            np.testing.assert_allclose(np.asarray(out.S_forw[:, j]),
                                       (fp - fm) / (2 * eps), atol=1e-5)
        # adjoint == seed' @ S_forw
        np.testing.assert_allclose(
            np.asarray(out.S_adj), np.ones(4) @ np.asarray(out.S_forw),
            atol=1e-10)
        # Hessian is symmetric
        np.testing.assert_allclose(np.asarray(out.S_hess),
                                   np.asarray(out.S_hess).T, atol=1e-8)


class TestDae:
    def test_pendulum_index1_dae(self):
        """ODE augmented with an algebraic equation z = ||xdot_v||^2-style;
        checks DAE machinery (reference sim_test_dae.cpp pattern)."""
        def f_impl(xdot, x, z, u, p, t):
            ode = xdot - pendulum_ode(x, u, p, t)
            alg = z - jnp.array([x[2] ** 2 + x[3] ** 2])
            return jnp.concatenate([ode, alg])

        from acados_tpu.sim.irk import make_irk_step
        step = make_irk_step(f_impl, nx=4, nz=1, num_stages=3, num_steps=20,
                             newton_iter=6, collocation="RADAU_IIA")
        xn, zn = step(jnp.asarray(X0), jnp.asarray(U0), None, 0.0, DT)
        x_ref = scipy_ref()
        np.testing.assert_allclose(np.asarray(xn), x_ref, atol=1e-7)
        np.testing.assert_allclose(np.asarray(zn)[0],
                                   x_ref[2] ** 2 + x_ref[3] ** 2, atol=1e-6)


class TestGnsf:
    """GNSF structure-exploiting integrator (reference sim_gnsf.c:2160 +
    symbolic detection gnsf.py:758 — here detected numerically)."""

    def test_detects_pendulum_structure(self):
        from acados_tpu.sim.gnsf import detect_gnsf_structure
        mdl = detect_gnsf_structure(pendulum_ode, nx=4, nu=1)
        assert mdl is not None
        # positions integrate velocities linearly -> a nontrivial split
        assert mdl.n_out < 4 and mdl.n_out > 0
        assert mdl.nx1 + mdl.nx2 == 4

    def test_matches_scipy(self):
        step = make_step_fn(f_expl=pendulum_ode, nx=4, nu=1,
                            opts=SimOpts(integrator_type="GNSF",
                                         num_stages=4, num_steps=20,
                                         newton_iter=6))
        xn = step(jnp.asarray(X0), jnp.asarray(U0), None, 0.0, DT)
        np.testing.assert_allclose(np.asarray(xn), scipy_ref(), atol=1e-8)

    def test_matches_irk_exactly_linear(self):
        """Fully linear ODE -> pure linear-output system (n_out == 0)."""
        A = jnp.array([[0.0, 1.0], [-4.0, -0.4]])
        B = jnp.array([[0.0], [1.0]])
        flin = lambda x, u, p, t: A @ x + B @ u
        from acados_tpu.sim.gnsf import detect_gnsf_structure
        mdl = detect_gnsf_structure(flin, nx=2, nu=1)
        assert mdl.n_out == 0 and mdl.nx2 == 2
        g = make_step_fn(f_expl=flin, nx=2, nu=1,
                         opts=SimOpts(integrator_type="GNSF", num_stages=3))
        i = make_step_fn(f_expl=flin, nx=2, nu=1,
                         opts=SimOpts(integrator_type="IRK", num_stages=3,
                                      newton_iter=6))
        x0, u0 = jnp.array([1.0, 0.5]), jnp.array([0.3])
        np.testing.assert_allclose(np.asarray(g(x0, u0, None, 0.0, 0.1)),
                                   np.asarray(i(x0, u0, None, 0.0, 0.1)),
                                   atol=1e-12)

    def test_non_gnsf_falls_back_none(self):
        """A globally-nonlinear model with all states coupled nonlinearly
        still verifies (phi captures everything)."""
        f = lambda x, u, p, t: jnp.stack([jnp.sin(x[1]) * x[0],
                                          jnp.cos(x[0]) + u[0]])
        from acados_tpu.sim.gnsf import detect_gnsf_structure
        mdl = detect_gnsf_structure(f, nx=2, nu=1)
        assert mdl is not None and mdl.nx1 == 2


class TestLiftedIrk:
    """Lifted IRK (reference sim_lifted_irk_integrator.c:655): one Newton
    per call on persisted stage variables; converges to IRK across calls."""

    def test_converges_to_irk_fixed_point(self):
        from acados_tpu.sim.irk import make_irk_step, implicit_from_explicit
        from acados_tpu.sim.lifted_irk import make_lifted_irk_step
        fi = implicit_from_explicit(pendulum_ode)
        irk = make_irk_step(fi, nx=4, num_stages=3, newton_iter=8)
        x_ref = np.asarray(irk(jnp.asarray(X0), jnp.asarray(U0),
                               None, 0.0, DT)[0])
        lstep, K0 = make_lifted_irk_step(fi, nx=4, num_stages=3)
        K = jnp.asarray(K0)
        errs = []
        for _ in range(10):
            x, K = lstep(jnp.asarray(X0), jnp.asarray(U0), None, 0.0, DT, K)
            errs.append(np.abs(np.asarray(x) - x_ref).max())
        assert errs[-1] < 1e-10          # fixed point == converged IRK
        assert errs[0] > errs[-1]        # and it actually iterated there

    def test_sim_solver_lifted(self):
        from acados_tpu.interface.sim_solver import (AcadosSim,
                                                     AcadosSimSolver)
        from acados_tpu.interface.acados_ocp import AcadosModel
        sim = AcadosSim()
        sim.model = AcadosModel(name="pend", x=4, u=1,
                                f_expl_expr=pendulum_ode)
        sim.solver_options.T = DT
        sim.solver_options.integrator_type = "LIFTED_IRK"
        sim.solver_options.num_stages = 3
        solver = AcadosSimSolver(sim)
        for _ in range(10):
            xn = solver.simulate(x=X0, u=U0)
        np.testing.assert_allclose(xn, scipy_ref(), atol=1e-5)
        assert solver.get("S_forw").shape == (4, 5)


class TestSimBatchSolver:
    def test_batch_equals_serial(self):
        """Reference test_batch_solvers.py pattern for the sim layer."""
        from acados_tpu import (AcadosModel, AcadosSim, AcadosSimBatchSolver,
                                AcadosSimSolver)
        sim = AcadosSim()
        sim.model = AcadosModel(name="p", x=4, u=1,
                                f_expl_expr=pendulum_ode)
        sim.solver_options.T = 0.1
        bs = AcadosSimBatchSolver(sim, 8)
        rng = np.random.default_rng(0)
        X = rng.normal(size=(8, 4))
        U = rng.normal(size=(8, 1))
        xn = bs.simulate(X, U)
        one = AcadosSimSolver(sim)
        for i in (0, 3, 7):
            np.testing.assert_allclose(xn[i], one.simulate(x=X[i], u=U[i]),
                                       atol=1e-12)
        assert bs.get("S_forw").shape == (8, 4, 5)


class TestIrkKronPath:
    """2-stage frozen-Jacobian Kronecker split (irk.make_irk_step_jac
    kron_path): one (nx, nx) block-determinant inverse replaces the
    (2nx, 2nx) stage-system factorization. Must match the generic
    jac_reuse path it substitutes (reference jac_reuse semantics,
    sim_common.h:139; staged factorization sim_irk_integrator.c:1545)."""

    def _fns(self, num_steps=2, newton_iter=3):
        from acados_tpu.sim.integrator import normalize_dynamics
        from acados_tpu.sim.irk import (implicit_from_explicit,
                                        make_irk_step_jac)
        fi = implicit_from_explicit(normalize_dynamics(pendulum_ode))
        kw = dict(nx=4, nz=0, num_stages=2, num_steps=num_steps,
                  newton_iter=newton_iter, jac_reuse=True)
        gen = make_irk_step_jac(fi, **kw, kron_path=False)
        kro = make_irk_step_jac(fi, **kw, kron_path=True,
                                explicit_ode=True)
        return gen, kro

    def test_matches_generic_jac_reuse(self):
        gen, kro = self._fns()
        x = jnp.asarray([0.1, 2.9, 0.3, -0.2])
        u = jnp.asarray([3.0])
        p = jnp.zeros(0)
        xg, Ag, Bg = gen(x, u, p, 0.0, 0.1)
        xk, Ak, Bk = kro(x, u, p, 0.0, 0.1)
        # identical root (the residual is exact in both; only the Newton
        # preconditioner differs)
        np.testing.assert_allclose(xk, xg, atol=1e-10)
        # sensitivities agree within the O(h * stage-Jacobian-spread)
        # error class jac_reuse itself accepts
        np.testing.assert_allclose(Ak, Ag, atol=2e-4)
        np.testing.assert_allclose(Bk, Bg, atol=2e-4)

    def test_converges_to_exact_root(self):
        from acados_tpu.sim.integrator import normalize_dynamics
        from acados_tpu.sim.irk import (implicit_from_explicit,
                                        make_irk_step_jac)
        fi = implicit_from_explicit(normalize_dynamics(pendulum_ode))
        ref = make_irk_step_jac(fi, nx=4, nz=0, num_stages=2,
                                num_steps=2, newton_iter=25,
                                jac_reuse=False, kron_path=False)
        _, kro = self._fns(newton_iter=10)
        x = jnp.asarray([0.0, 3.0, 0.1, 0.0])
        u = jnp.asarray([-2.0])
        p = jnp.zeros(0)
        xr, Ar, _ = ref(x, u, p, 0.0, 0.1)
        xk, Ak, _ = kro(x, u, p, 0.0, 0.1)
        np.testing.assert_allclose(xk, xr, atol=1e-12)
        np.testing.assert_allclose(Ak, Ar, atol=1e-4)

    def test_radau_tableau(self):
        """The block-determinant split holds for ANY 2-stage tableau,
        not just Gauss-Legendre."""
        from acados_tpu.sim.integrator import normalize_dynamics
        from acados_tpu.sim.irk import (implicit_from_explicit,
                                        make_irk_step_jac)
        fi = implicit_from_explicit(normalize_dynamics(pendulum_ode))
        kw = dict(nx=4, nz=0, num_stages=2, num_steps=1,
                  newton_iter=4, jac_reuse=True,
                  collocation="RADAU_IIA")
        gen = make_irk_step_jac(fi, **kw, kron_path=False)
        kro = make_irk_step_jac(fi, **kw, kron_path=True,
                                explicit_ode=True)
        x = jnp.asarray([0.05, 3.1, -0.1, 0.2])
        u = jnp.asarray([1.5])
        p = jnp.zeros(0)
        xg, Ag, Bg = gen(x, u, p, 0.0, 0.05)
        xk, Ak, Bk = kro(x, u, p, 0.0, 0.05)
        np.testing.assert_allclose(xk, xg, atol=1e-10)
        np.testing.assert_allclose(Ak, Ag, atol=2e-4)

    def test_rejects_bad_config(self):
        from acados_tpu.sim.integrator import normalize_dynamics
        from acados_tpu.sim.irk import (implicit_from_explicit,
                                        make_irk_step_jac)
        fi = implicit_from_explicit(normalize_dynamics(pendulum_ode))
        with pytest.raises(ValueError):
            make_irk_step_jac(fi, nx=4, nz=0, num_stages=3,
                              kron_path=True, explicit_ode=True)
        with pytest.raises(ValueError):
            make_irk_step_jac(fi, nx=4, nz=0, num_stages=2,
                              kron_path=True, explicit_ode=False)
