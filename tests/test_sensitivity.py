"""Solution-sensitivity oracle tests: IFT sensitivities vs finite
differences of re-solves (reference pattern: test_sens_forw_p.py,
test_ocp_sens_p.py, eval_adjoint checks in test_batch_solvers.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from acados_tpu import AcadosModel, AcadosOcp, AcadosOcpSolver


def parametric_pendulum_ode(x, u, p, t=None):
    """Pendulum with parametric pendulum mass m = p[0] and length l = p[1]."""
    del t
    theta, v, dtheta = x[1], x[2], x[3]
    F = u[0]
    s, c = jnp.sin(theta), jnp.cos(theta)
    m, l = p[0], p[1]
    M, g = 1.0, 9.81
    denom = M + m - m * c * c
    a = (-m * l * s * dtheta * dtheta + m * g * c * s + F) / denom
    dd = (-m * l * c * s * dtheta * dtheta + F * c + (M + m) * g * s) \
        / (l * denom)
    return jnp.array([v, dtheta, a, dd])


def make_param_ocp(soft=False, N=20):
    ocp = AcadosOcp()
    m = AcadosModel()
    m.name = "param_pendulum"
    m.x, m.u, m.p = 4, 1, 2
    m.f_expl_expr = lambda x, u, p: parametric_pendulum_ode(x, u, p)
    ocp.model = m
    nx, nu = 4, 1

    ocp.solver_options.N_horizon = N
    ocp.solver_options.tf = 1.0
    Q = 2 * np.diag([1e3, 1e3, 1e-2, 1e-2])
    R = 2 * np.diag([1e-2])
    ocp.cost.cost_type = "NONLINEAR_LS"
    m.cost_y_expr = lambda x, u: jnp.concatenate([x, u])
    ocp.cost.yref = np.zeros(nx + nu)
    ocp.cost.W = np.block([[Q, np.zeros((nx, nu))],
                           [np.zeros((nu, nx)), R]])
    ocp.cost.cost_type_e = "NONLINEAR_LS"
    m.cost_y_expr_e = lambda x: x
    ocp.cost.yref_e = np.zeros(nx)
    ocp.cost.W_e = Q

    ocp.constraints.lbu = np.array([-50.0])
    ocp.constraints.ubu = np.array([50.0])
    ocp.constraints.idxbu = np.array([0])
    if soft:
        # soften a state bound on the cart position
        ocp.constraints.idxbx = np.array([0])
        ocp.constraints.lbx = np.array([-0.9])
        ocp.constraints.ubx = np.array([0.9])
        ocp.constraints.idxsbx = np.array([0])
        ocp.cost.Zl = np.array([1e3])
        ocp.cost.Zu = np.array([1e3])
        ocp.cost.zl = np.array([1e2])
        ocp.cost.zu = np.array([1e2])
    ocp.constraints.x0 = np.array([0.0, np.pi / 2, 0.0, 0.0])
    ocp.parameter_values = np.array([0.1, 0.8])

    ocp.solver_options.integrator_type = "ERK"
    ocp.solver_options.sim_method_num_steps = 1
    ocp.solver_options.nlp_solver_type = "SQP"
    ocp.solver_options.nlp_solver_max_iter = 200
    ocp.solver_options.tol = 1e-11
    ocp.solver_options.dtype = "float64"
    return ocp


def _resolve_xu(solver, p):
    for k in range(solver.N + 1):
        solver.set(k, "p", p)
    assert solver.solve() == 0
    x = np.stack([solver.get(k, "x") for k in range(solver.N + 1)])
    u = np.stack([solver.get(k, "u") for k in range(solver.N)])
    return x, u


@pytest.mark.parametrize("soft", [False, True])
def test_forward_param_sens_vs_fd(soft):
    ocp = make_param_ocp(soft=soft)
    solver = AcadosOcpSolver(ocp)
    p0 = np.array([0.1, 0.8])
    _resolve_xu(solver, p0)

    sens = solver.eval_param_sens(0)  # wrt pendulum mass at all stages
    base = solver.store_iterate_to_obj()

    eps = 1e-6
    fd = {}
    for sgn in (+1, -1):
        solver.load_iterate_from_obj(base)
        fd[sgn] = _resolve_xu(solver, p0 + sgn * np.array([eps, 0.0]))
    fd_x = (fd[+1][0] - fd[-1][0]) / (2 * eps)
    fd_u = (fd[+1][1] - fd[-1][1]) / (2 * eps)

    scale = max(1.0, np.abs(fd_x).max())
    np.testing.assert_allclose(sens["sens_x"], fd_x, atol=2e-4 * scale,
                               rtol=2e-4)
    np.testing.assert_allclose(sens["sens_u"], fd_u, atol=2e-4 *
                               max(1.0, np.abs(fd_u).max()), rtol=2e-4)


def test_initial_state_sens_vs_fd():
    """du0/dx0 (the MPC feedback gain) vs finite differences — the
    differentiable-MPC quantity (reference eval_solution_sensitivity
    with_respect_to='initial_state')."""
    ocp = make_param_ocp()
    solver = AcadosOcpSolver(ocp)
    x0 = np.array([0.0, np.pi / 2, 0.0, 0.0])
    solver.solve_for_x0(x0)
    base = solver.store_iterate_to_obj()

    sens_x, sens_u = solver.eval_solution_sensitivity(
        [0, 1], "initial_state")
    assert sens_x[0].shape == (4, 4)
    np.testing.assert_allclose(sens_x[0], np.eye(4), atol=1e-6)

    eps = 1e-6
    K_fd = np.zeros((1, 4))
    x1_fd = np.zeros((4, 4))
    for i in range(4):
        us, x1s = [], []
        for sgn in (+1, -1):
            solver.load_iterate_from_obj(base)
            e = np.zeros(4)
            e[i] = sgn * eps
            us.append(solver.solve_for_x0(x0 + e))
            x1s.append(solver.get(1, "x"))
        K_fd[:, i] = (us[0] - us[1]) / (2 * eps)
        x1_fd[:, i] = (x1s[0] - x1s[1]) / (2 * eps)
    np.testing.assert_allclose(sens_u[0], K_fd, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(sens_x[1], x1_fd, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("soft", [False, True])
def test_adjoint_forward_consistency(soft):
    """<seed, forward(dtheta)> == <adjoint(seed), dtheta> for random
    seeds/directions (exactness of the transpose)."""
    from acados_tpu.interface.builder import data_to_jax
    from acados_tpu.ocp_nlp.sensitivity import (KktFactor, SensOpts,
                                                adjoint_sensitivity,
                                                forward_sensitivity)
    import jax

    ocp = make_param_ocp(soft=soft)
    solver = AcadosOcpSolver(ocp)
    _resolve_xu(solver, np.array([0.1, 0.8]))

    kf = solver._kkt_factor()
    rng = np.random.default_rng(42)
    seed_x = rng.normal(size=(solver.N + 1, 4))
    seed_u = rng.normal(size=(solver.N, 1))

    grad = adjoint_sensitivity(kf, jnp.asarray(seed_x), jnp.asarray(seed_u))

    zero = jax.tree.map(jnp.zeros_like, data_to_jax(solver._data,
                                                    solver.dtype))
    dp = rng.normal(size=np.shape(solver._data["p"]))
    dyref = rng.normal(size=np.shape(solver._data["yref"]))
    d_data = zero.replace(p=jnp.asarray(dp), yref=jnp.asarray(dyref))
    dx, du, _, _, _ = forward_sensitivity(kf, d_data)

    lhs = float(np.sum(seed_x * np.asarray(dx))
                + np.sum(seed_u * np.asarray(du)))
    rhs = float(np.sum(np.asarray(grad.p) * dp)
                + np.sum(np.asarray(grad.yref) * dyref))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-8, atol=1e-10)


def test_adjoint_param_grad_vs_fd():
    """Gradient of a scalar function of the solution wrt p vs FD
    (the RL policy-gradient path, reference
    eval_adjoint_solution_sensitivity)."""
    ocp = make_param_ocp()
    solver = AcadosOcpSolver(ocp)
    p0 = np.array([0.1, 0.8])
    x, u = _resolve_xu(solver, p0)
    base = solver.store_iterate_to_obj()

    # J = u_0' u_0 / 2 -> seed_u at stage 0 = u_0
    grad = solver.eval_adjoint_solution_sensitivity(
        None, [(0, u[0])], with_respect_to="params_global")

    eps = 1e-6
    J = {}
    for sgn in (+1, -1):
        for i in range(2):
            solver.load_iterate_from_obj(base)
            e = np.zeros(2)
            e[i] = sgn * eps
            _, uu = _resolve_xu(solver, p0 + e)
            J[(sgn, i)] = 0.5 * float(uu[0] @ uu[0])
    fd = np.array([(J[(+1, i)] - J[(-1, i)]) / (2 * eps) for i in range(2)])
    np.testing.assert_allclose(grad, fd, rtol=5e-4, atol=1e-6)


def test_diff_solver_jax_grad():
    """jax.grad through make_diff_solver matches
    eval_adjoint_solution_sensitivity (solver as differentiable layer)."""
    import jax
    from acados_tpu.interface.builder import build_ocp, data_to_jax
    from acados_tpu.interface.solver import _sqp_opts_from
    from acados_tpu.ocp_nlp.sensitivity import make_diff_solver
    from acados_tpu.ocp_nlp.sqp import init_iterate

    ocp = make_param_ocp()
    solver = AcadosOcpSolver(ocp)
    p0 = np.array([0.1, 0.8])
    x, u = _resolve_xu(solver, p0)
    grad_ref = solver.eval_adjoint_solution_sensitivity(
        None, [(0, u[0])], with_respect_to="params_global")

    form, data_np, _ = build_ocp(ocp)
    solve_diff = make_diff_solver(form, _sqp_opts_from(ocp))
    data = data_to_jax(data_np, jnp.float64)
    init = init_iterate(form, jnp.float64,
                        x_traj=np.tile(np.array([0.0, np.pi / 2, 0, 0]),
                                       (form.N + 1, 1)))

    def loss(p_all):
        xs, us = solve_diff(data.replace(p=p_all), init)
        return 0.5 * us[0] @ us[0]

    g = jax.grad(loss)(data.p)
    np.testing.assert_allclose(np.asarray(g).sum(axis=0), grad_ref,
                               rtol=1e-6, atol=1e-10)


def test_batch_adjoint_matches_serial():
    """Batched adjoint sensitivities == per-instance serial ones
    (reference parity pattern, test_batch_solvers.py)."""
    from acados_tpu import AcadosOcpBatchSolver

    ocp = make_param_ocp(N=10)
    ocp.solver_options.tol = 1e-9
    B = 3
    batch = AcadosOcpBatchSolver(ocp, N_batch=B)
    serial = AcadosOcpSolver(ocp)
    x0s = [np.array([0.0, np.pi / 2, 0.0, 0.0]),
           np.array([0.1, 1.2, 0.0, 0.0]),
           np.array([0.0, 1.8, 0.1, 0.0])]
    for i, x0 in enumerate(x0s):
        v = batch.ocp_solvers[i]
        v.set(0, "lbx", x0)
        v.set(0, "ubx", x0)
        for k in range(11):
            v.set(k, "x", x0)
    assert np.all(batch.solve() == 0)

    seed_u = np.ones((B, 10, 1))
    grad_b = batch.eval_adjoint_solution_sensitivity(
        None, seed_u, with_respect_to="params_global")
    assert grad_b.shape == (B, 2)

    for i, x0 in enumerate(x0s):
        serial.reset()
        serial.set(0, "lbx", x0)
        serial.set(0, "ubx", x0)
        for k in range(11):
            serial.set(k, "x", x0)
        assert serial.solve() == 0
        g = serial.eval_adjoint_solution_sensitivity(
            None, np.ones((10, 1)), with_respect_to="params_global")
        np.testing.assert_allclose(grad_b[i], g, rtol=1e-8, atol=1e-12)


def test_optimal_value_gradient_vs_fd():
    """dV/dp and dV/dx0 via the envelope theorem (eval_lagr_grad_p,
    reference ocp_nlp_common.c:4181) vs central finite differences of
    the re-solved optimal cost."""
    ocp = make_param_ocp()
    solver = AcadosOcpSolver(ocp)
    p0 = np.array([0.1, 0.8])
    _resolve_xu(solver, p0)
    gp = solver.eval_and_get_optimal_value_gradient("p_global")
    gx0 = solver.eval_and_get_optimal_value_gradient("initial_state")
    base = solver.store_iterate_to_obj()

    def vcost(p, x0=None):
        solver.load_iterate_from_obj(base)
        for k in range(ocp.solver_options.N_horizon + 1):
            solver.set(k, "p", p)
        if x0 is not None:
            solver.set(0, "lbx", x0)
            solver.set(0, "ubx", x0)
        assert solver.solve() == 0
        return solver.get_cost()

    eps = 1e-5
    for i in range(2):
        e = np.zeros(2)
        e[i] = eps
        fd = (vcost(p0 + e) - vcost(p0 - e)) / (2 * eps)
        assert abs(gp[i] - fd) < 2e-3 * max(1.0, abs(fd)), (i, gp[i], fd)

    x0_base = np.array(ocp.constraints.x0, float)
    for i in range(2):  # first two states
        e = np.zeros_like(x0_base)
        e[i] = eps
        fd = (vcost(p0, x0_base + e) - vcost(p0, x0_base - e)) / (2 * eps)
        assert abs(gx0[i] - fd) < 2e-3 * max(1.0, abs(fd)), (i, gx0[i],
                                                             fd)
