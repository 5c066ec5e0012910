"""Differentiable MPC: gradients through the solver via the IFT.

Reference analog: eval_adjoint_solution_sensitivity /
eval_solution_sensitivity (acados_ocp_solver.py; ocp_nlp_common.c:4039,
4108) used for RL / policy-gradient / learning-based MPC. Here the solve
is wrapped with jax.custom_vjp (ocp_nlp/sensitivity.py), so the MPC layer
composes with jax.grad like any other differentiable function.
"""
import _example_env  # noqa: F401  (path + CPU float64 setup)
import numpy as np

import jax
import jax.numpy as jnp

from acados_tpu.interface.builder import build_ocp, data_to_jax
from acados_tpu.models.pendulum import make_pendulum_ocp
from acados_tpu.ocp_nlp.sensitivity import make_diff_solver
from acados_tpu.ocp_nlp.sqp import SqpOpts, init_iterate


def main():
    ocp = make_pendulum_ocp(N=20, dtype="float64")
    form, data_np, _ = build_ocp(ocp)
    data = data_to_jax(data_np, jnp.float64)
    x0 = np.array([0.0, np.pi, 0.0, 0.0])
    init = init_iterate(form, jnp.float64,
                        x_traj=np.tile(x0, (form.N + 1, 1)))
    solve = make_diff_solver(form, SqpOpts(max_iter=50))

    # stage-10 control: away from the |u| <= 80 bound, so the
    # sensitivity is informative (at an active bound it would be zero)
    def first_control(p_data):
        _, u = solve(p_data, init)
        return u[10, 0]

    u0 = first_control(data)
    grad = jax.grad(first_control)(data)
    # gradient of u0 wrt the stage-0 measurement (through lbx_0/ubx_0):
    g_x0 = np.asarray(grad.lb_0 + grad.ub_0)[:4]
    print("u10 =", float(u0))
    print("du10/dx0 =", g_x0)

    # check against finite differences on one entry
    eps = 1e-5
    d2 = data.replace(lb_0=data.lb_0.at[1].add(eps),
                      ub_0=data.ub_0.at[1].add(eps))
    fd = (first_control(d2) - u0) / eps
    print("finite-difference check (entry 1):", float(fd), "vs",
          g_x0[1])
    assert abs(float(fd) - g_x0[1]) < 1e-2 * max(1.0, abs(g_x0[1]))
    return g_x0


if __name__ == "__main__":
    main()
