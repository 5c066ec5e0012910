"""Fully on-device closed-loop NMPC: controller + plant inside ONE jit.

The production deployment pattern for this framework (and the shape the
bench's `device_loop_rti` entry measures): instead of dispatching one
solver call per control sample from the host — each call pays the
host->device dispatch latency — the whole closed loop (RTI solve ->
apply u0 -> plant step -> new measurement) is a `jax.lax.scan` on the
device. A batch of B independent loops (scenario MPC / RL rollouts /
domain-randomized plants) is one `jax.vmap` around the scan.

Reference counterpart: the closed-loop getting-started example
(/root/reference/examples/acados_python/getting_started/
minimal_example_closed_loop.py) runs one solve per python loop step —
fine on CPU where a call costs microseconds; on an accelerator the
on-device loop is the idiomatic equivalent.
"""
import _example_env  # noqa: F401  (path + CPU float64 setup)
import jax
import jax.numpy as jnp
import numpy as np

from acados_tpu.interface.builder import (StageLayout, build_ocp,
                                          data_to_jax)
from acados_tpu.interface.solver import _sqp_opts_from
from acados_tpu.models.pendulum import make_pendulum_ocp
from acados_tpu.ocp_nlp.sqp import init_iterate, make_sqp_solver
from acados_tpu.sim.integrator import SimOpts, make_step_fn


def main(n_steps=60, B=4):
    ocp = make_pendulum_ocp(N=20, Tf=1.0, dtype="float64",
                            nlp_solver_type="SQP_RTI")
    form, data_np, _ = build_ocp(ocp)
    opts = _sqp_opts_from(ocp)
    solve = make_sqp_solver(form, opts)           # one RTI call

    # plant: finer integration than the controller's model
    plant_step = make_step_fn(
        f_expl=ocp.model.f_expl_expr, nx=form.nx,
        opts=SimOpts(integrator_type="ERK", num_stages=4, num_steps=4))
    dt_ctrl = 1.0 / 20
    lay = StageLayout(form.con_0)
    nbx0 = form.con_0.nbx
    sl = slice(lay.off_bx, lay.off_bx + nbx0)

    data1 = data_to_jax(data_np, jnp.float64)

    def closed_loop(x0):
        """One closed-loop rollout, fully traced: scan over samples."""
        init = init_iterate(form, jnp.float64,
                            x_traj=jnp.tile(x0, (form.N + 1, 1)))

        def sample(carry, _):
            x, it, data = carry
            # inject the measurement into the stage-0 bounds (the
            # feedback phase's x0 update)
            data = data.replace(lb_0=data.lb_0.at[sl].set(x[:nbx0]),
                                ub_0=data.ub_0.at[sl].set(x[:nbx0]))
            # two RTI iterations per sample — the counterpart of the
            # AS-RTI level-A config in minimal_example_closed_loop.py
            # (one advanced-step QP + the feedback QP per sample); a
            # single iteration is too inexact for this aggressive
            # swing-up at 20 Hz and spirals past the upright
            it, stats = solve(data, it)
            it, stats = solve(data, it)
            u0 = it.u[0]
            x_next = plant_step(x, u0, data.p[0], jnp.asarray(0.0),
                                jnp.asarray(dt_ctrl))
            return (x_next, it, data), (x, u0, stats.res_stat)

        (_, _, _), (xs, us, res) = jax.lax.scan(
            sample, (x0, init, data1), None, length=n_steps)
        return xs, us, res

    # a batch of B loops from perturbed initial states, one program
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.array([0.0, np.pi, 0.0, 0.0])[None, :]
                      + rng.normal(0, 0.05, (B, 4)))
    xs, us, res = jax.jit(jax.vmap(closed_loop))(x0s)

    theta_final = np.asarray(xs)[:, -1, 1]
    print(f"{B} on-device closed loops x {n_steps} samples:")
    print("  final theta per loop:", np.round(theta_final, 4))
    print("  final RTI residuals :",
          np.round(np.asarray(res)[:, -1], 6))
    assert np.all(np.abs(theta_final) < 1e-2), "swing-up failed"
    return xs, us


if __name__ == "__main__":
    main()
