"""Batched RTI with the preparation / feedback split — the deployment
shape of an RL / scenario-MPC pipeline.

Reference counterpart: the generated capsule's batched phase entries
(`batch_setup_qp_matrices_and_factorize`,
c_templates_tera/acados_solver.in.c:3246) driven per sample period:
prepare between samples (linearize + predictor QP for every instance in
one vmapped program), then inject the measured x0 batch and run the
feedback solve (warm-started from the predictor solutions).
"""
import numpy as np

import _example_env  # noqa: F401  (CPU f64 bootstrap)

from acados_tpu.interface.batch_solver import AcadosOcpBatchSolver  # noqa: E402
from acados_tpu.interface.sim_solver import (AcadosSim,  # noqa: E402
                                             AcadosSimSolver)
from acados_tpu.models.pendulum import make_pendulum_ocp  # noqa: E402

B, N, STEPS = 8, 10, 20

ocp = make_pendulum_ocp(N=N, dtype="float64")
ocp.solver_options.nlp_solver_type = "SQP_RTI"
bs = AcadosOcpBatchSolver(ocp, B)

sim = AcadosSim()
sim.model = ocp.model
sim.solver_options.T = float(ocp.solver_options.tf) / N
plant = AcadosSimSolver(sim)

rng = np.random.default_rng(0)
# a batch of perturbed initial states near the upright reference
x = (np.array([0.0, 0.2, 0.0, 0.0])[None, :]
     + rng.normal(0.0, 0.03, (B, 4)))

lay = bs._layout(0)
sl = slice(lay.off_bx, lay.off_bx + lay.nbx)
bs._data["lb_0"][:, sl] = x
bs._data["ub_0"][:, sl] = x
bs.set_flat("x", np.tile(x[:, None, :], (1, N + 1, 1)).reshape(B, -1))

for k in range(STEPS):
    bs.prepare()                  # between samples: linearize + factorize
    status = bs.feedback(x0=x)    # at the sample: inject x0, fast solve
    assert np.all(status == 0), status
    u0 = bs._iterate["u"][:, 0]
    x = np.stack([plant.simulate(x=x[i], u=u0[i]) for i in range(B)])

theta = np.abs(x[:, 1])
print(f"after {STEPS} steps: max |theta| = {theta.max():.4f} "
      f"(upright reference), time_feedback ~ {bs._time_tot * 1e3:.1f} ms")
assert np.all(theta < 0.05), theta
print("OK")
