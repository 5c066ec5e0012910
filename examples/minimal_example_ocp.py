"""Getting-started NMPC: pendulum-on-cart swing-up.

Translation of the reference getting-started example
(/root/reference/examples/acados_python/getting_started/
minimal_example_ocp.py): NONLINEAR_LS cost, |u| <= 80, N = 20, Tf = 1 s.
Run on CPU (float64) by default; set dtype="float32" for the TPU
production path.
"""
import _example_env  # noqa: F401  (path + CPU float64 setup)
import numpy as np

from acados_tpu import AcadosOcpSolver
from acados_tpu.models.pendulum import make_pendulum_ocp


def main():
    ocp = make_pendulum_ocp(N=20, Tf=1.0, dtype="float64",
                            nlp_solver_type="SQP")
    solver = AcadosOcpSolver(ocp)

    status = solver.solve()
    assert status == 0, f"solve failed with status {status}"
    solver.print_statistics()

    x_traj = np.array([solver.get(k, "x") for k in range(ocp.solver_options
                                                         .N_horizon + 1)])
    u_traj = np.array([solver.get(k, "u") for k in range(ocp.solver_options
                                                         .N_horizon)])
    print("initial state:", x_traj[0])
    print("final state:  ", x_traj[-1])
    print("max |u|:      ", np.abs(u_traj).max())
    assert np.abs(x_traj[-1][1]) < 0.2  # pendulum near upright
    assert np.abs(u_traj).max() <= 80.0 + 1e-6
    return x_traj, u_traj


if __name__ == "__main__":
    main()
