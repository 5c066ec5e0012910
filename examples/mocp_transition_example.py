"""Multi-phase OCP with a dimension-changing transition.

Translation of the reference mocp transition example
(/root/reference/examples/acados_python/mocp_transition_example/main.py):
phase 0 = double integrator (nx=2), N=1 DISCRETE transition dropping the
velocity state, phase 2 = single integrator (nx=1) with weaker actuation.
"""
import _example_env  # noqa: F401  (path + CPU float64 setup)
import sys

sys.path.insert(0, "../tests")

import numpy as np  # noqa: E402

from acados_tpu.interface.solver import AcadosOcpSolver  # noqa: E402
from test_multiphase import N_H, X0, make_transition_mocp  # noqa: E402


def main():
    for t1 in (0.2, 0.4, 0.6):
        solver = AcadosOcpSolver(make_transition_mocp(t1))
        assert solver.solve() == 0
        xN = solver.get(2 * N_H + 1, "x")
        print(f"t1 = {t1:.1f}: cost {solver.get_cost():9.4f}, "
              f"terminal position {float(xN[0]):+.4f}")
    return solver


if __name__ == "__main__":
    main()
