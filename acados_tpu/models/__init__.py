from acados_tpu.models.pendulum import (export_pendulum_model,
                                        make_pendulum_ocp, pendulum_ode)

__all__ = ["export_pendulum_model", "make_pendulum_ocp", "pendulum_ode"]
