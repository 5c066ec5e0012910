"""acados_tpu: TPU-native nonlinear optimal-control (NMPC/MHE) framework.

A from-scratch JAX/XLA reimplementation of the capabilities of acados
(reference mounted at /root/reference): SQP(-RTI) solvers over
multiple-shooting OCPs, embedded RK integrators with autodiff
sensitivities, and a Riccati-based interior-point OCP-QP solver — built
batch-first (vmap) and mesh-sharded for TPU.

Public API mirrors the reference's Python package
(interfaces/acados_template/acados_template/__init__.py:31-56).
"""

from acados_tpu.interface.acados_ocp import (AcadosModel, AcadosOcp,
                                             AcadosOcpConstraints,
                                             AcadosOcpCost, AcadosOcpDims,
                                             AcadosOcpOptions)
from acados_tpu.interface.batch_solver import AcadosOcpBatchSolver
from acados_tpu.interface.iterate import (AcadosOcpFlattenedBatchIterate,
                                          AcadosOcpFlattenedIterate,
                                          AcadosOcpIterate)
from acados_tpu.interface.multiphase import AcadosMultiphaseOcp
from acados_tpu.interface.ocp_qp_solver import (AcadosOcpQp,
                                                AcadosOcpQpSolver)
from acados_tpu.interface.param_manager import (AcadosParam,
                                                AcadosParamManager)
from acados_tpu.interface.scipy_solver import AcadosScipyOcpSolver
from acados_tpu.interface.sim_solver import (AcadosSim, AcadosSimBatchSolver,
                                             AcadosSimOpts, AcadosSimSolver)
from acados_tpu.interface.solver import AcadosOcpSolver
from acados_tpu.interface.zoro import ZoroDescription
from acados_tpu.utils.types import ACADOS_INFTY, AcadosStatus

__version__ = "0.2.0"

__all__ = [
    "AcadosModel", "AcadosOcp", "AcadosOcpConstraints", "AcadosOcpCost",
    "AcadosOcpDims", "AcadosOcpOptions", "AcadosOcpSolver",
    "AcadosOcpBatchSolver", "AcadosMultiphaseOcp", "AcadosScipyOcpSolver",
    "AcadosOcpIterate", "AcadosOcpFlattenedIterate",
    "AcadosOcpFlattenedBatchIterate", "ZoroDescription",
    "AcadosSim", "AcadosSimOpts", "AcadosSimSolver",
    "AcadosSimBatchSolver", "AcadosOcpQp", "AcadosOcpQpSolver",
    "AcadosParam", "AcadosParamManager",
    "ACADOS_INFTY", "AcadosStatus",
]
