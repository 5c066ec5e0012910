"""Dense QP layer: data model, dense IPM backend, full-condensing target.

Mirrors the reference layer `/root/reference/acados/dense_qp/` (HPIPM dense
types + qpOASES/DAQP/HPIPM/QORE/OOQP backends); here one TPU-batched dense
IPM serves as the backend.
"""
from acados_tpu.dense_qp.data import DenseQp, DenseQpSol
from acados_tpu.dense_qp.ipm import solve_dense_qp

__all__ = ["DenseQp", "DenseQpSol", "solve_dense_qp"]
