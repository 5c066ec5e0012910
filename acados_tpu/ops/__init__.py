"""Pallas TPU kernels for the hot small-matrix linear algebra.

L0 of the stack — the BLASFEO replacement (SURVEY.md §2.4): where the
reference hand-writes panel-major assembly kernels for stage-blocked
small-dense algebra, these Pallas kernels lay the *batch* axis along the
TPU lanes so every (tiny) matrix entry op is a full-width VPU vector op
over problem instances. See `batched_chol`.
"""
from acados_tpu.ops.batched_chol import (chol_factor_batched,
                                         chol_solve_batched,
                                         chol_factor_solve_batched)

__all__ = ["chol_factor_batched", "chol_solve_batched",
           "chol_factor_solve_batched"]
