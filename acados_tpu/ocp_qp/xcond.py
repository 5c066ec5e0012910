"""Condensing QP front-end: {none, partial, full} x backend dispatch.

TPU-native counterpart of the reference's xcond solver
(/root/reference/acados/ocp_qp/ocp_qp_xcond_solver.c:551-716): the single QP
entry the NLP layer calls, wrapping condense -> backend solve -> expand.
Backends: the Riccati IPM (ocp_qp/ipm.py, HPIPM analog) for OCP-structured
QPs, the dense IPM (dense_qp/ipm.py) after full condensing.
"""
from __future__ import annotations

from functools import partial

import jax

from acados_tpu.dense_qp.ipm import solve_dense_qp
from acados_tpu.ocp_qp.condensing import (condense_warm, partial_condense,
                                          partial_expand)
from acados_tpu.ocp_qp.data import OcpQp, OcpQpSol
from acados_tpu.ocp_qp.full_condensing import full_condense, full_expand
from acados_tpu.ocp_qp.ipm import IpmOpts, solve_ocp_qp


def resolve_cond_N(N: int, cond_N) -> int | None:
    """Clamp the requested partial-condensing horizon to [1, N-1].

    Non-divisor cond_N is supported via HPIPM's remainder rule
    (d_part_cond_qp_compute_block_size, ocp_qp_partial_condensing.c:
    172-177): ragged blocks are padded to the uniform maximum width with
    inert stages (condensing.pad_qp_to_blocks) so XLA keeps static
    shapes."""
    if cond_N is None or cond_N >= N:
        return None
    return max(int(cond_N), 1)


@partial(jax.jit, static_argnames=("cond_N", "full_cond", "keep_rows",
                                   "cond_block_size"))
def solve_ocp_qp_xcond(qp: OcpQp, opts: IpmOpts = None, cond_N: int = None,
                       full_cond: bool = False,
                       warm: OcpQpSol | None = None, backend=None,
                       keep_rows=None, cond_block_size=None):
    """Solve an OcpQp through the condensing front-end.

    cond_N: partial-condensing horizon (must divide N; use resolve_cond_N);
      None = no condensing (direct Riccati IPM, HPIPM's N2 == N default).
    full_cond: condense to a dense QP and solve with the dense IPM.
    backend: OCP-QP backend callable (qp, opts, warm=) for the (partially
      condensed) QP; None = the Riccati IPM (reference: the xcond wrapper
      composes {condensing} x {any backend}, ocp_qp_xcond_solver.c:551-573).
    Returns (OcpQpSol in original coordinates, IpmInfo).
    """
    if opts is None:
        opts = IpmOpts()
    if backend is None:
        backend = solve_ocp_qp
    if full_cond:
        dense, cache = full_condense(qp)
        sol_d, info = solve_dense_qp(dense, opts)
        return full_expand(qp, cache, sol_d), info
    if cond_block_size is not None:
        # explicit per-block sizes (reference qp_solver_cond_block_size)
        cond_N = len(cond_block_size)
        if len(set(cond_block_size)) == 1 \
                and cond_N * cond_block_size[0] == qp.dims.N:
            cond_block_size = None  # uniform -> plain path below
    if cond_N is None or cond_N >= qp.dims.N:
        return backend(qp, opts, warm=warm)
    if cond_block_size is not None or qp.dims.N % cond_N != 0:
        # ragged blocks (HPIPM remainder rule): pad to uniform width
        # with inert stages, condense uniformly, un-pad the solution
        from acados_tpu.ocp_qp.condensing import (pad_qp_to_blocks,
                                                  pad_warm_to_blocks,
                                                  unpad_sol)
        qp_p, maps = pad_qp_to_blocks(qp, cond_N,
                                      block_sizes=cond_block_size)
        warm_p = None if warm is None else pad_warm_to_blocks(warm, maps)
        # keep_rows carries through: padding nodes are "path" nodes whose
        # rows are fully masked, so the static real-row counts still hold
        qp_c, cache = partial_condense(qp_p, cond_N, keep_rows=keep_rows)
        warm_c = None if warm_p is None else condense_warm(
            warm_p, cond_N, keep_rows=keep_rows)
        sol_c, info = backend(qp_c, opts, warm=warm_c)
        sol_p = partial_expand(qp_p, cache, sol_c, keep_rows=keep_rows)
        return unpad_sol(sol_p, maps), info
    qp_c, cache = partial_condense(qp, cond_N, keep_rows=keep_rows)
    warm_c = None if warm is None else condense_warm(warm, cond_N,
                                                    keep_rows=keep_rows)
    sol_c, info = backend(qp_c, opts, warm=warm_c)
    return partial_expand(qp, cache, sol_c, keep_rows=keep_rows), info
