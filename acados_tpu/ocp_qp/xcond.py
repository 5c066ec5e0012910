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


def cond_x0_rows(nc: int, nx: int, M: int, keep_rows=None):
    """Static positions of the stage-0 x0 identity rows (original rows
    0..nx-1) in the condensed node-0 row vector.

    partial_condense maps stage-0 row r to condensed row r when
    r < npath, and to M*npath + (r - npath) otherwise (the stage-0
    extras block). Returns a tuple usable as solve_ocp_qp's x0_rows."""
    from acados_tpu.ocp_qp.condensing import _resolve_keep
    n0, npth, _ = _resolve_keep(nc, keep_rows)
    assert n0 >= nx, (n0, nx)
    return tuple(r if r < npth else M * npth + (r - npth)
                 for r in range(nx))


@partial(jax.jit, static_argnames=("cond_N", "full_cond", "keep_rows",
                                   "cond_block_size", "x0_fixed"))
def solve_ocp_qp_xcond(qp: OcpQp, opts: IpmOpts = None, cond_N: int = None,
                       full_cond: bool = False,
                       warm: OcpQpSol | None = None, backend=None,
                       keep_rows=None, cond_block_size=None,
                       x0_fixed: bool = False):
    """Solve an OcpQp through the condensing front-end.

    cond_N: partial-condensing horizon (must divide N; use resolve_cond_N);
      None = no condensing (direct Riccati IPM, HPIPM's N2 == N default).
    full_cond: condense to a dense QP and solve with the dense IPM.
    backend: OCP-QP backend callable (qp, opts, warm=) for the (partially
      condensed) QP; None = the Riccati IPM (reference: the xcond wrapper
      composes {condensing} x {any backend}, ocp_qp_xcond_solver.c:551-573).
    x0_fixed: eliminate the initial state THROUGH the condensing (the
      reference applies d_ocp_qp_reduce_eq_dof unconditionally before
      partial condensing, ocp_qp_partial_condensing.c:542): the condensed
      block-0 entry state IS x0, so the identity rows survive condensing
      at statically known positions (cond_x0_rows) and the condensed QP
      is solved with the eliminated-x0 Riccati path. Requires the default
      Riccati backend and the builder's x0 row layout.
    Returns (OcpQpSol in original coordinates, IpmInfo).
    """
    if opts is None:
        opts = IpmOpts()
    if backend is None:
        backend = solve_ocp_qp
    if x0_fixed and backend is not solve_ocp_qp:
        raise ValueError("x0_fixed requires the Riccati IPM backend")

    def run(qp_c, warm_c, x0_rows=None):
        if x0_fixed:
            return backend(qp_c, opts, warm=warm_c, x0_fixed=True,
                           x0_rows=x0_rows)
        return backend(qp_c, opts, warm=warm_c)

    if full_cond:
        if x0_fixed:
            raise ValueError("x0_fixed is not supported with full "
                             "condensing (the dense path has its own "
                             "state elimination)")
        dense, cache = full_condense(qp)
        sol_d, info = solve_dense_qp(dense, opts)
        return full_expand(qp, cache, sol_d), info
    if cond_block_size is not None:
        # explicit per-block sizes (reference qp_solver_cond_block_size)
        cond_N = len(cond_block_size)
        if len(set(cond_block_size)) == 1 \
                and cond_N * cond_block_size[0] == qp.dims.N:
            cond_block_size = None  # uniform -> plain path below
    nx = qp.dims.nx
    nc = qp.dims.nc
    if cond_N is None or cond_N >= qp.dims.N:
        return run(qp, warm)
    if cond_block_size is not None or qp.dims.N % cond_N != 0:
        # ragged blocks (HPIPM remainder rule): pad to uniform width
        # with inert stages, condense uniformly, un-pad the solution
        from acados_tpu.ocp_qp.condensing import (hpipm_block_sizes,
                                                  pad_qp_to_blocks,
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
        rows_c = None
        if x0_fixed:
            bs = (list(cond_block_size) if cond_block_size is not None
                  else hpipm_block_sizes(qp.dims.N, cond_N))
            rows_c = cond_x0_rows(nc, nx, max(bs), keep_rows)
        sol_c, info = run(qp_c, warm_c, rows_c)
        sol_p = partial_expand(qp_p, cache, sol_c, keep_rows=keep_rows)
        return unpad_sol(sol_p, maps), info
    qp_c, cache = partial_condense(qp, cond_N, keep_rows=keep_rows)
    warm_c = None if warm is None else condense_warm(warm, cond_N,
                                                    keep_rows=keep_rows)
    rows_c = (cond_x0_rows(nc, nx, qp.dims.N // cond_N, keep_rows)
              if x0_fixed else None)
    sol_c, info = run(qp_c, warm_c, rows_c)
    return partial_expand(qp, cache, sol_c, keep_rows=keep_rows), info
