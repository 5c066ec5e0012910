"""Multi-host initialization + cross-host reductions for batch-parallel
solving.

The reference has NO distributed story (SURVEY.md §2.9: single-process
OpenMP only) — this module is the headroom the TPU build adds on top:
a thin, idempotent wrapper over `jax.distributed.initialize` plus the
global-mesh construction and the handful of cross-host reductions a
fleet of MPC solvers actually needs (global convergence counts, residual
maxima, throughput sums). Collectives ride ICI within a slice and DCN
across slices; the solver math itself stays collective-free (instances
are independent — see parallel/mesh.py).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from acados_tpu.parallel.mesh import BATCH_AXIS, make_batch_mesh

_initialized = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Idempotent multi-host runtime init.

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) all args are
    auto-detected; explicit args support DCN-connected CPU/GPU fleets.
    Returns the process count (1 when single-process / already local).
    """
    global _initialized
    if _initialized:
        return jax.process_count()
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    # some launchers export a human-readable warning string here; only a
    # comma-separated host list counts
    valid_hosts = hostnames and " " not in hostnames
    want_multi = (coordinator_address is not None
                  or os.environ.get("JAX_COORDINATOR_ADDRESS")
                  or valid_hosts)
    if want_multi:
        kw = {}
        if coordinator_address is not None:
            kw["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kw["num_processes"] = num_processes
        if process_id is not None:
            kw["process_id"] = process_id
        try:
            jax.distributed.initialize(**kw)
        except (RuntimeError, ValueError):
            # backend already initialized (an interactive session touched
            # jax.devices() first) or the auto-detected env was bogus ->
            # stay single-process; true multi-host callers must init
            # before any jax call with explicit arguments
            pass
    _initialized = True
    return jax.process_count()


def global_batch_mesh():
    """1-D batch mesh over every addressable device of every host."""
    return make_batch_mesh(jax.devices())


def process_local_batch_slice(n_batch_global: int):
    """Half-open [start, stop) of the global batch this process feeds
    (for `jax.make_array_from_process_local_data`-style data loading)."""
    n = jax.process_count()
    per = -(-n_batch_global // n)
    start = jax.process_index() * per
    return start, min(start + per, n_batch_global)


def all_reduce_status_counts(statuses) -> np.ndarray:
    """Global histogram of solver status codes across hosts: the fleet
    health signal (reference status contract, utils/types.h:77-84)."""
    import jax.numpy as jnp
    statuses = jnp.asarray(statuses)
    local = jnp.stack([jnp.sum(statuses == s) for s in range(8)])
    if jax.process_count() == 1:
        return np.asarray(local)
    # psum over a trivial mesh-wide pmap is overkill; use the
    # multihost_utils global-sum helper (DCN-safe)
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.process_allgather(local).sum(axis=0))


def global_max_residual(res) -> float:
    """Max KKT residual across every instance on every host."""
    import jax.numpy as jnp
    local = float(jnp.max(jnp.asarray(res)))
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils
    return float(np.max(multihost_utils.process_allgather(
        jnp.asarray([local]))))
