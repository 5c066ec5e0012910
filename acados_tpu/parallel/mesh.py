"""Device-mesh utilities: batch sharding over chips.

The reference's only multi-instance mechanism is an OpenMP parallel-for over
solver capsules on one shared-memory host (acados_solver.in.c:3232,
SURVEY.md §2.9). The TPU-native replacement: the batch axis of a vmapped
solve is sharded over a 1-D `jax.sharding.Mesh` of all available devices
(ICI-connected chips, or multi-host via jax.distributed), and the jitted
solve runs SPMD — cross-instance reductions do not exist in the math (each
OCP instance is independent), so the only collectives XLA inserts are for
the caller's own post-processing.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_batch_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices for batch-parallel solves."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=(BATCH_AXIS,))


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree with the leading axis split over the mesh."""
    sharding = NamedSharding(mesh, P(BATCH_AXIS))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def batch_pad(n_batch: int, n_devices: int) -> int:
    """Padded batch size divisible by the device count."""
    return int(-(-n_batch // n_devices) * n_devices)
