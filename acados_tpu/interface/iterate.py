"""Iterate container classes + flat packing.

Reference: interfaces/acados_template/acados_template/acados_ocp_iterate.py
:40-342 — AcadosOcpIterate (per-stage arrays), AcadosOcpFlattenedIterate
(single flat vector per field), AcadosOcpFlattenedBatchIterate (leading
batch axis), with save/load and warm-start transfer between solvers.

The dual convention matches the internal NlpIterate: bound multipliers are
split per side (lam_l / lam_u over the unified constraint rows); `lam`
packs them reference-style as [lam_l_k, lam_u_k] per stage.
"""
from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass
class AcadosOcpIterate:
    """Per-stage iterate (reference class of the same name)."""

    x_traj: List[np.ndarray]
    u_traj: List[np.ndarray]
    pi_traj: List[np.ndarray]
    lam_traj: List[np.ndarray]   # per stage: [lam_l_k, lam_u_k]
    sl_traj: List[np.ndarray]
    su_traj: List[np.ndarray]

    def flatten(self) -> "AcadosOcpFlattenedIterate":
        return AcadosOcpFlattenedIterate(
            x=np.concatenate(self.x_traj),
            u=(np.concatenate(self.u_traj) if self.u_traj
               else np.zeros(0)),
            pi=(np.concatenate(self.pi_traj) if self.pi_traj
                else np.zeros(0)),
            lam=np.concatenate(self.lam_traj),
            sl=np.concatenate(self.sl_traj),
            su=np.concatenate(self.su_traj))


@dataclasses.dataclass
class AcadosOcpFlattenedIterate:
    """All stages concatenated per field (reference class)."""

    x: np.ndarray
    u: np.ndarray
    pi: np.ndarray
    lam: np.ndarray
    sl: np.ndarray
    su: np.ndarray

    def allclose(self, other, atol=1e-12) -> bool:
        return all(np.allclose(getattr(self, f.name),
                               getattr(other, f.name), atol=atol)
                   for f in dataclasses.fields(self))


@dataclasses.dataclass
class AcadosOcpFlattenedBatchIterate:
    """Batch variant: fields have shape (N_batch, n_field)
    (reference class; used by AcadosOcpBatchSolver)."""

    x: np.ndarray
    u: np.ndarray
    pi: np.ndarray
    lam: np.ndarray
    sl: np.ndarray
    su: np.ndarray
    N_batch: int


def iterate_from_arrays(it: dict) -> AcadosOcpIterate:
    """Internal iterate dict {x (N+1, nx), u (N, nu), pi, lam_l, lam_u,
    sl, su} -> AcadosOcpIterate."""
    N = it["u"].shape[0]
    lam = [np.concatenate([it["lam_l"][k], it["lam_u"][k]])
           for k in range(N + 1)]
    return AcadosOcpIterate(
        x_traj=[it["x"][k].copy() for k in range(N + 1)],
        u_traj=[it["u"][k].copy() for k in range(N)],
        pi_traj=[it["pi"][k].copy() for k in range(N)],
        lam_traj=lam,
        sl_traj=[it["sl"][k].copy() for k in range(N + 1)],
        su_traj=[it["su"][k].copy() for k in range(N + 1)])


def arrays_from_flat(flat: AcadosOcpFlattenedIterate, N, nx, nu,
                     nc) -> dict:
    """Flat iterate -> internal arrays dict (inverse of get_flat)."""
    lam = np.asarray(flat.lam, np.float64).reshape(N + 1, 2 * nc)
    return {
        "x": np.asarray(flat.x, np.float64).reshape(N + 1, nx),
        "u": np.asarray(flat.u, np.float64).reshape(N, nu),
        "pi": np.asarray(flat.pi, np.float64).reshape(N, nx),
        "lam_l": lam[:, :nc].copy(),
        "lam_u": lam[:, nc:].copy(),
        "sl": np.asarray(flat.sl, np.float64).reshape(N + 1, nc),
        "su": np.asarray(flat.su, np.float64).reshape(N + 1, nc),
    }
