"""Domain-decomposed MD on a 2-D (Pa x Pb) pencil mesh.

Since round 3 this is a thin front over the generalized brick engine
(parallel/mdbrick.py) with a (Pa, Pb) mesh: two staged ppermute halo
phases (corner ghosts ride phase B — LAMMPS comm_brick's staged-swap
scheme), the dense-grid scatter-free fast path per shard, global
Nose-Hoover, psum'd virial. Pencils lift the 1-D ring's
``width / n_dev >= cutoff`` ceiling (parallel/brick.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..data.graph import Atoms
from .mdbrick import BrickMolecularDynamics


class ParallelMolecularDynamics2D(BrickMolecularDynamics):
    """NVE/NVT MD over a (Pa x Pb) pencil mesh (two-phase halos)."""

    def __init__(
        self,
        model,
        params,
        atoms: Atoms,
        mesh_shape: Tuple[int, int],
        axes: Tuple[int, int] = (0, 1),
        dt_fs: float = 2.0,
        temperature_K: float = 300.0,
        ensemble: str = 'nvt',
        tdamp_fs: Optional[float] = None,
        skin: float = 1.0,
        rebuild_every: int = 10,
        seed: int = 0,
        dtype=jnp.float32,
        use_pallas: Optional[bool] = None,
    ):
        assert len(mesh_shape) == 2
        super().__init__(
            model, params, atoms, mesh_shape=tuple(mesh_shape),
            axes=tuple(axes), dt_fs=dt_fs, temperature_K=temperature_K,
            ensemble=ensemble, tdamp_fs=tdamp_fs, skin=skin,
            rebuild_every=rebuild_every, seed=seed, dtype=dtype,
            use_pallas=use_pallas,
        )
