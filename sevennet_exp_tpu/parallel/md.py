"""Domain-decomposed MD over a 1-D device ring (slab decomposition).

Since round 3 this is a thin front over the generalized brick engine
(parallel/mdbrick.py) with a (n_devices,) mesh: one staged ppermute
halo phase, the dense-grid scatter-free fast path per shard, global
Nose-Hoover, psum'd virial. Kept as its own entry point because the
slab ring is the common case and the reference's parallel pair style
is the 1-D-per-rank analog (pair_e3gnn_parallel.cpp + comm_brick.cpp).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..data.graph import Atoms
from .mdbrick import BrickMolecularDynamics


class ParallelMolecularDynamics(BrickMolecularDynamics):
    """NVE/NVT MD over an n-device ring (1-D slab decomposition)."""

    def __init__(
        self,
        model,
        params,
        atoms: Atoms,
        n_devices: Optional[int] = None,
        axis: int = 0,
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
        n = n_devices or len(jax.devices())
        assert n >= 2, 'use md.engine.MolecularDynamics for 1 device'
        super().__init__(
            model, params, atoms, mesh_shape=(n,), axes=(axis,),
            dt_fs=dt_fs, temperature_K=temperature_K, ensemble=ensemble,
            tdamp_fs=tdamp_fs, skin=skin, rebuild_every=rebuild_every,
            seed=seed, dtype=dtype, use_pallas=use_pallas,
        )
