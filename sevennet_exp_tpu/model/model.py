"""SevenNetModel: the whole network as one pure function.

Replaces the reference's AtomGraphSequential + trailing autograd module
(sevenn/nn/sequential.py, force_output.py:140-224): energies come from a
single forward trace, forces/stress from one jax.grad program w.r.t. edge
vectors -- the XLA-native equivalent of ForceStressOutputFromEdge.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import _keys as KEY
from ..ops.scatter import scatter_sum

Array = jnp.ndarray


@dataclass(frozen=True)
class SevenNetModel:
    layers: Tuple[Tuple[str, Any], ...]
    config: Dict[str, Any] = field(hash=False, compare=False)
    type_map: Dict[int, int] = field(hash=False, compare=False)
    cutoff: float = 0.0
    modal_map: Dict[str, int] = field(default_factory=dict, hash=False,
                                      compare=False)

    # -- parameters ----------------------------------------------------
    def init(self, key) -> Tuple[Dict, Dict]:
        """Returns (params, trainable_mask) pytrees keyed by layer name."""
        params, mask = {}, {}
        keys = jax.random.split(key, len(self.layers))
        for k, (name, layer) in zip(keys, self.layers):
            p, m = layer.init(k)
            if p:
                params[name] = p
                mask[name] = m
        return params, mask

    def num_params(self, params, mask=None, trainable_only=True) -> int:
        total = 0
        flat_p = jax.tree_util.tree_leaves_with_path(params)
        if mask is None or not trainable_only:
            return sum(int(np.prod(x.shape)) for _, x in flat_p)
        flat_m = dict(jax.tree_util.tree_leaves_with_path(mask))
        for path, x in flat_p:
            if flat_m.get(path, True):
                total += int(np.prod(np.shape(x)))
        return total

    @property
    def z_to_onehot(self) -> np.ndarray:
        lut = np.full(120, -1, dtype=np.int32)
        for z, idx in self.type_map.items():
            lut[z] = idx
        return lut

    # -- forward -------------------------------------------------------
    def preprocess(self, data: Dict[str, Array]) -> Dict[str, Array]:
        """Z -> one-hot index lookup (reference sequential.py:130-168)."""
        data = dict(data)
        lut = jnp.asarray(self.z_to_onehot)
        data[KEY.NODE_FEATURE] = lut[data[KEY.ATOMIC_NUMBERS]]
        return data

    def apply_energy(self, params, data: Dict[str, Array],
                     halo_refresh=None) -> Dict[str, Array]:
        """halo_refresh(x): refresh ghost rows of node arrays from the
        domain-decomposition ring before every convolution (parallel MD;
        the analog of the reference's between-segment forward_comm,
        pair_e3gnn_parallel.cpp:355-387)."""
        from . import layers as L

        data = self.preprocess(data)
        for name, layer in self.layers:
            if halo_refresh is not None and isinstance(
                layer, L.IrrepsConvolution
            ):
                data[KEY.NODE_FEATURE] = halo_refresh(
                    data[KEY.NODE_FEATURE]
                )
            data = layer.apply(params.get(name, {}), data)
        return data

    def apply(self, params, data: Dict[str, Array],
              compute_stress: bool = True) -> Dict[str, Array]:
        """Energy + force (+ stress), one autodiff program.

        Mirrors ForceStressOutputFromEdge (reference force_output.py:167-224):
          fij    = dE/d(edge_vec)
          F_i    = sum_{e: i=edge_idx[0]} fij - sum_{e: i=edge_idx[1]} fij
          virial = -(sum_e over graph r_ij (x) f_ij) / volume, Voigt
                   (xx, yy, zz, xy, yz, zx)
        """
        edge_vec0 = data[KEY.EDGE_VEC]

        def energy_of(edge_vec):
            d = dict(data)
            d[KEY.EDGE_VEC] = edge_vec
            out = self.apply_energy(params, d)
            return jnp.sum(out[KEY.PRED_TOTAL_ENERGY]), out

        (_, out), fij = jax.value_and_grad(energy_of, has_aux=True)(edge_vec0)

        edge_idx = data[KEY.EDGE_IDX]
        n_nodes = data[KEY.ATOMIC_NUMBERS].shape[0]
        rev = data.get(KEY.EDGE_REV)
        dd = data.get(KEY.EDGE_DENSE_D)
        if rev is not None:
            # symmetric dst-sorted list: both scatters become dst
            # aggregations; the src-scatter rides the rev permutation
            pf = scatter_sum(fij, edge_idx[0], n_nodes, sorted=True,
                             dense_d=dd)
            nf = scatter_sum(fij[rev], edge_idx[0], n_nodes, sorted=True,
                             dense_d=dd)
        else:
            pf = scatter_sum(fij, edge_idx[0], n_nodes)
            nf = scatter_sum(fij, edge_idx[1], n_nodes)
        out[KEY.PRED_FORCE] = pf - nf

        if compute_stress:
            rij = edge_vec0
            diag = rij * fij
            s12 = rij[..., 0] * fij[..., 1]
            s23 = rij[..., 1] * fij[..., 2]
            s31 = rij[..., 2] * fij[..., 0]
            virial = jnp.concatenate(
                [diag, s12[..., None], s23[..., None], s31[..., None]],
                axis=-1,
            )
            batch = data[KEY.BATCH]
            num_graphs = data[KEY.NUM_ATOMS].shape[0]
            sout = scatter_sum(virial, batch[edge_idx[1]], num_graphs)
            vol = data[KEY.CELL_VOLUME]
            out[KEY.PRED_STRESS] = -sout / vol[..., None]
        return out

    def jitted(self, compute_stress: bool = True):
        """Cached jax.jit of apply() keyed on this (hashable) model."""
        return _jitted_apply(self, compute_stress)


@functools.lru_cache(maxsize=64)
def _jitted_apply(model: SevenNetModel, compute_stress: bool):
    def f(params, data):
        return model.apply(params, data, compute_stress=compute_stress)
    return jax.jit(f)
