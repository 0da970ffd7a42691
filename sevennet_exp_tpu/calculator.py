"""SevenNetCalculator: single-point E/F/S API (reference
sevenn/sevennet_calculator.py:22-231).

Works standalone on our `Atoms` container, and registers as a genuine ASE
``Calculator`` subclass when ase is importable (it is an optional
dependency here; the compute path never touches torch/ase).

TPU notes: graphs are padded to bucketed capacities so repeated calls with
similar system sizes hit the jit cache; a compile happens only when the
bucket grows (cf. the reference's nedges*1.2 amortization,
pair_e3gnn.cpp:267-273).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from . import _keys as KEY
from .checkpoint import SevenNetCheckpoint
from .data.graph import Atoms, collate_graphs, pad_cap, unlabeled_atoms_to_graph

try:  # optional ASE integration
    from ase.calculators.calculator import Calculator as _ASECalculator
    from ase.calculators.calculator import all_changes as _ase_all_changes
    _HAS_ASE = True
except Exception:  # pragma: no cover - ase not installed in CI image
    _ASECalculator = object
    _ase_all_changes = None
    _HAS_ASE = False


def _as_internal_atoms(atoms) -> Atoms:
    if isinstance(atoms, Atoms):
        return atoms
    # duck-typed ase.Atoms
    return Atoms(
        atomic_numbers=np.asarray(atoms.get_atomic_numbers()),
        pos=np.asarray(atoms.get_positions()),
        cell=np.asarray(atoms.get_cell()),
        pbc=np.asarray(atoms.get_pbc()),
    )


class SevenNetCalculator(_ASECalculator):
    """Potential-energy calculator backed by the jitted TPU model.

    results: energy (eV), energies (N, eV), forces (N,3 eV/A),
    stress (6, eV/A^3, ASE Voigt order xx yy zz yz xz xy, sign flipped
    like the reference sevennet_calculator.py:187-202).
    """

    implemented_properties = [
        'energy', 'free_energy', 'energies', 'forces', 'stress'
    ]

    def __init__(
        self,
        model: Union[str, Any] = None,
        params=None,
        modal: Optional[str] = None,
        dtype=np.float32,
        use_pallas: Optional[bool] = None,
        **kwargs,
    ):
        if _HAS_ASE:
            _ASECalculator.__init__(self, **kwargs)
        else:
            self.results = {}
        if isinstance(model, str):
            cp = SevenNetCheckpoint(model)
            self.model, self.params = cp.build_model()
            self.sevennet_config = cp.config
        else:
            assert params is not None, 'model instance requires params'
            self.model, self.params = model, params
            self.sevennet_config = model.config
        self.cutoff = self.model.cutoff
        self.type_map = self.model.type_map
        self.modal_idx = (
            self.model.modal_map[modal] if modal else None
        )
        self.dtype = dtype
        self._caps = (8, 32)
        # fused pallas conv kernels (first-order differentiable: E/F/S
        # inference) — default on when running on real TPU hardware.
        # The toggle is process-global; an explicit use_pallas value
        # (True OR False) is always honored.
        from .ops import pallas_tp
        if use_pallas is None:
            import jax as _jax
            if _jax.default_backend() not in ('cpu',):
                pallas_tp.enable(True)
        else:
            pallas_tp.enable(bool(use_pallas))

    # -- core ----------------------------------------------------------
    def calculate_single(self, atoms) -> Dict[str, np.ndarray]:
        at = _as_internal_atoms(atoms)
        g = unlabeled_atoms_to_graph(at, self.cutoff)
        n, e = len(at), g[KEY.EDGE_IDX].shape[1]
        n_cap = max(self._caps[0], pad_cap(n))
        # 256-aligned edge capacity keeps the fused pallas conv eligible
        e_cap = max(self._caps[1], pad_cap(e, multiple=256, margin=1.2))
        self._caps = (n_cap, e_cap)
        if self.modal_idx is not None:
            g[KEY.MODAL_TYPE] = self.modal_idx
        b = collate_graphs([g], n_node=n_cap, n_edge=e_cap, dtype=self.dtype)
        out = self.model.jitted()(
            self.params, {k: jnp.asarray(v) for k, v in b.items()}
        )
        energies = np.asarray(out[KEY.ATOMIC_ENERGY])[:n, 0]
        stress_raw = np.asarray(out[KEY.PRED_STRESS])[0]
        # model Voigt (xx,yy,zz,xy,yz,zx) -> ASE (xx,yy,zz,yz,xz,xy), -1
        stress = -stress_raw[[0, 1, 2, 4, 5, 3]]
        return {
            'energy': float(np.asarray(out[KEY.PRED_TOTAL_ENERGY])[0]),
            'energies': energies,
            'forces': np.asarray(out[KEY.PRED_FORCE])[:n],
            'stress': stress,
        }

    # -- ASE protocol --------------------------------------------------
    def calculate(self, atoms=None, properties=None, system_changes=None):
        if _HAS_ASE and atoms is None:
            atoms = self.atoms
        if _HAS_ASE:
            _ASECalculator.calculate(self, atoms, properties,
                                     system_changes or _ase_all_changes)
        res = self.calculate_single(atoms)
        res['free_energy'] = res['energy']
        self.results = res
        return res

    # convenience accessors for the no-ase path
    def get_potential_energy(self, atoms=None, **kw):
        if not self.results or atoms is not None:
            self.calculate(atoms)
        return self.results['energy']

    def get_forces(self, atoms=None):
        if not self.results or atoms is not None:
            self.calculate(atoms)
        return self.results['forces']

    def get_stress(self, atoms=None):
        if not self.results or atoms is not None:
            self.calculate(atoms)
        return self.results['stress']


class D3Calculator(_ASECalculator):
    """Standalone Grimme D3 dispersion calculator (JAX).

    Equivalent surface to the reference's ``pair_style d3 rthr cn_thr
    damping functional`` (pair_d3.cu:262-301), exposed as a Python
    calculator instead of a LAMMPS-only pair style.
    """

    implemented_properties = ['energy', 'free_energy', 'forces', 'stress']

    def __init__(self, damping: str = 'damp_bj', functional: str = 'pbe',
                 rthr: float = 9000.0, cn_thr: float = 1600.0,
                 dtype=np.float32, **kwargs):
        from .ops.d3 import D3Dispersion
        if _HAS_ASE:
            _ASECalculator.__init__(self, **kwargs)
        else:
            self.results = {}
        self.d3 = D3Dispersion(damping, functional, rthr, cn_thr, dtype)

    def calculate_single(self, atoms) -> Dict[str, np.ndarray]:
        at = _as_internal_atoms(atoms)
        out = self.d3.compute(at.atomic_numbers, at.pos, at.cell, at.pbc)
        sig = out['stress']  # dE/deps / V, 3x3
        stress = np.array([sig[0, 0], sig[1, 1], sig[2, 2],
                           sig[1, 2], sig[0, 2], sig[0, 1]])
        return {
            'energy': out['energy'],
            'forces': out['forces'],
            'stress': stress,
        }

    def calculate(self, atoms=None, properties=None, system_changes=None):
        if _HAS_ASE and atoms is None:
            atoms = self.atoms
        if _HAS_ASE:
            _ASECalculator.calculate(self, atoms, properties,
                                     system_changes or _ase_all_changes)
        res = self.calculate_single(atoms)
        res['free_energy'] = res['energy']
        self.results = res
        return res

    def get_potential_energy(self, atoms=None, **kw):
        if not self.results or atoms is not None:
            self.calculate(atoms)
        return self.results['energy']

    def get_forces(self, atoms=None):
        if not self.results or atoms is not None:
            self.calculate(atoms)
        return self.results['forces']

    def get_stress(self, atoms=None):
        if not self.results or atoms is not None:
            self.calculate(atoms)
        return self.results['stress']


class SevenNetD3Calculator(SevenNetCalculator):
    """SevenNet potential + Grimme D3 dispersion, summed.

    The Python equivalent of the reference's LAMMPS recipe
    ``pair_style hybrid/overlay e3gnn d3 ...`` (pair_e3gnn/README.md):
    one calculator, E/F/S are the sum of the GNN and dispersion terms.
    """

    def __init__(self, *args, damping: str = 'damp_bj',
                 functional: str = 'pbe', rthr: float = 9000.0,
                 cn_thr: float = 1600.0, **kwargs):
        super().__init__(*args, **kwargs)
        from .ops.d3 import D3Dispersion
        self.d3 = D3Dispersion(damping, functional, rthr, cn_thr, self.dtype)

    def calculate_single(self, atoms) -> Dict[str, np.ndarray]:
        res = SevenNetCalculator.calculate_single(self, atoms)
        at = _as_internal_atoms(atoms)
        d3 = self.d3.compute(at.atomic_numbers, at.pos, at.cell, at.pbc)
        res['energy'] = res['energy'] + d3['energy']
        res['energies'] = res['energies'] + d3['energy'] / len(at)
        res['forces'] = res['forces'] + d3['forces']
        sig = d3['stress']
        res['stress'] = res['stress'] + np.array(
            [sig[0, 0], sig[1, 1], sig[2, 2],
             sig[1, 2], sig[0, 2], sig[0, 1]])
        return res
