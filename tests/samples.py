"""Shared ASE-free test structures (bulk NaCl / H2O molecule / isolated H),
the reference's standard tri-case (tests/unit_tests/test_model.py:17-22)."""

import numpy as np

from sevennet_exp_tpu.data.graph import Atoms


def nacl_bulk() -> Atoms:
    # ase.build.bulk('NaCl', 'rocksalt', a=5.63): fcc primitive, 2 atoms
    a = 5.63
    cell = np.array([[0.0, a / 2, a / 2],
                     [a / 2, 0.0, a / 2],
                     [a / 2, a / 2, 0.0]])
    pos = np.array([[0.0, 0.0, 0.0], [a / 2, 0.0, 0.0]])
    return Atoms(
        atomic_numbers=np.array([11, 17]), pos=pos, cell=cell,
        pbc=np.array([True] * 3),
    )


def nacl_pretrained() -> Atoms:
    # the golden-test variant (reference test_pretrained.py:16-22)
    cell = np.array([[1.0, 2.815, 2.815],
                     [2.815, 0.0, 2.815],
                     [2.815, 2.815, 0.0]])
    pos = np.array([[0.0, 0.0, 0.0], [2.815, 0.0, 0.0]])
    return Atoms(
        atomic_numbers=np.array([11, 17]), pos=pos, cell=cell,
        pbc=np.array([True] * 3),
    )


def h2o_molecule() -> Atoms:
    # ase.build.molecule('H2O') geometry
    pos = np.array([[0.0, 0.0, 0.119262],
                    [0.0, 0.763239, -0.477047],
                    [0.0, -0.763239, -0.477047]])
    return Atoms(
        atomic_numbers=np.array([8, 1, 1]), pos=pos,
        cell=np.zeros((3, 3)), pbc=np.array([False] * 3),
    )


def h2o_pretrained() -> Atoms:
    pos = np.array([[0.0, 0.2, 0.12],
                    [0.0, 0.76, -0.48],
                    [0.0, -0.76, -0.48]])
    return Atoms(
        atomic_numbers=np.array([8, 1, 1]), pos=pos,
        cell=np.zeros((3, 3)), pbc=np.array([False] * 3),
    )


def isolated_h() -> Atoms:
    return Atoms(
        atomic_numbers=np.array([1]), pos=np.zeros((1, 3)),
        cell=np.zeros((3, 3)), pbc=np.array([False] * 3),
    )


def rattled_rocksalt(specie_a=11, specie_b=17, a=5.63, reps=2, seed=0,
                     rattle=0.1) -> Atoms:
    """Supercell rocksalt with random displacements (for MD/energy tests)."""
    rng = np.random.default_rng(seed)
    base = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    zs, fracs = [], []
    for i in range(reps):
        for j in range(reps):
            for k in range(reps):
                for b, z in enumerate((specie_a, specie_b)):
                    fracs.append((base[b] + [i, j, k]) / reps)
                    zs.append(z)
    cell = np.eye(3) * a / 2 * reps  # conventional-ish cubic cell
    # rocksalt conventional: use simple cubic of a, basis at corners
    cell = np.eye(3) * a * reps
    pos = np.array(fracs) @ cell
    pos += rng.normal(scale=rattle, size=pos.shape)
    return Atoms(
        atomic_numbers=np.array(zs), pos=pos, cell=cell,
        pbc=np.array([True] * 3),
    )


def tiny_model_config(overrides=None):
    """The reference unit-test model config (test_model.py:54-95)."""
    from sevennet_exp_tpu.util import chemical_species_preprocess

    config = {
        'cutoff': 4.0, 'channel': 4,
        'radial_basis': {'radial_basis_name': 'bessel'},
        'cutoff_function': {'cutoff_function_name': 'poly_cut'},
        'interaction_type': 'nequip', 'lmax': 2, 'is_parity': True,
        'num_convolution_layer': 3, 'weight_nn_hidden_neurons': [64, 64],
        'act_radial': 'silu', 'act_scalar': {'e': 'silu', 'o': 'tanh'},
        'act_gate': {'e': 'silu', 'o': 'tanh'},
        'conv_denominator': 30.0, 'train_denominator': False,
        'self_connection_type': 'nequip', 'shift': -10.0, 'scale': 10.0,
        'train_shift_scale': False, 'irreps_manual': False,
        'lmax_edge': -1, 'lmax_node': -1, 'readout_as_fcn': False,
        'use_bias_in_linear': False, '_normalize_sph': True,
    }
    config.update(chemical_species_preprocess(['Na', 'Cl', 'H', 'O']))
    if overrides:
        config.update(overrides)
    return config
