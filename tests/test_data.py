"""Data pipeline tests (reference tests/unit_tests/test_data.py analog):
extxyz parsing against the reference's committed hfo2.extxyz, neighbor
lists for all pbc cases, dataset statistics, end-to-end train_v2."""

import os

import numpy as np
import pytest

import sevennet_exp_tpu._keys as KEY
from sevennet_exp_tpu.data.extxyz import read_extxyz, write_extxyz
from sevennet_exp_tpu.data.dataset import (
    SevenNetGraphDataset,
    datasets_from_config,
)
from sevennet_exp_tpu.data.graph import atoms_to_graph
from sevennet_exp_tpu.data.neighborlist import neighbor_list

HFO2 = '/root/reference/tests/data/systems/hfo2.extxyz'
needs_hfo2 = pytest.mark.skipif(
    not os.path.exists(HFO2), reason='reference hfo2.extxyz absent'
)


@needs_hfo2
def test_read_extxyz_reference_file():
    frames = read_extxyz(HFO2)
    assert len(frames) >= 2
    at = frames[0]
    assert len(at) == 12
    assert sorted(set(at.atomic_numbers.tolist())) == [8, 72]
    assert at.energy is not None and at.energy < 0
    assert at.forces.shape == (12, 3)
    assert at.stress.shape == (6,)
    assert at.pbc.all()
    # stress sign/order: reference negates ASE voigt into eV/A^3
    # first frame header: xx component -0.0464... -> stored +0.0464...
    assert abs(at.stress[0] - 0.04641964502194789) < 1e-10


@needs_hfo2
def test_roundtrip_extxyz(tmp_path):
    frames = read_extxyz(HFO2)
    p = str(tmp_path / 'out.extxyz')
    write_extxyz(p, frames[:2])
    back = read_extxyz(p)
    np.testing.assert_allclose(back[0].pos, frames[0].pos, atol=1e-7)
    np.testing.assert_allclose(back[0].stress, frames[0].stress, atol=1e-8)
    assert abs(back[0].energy - frames[0].energy) < 1e-8


def test_neighbor_list_pbc_cases():
    # non-pbc: simple dimer
    pos = np.array([[0.0, 0, 0], [1.0, 0, 0], [10.0, 0, 0]])
    i, j, vec, s = neighbor_list(pos, np.zeros((3, 3)), [False] * 3, 2.0)
    pairs = set(zip(i.tolist(), j.tolist()))
    assert pairs == {(0, 1), (1, 0)}
    # pbc small cell: self-image edges
    cell = np.eye(3) * 2.0
    i, j, vec, s = neighbor_list(
        np.zeros((1, 3)), cell, [True] * 3, 2.5
    )
    assert len(i) == 6  # 6 face images at d=2; edge images at 2.83 > 2.5
    # distances all < cutoff
    d = np.linalg.norm(vec, axis=1)
    assert (d < 2.5).all() and (d > 0).all()
    # mixed pbc
    i, j, vec, s = neighbor_list(
        np.zeros((1, 3)), cell, [True, False, False], 2.5
    )
    assert len(i) == 2
    assert (s[:, 1:] == 0).all()


@needs_hfo2
def test_dataset_statistics(tmp_path):
    ds = SevenNetGraphDataset(
        cutoff=4.5, root=str(tmp_path), files=[HFO2],
        processed_name='graph',
    )
    assert len(ds) >= 2
    assert set(ds.species) == {'Hf', 'O'}
    assert ds.avg_num_neigh > 1
    assert ds.force_rms > 0
    assert np.isfinite(ds.per_atom_energy_mean)
    ref_e = ds.elemwise_reference_energies
    assert ref_e[72] < 0 and ref_e[8] < 0  # Hf, O reference energies
    # cached reload
    ds2 = SevenNetGraphDataset(cutoff=4.5, root=str(tmp_path))
    assert len(ds2) == len(ds)
    assert abs(ds2.avg_num_neigh - ds.avg_num_neigh) < 1e-12


@needs_hfo2
def test_train_v2_end_to_end(tmp_path):
    """Full training path: yaml-style config -> datasets -> epochs -> lc.csv
    + checkpoints (reference test_train.py analog)."""
    from sevennet_exp_tpu.scripts.train import train_v2

    config = {
        # model
        'cutoff': 4.0, 'channel': 4, 'lmax': 1, 'is_parity': False,
        'num_convolution_layer': 2,
        'radial_basis': {'radial_basis_name': 'bessel',
                         'bessel_basis_num': 4},
        'cutoff_function': {'cutoff_function_name': 'poly_cut'},
        'weight_nn_hidden_neurons': [16, 16],
        'act_radial': 'silu', 'act_scalar': {'e': 'silu', 'o': 'tanh'},
        'act_gate': {'e': 'silu', 'o': 'tanh'},
        'conv_denominator': 'avg_num_neigh',
        'train_denominator': False, 'train_shift_scale': False,
        'self_connection_type': 'nequip',
        'shift': 'elemwise_reference_energies',
        'scale': 'force_rms',
        'irreps_manual': False, 'lmax_edge': -1, 'lmax_node': -1,
        'readout_as_fcn': False, 'use_bias_in_linear': False,
        '_normalize_sph': True, 'interaction_type': 'nequip',
        'chemical_species': 'auto',
        '_number_of_species': 'auto', '_type_map': 'auto',
        # train
        'epoch': 2, 'loss': 'huber', 'loss_param': {'delta': 0.01},
        'optimizer': 'adam', 'optim_param': {'lr': 0.005},
        'scheduler': 'linearlr',
        'scheduler_param': {'start_factor': 1.0, 'total_iters': 2,
                            'end_factor': 0.1},
        'force_loss_weight': 1.0, 'stress_loss_weight': 0.01,
        'is_train_stress': True, 'per_epoch': 2,
        'error_record': [['Energy', 'RMSE'], ['Force', 'RMSE'],
                         ['Stress', 'RMSE'], ['TotalLoss', 'None']],
        'random_seed': 1, 'train_shuffle': True,
        'continue': {'checkpoint': False},
        # data
        'load_trainset_path': [HFO2],
        'data_divide_ratio': 0.3,
        'batch_size': 2,
    }
    wd = str(tmp_path)
    trainer = train_v2(config, working_dir=wd)
    assert os.path.exists(os.path.join(wd, 'lc.csv'))
    lines = open(os.path.join(wd, 'lc.csv')).read().strip().splitlines()
    assert len(lines) == 3  # header + 2 epochs
    assert os.path.exists(os.path.join(wd, 'checkpoint_best.pth.sevennet'))
    assert os.path.exists(os.path.join(wd, 'checkpoint_last.pth.sevennet'))
    # reload checkpoint and continue-style build
    from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint
    cp = SevenNetCheckpoint(
        os.path.join(wd, 'checkpoint_last.pth.sevennet')
    )
    model2, params2 = cp.build_model()
    assert model2.cutoff == 4.0


def test_native_neighbor_matches_python():
    """C++ cell-list builder (runtime/neighbor.cpp) == scipy reference."""
    import os
    from sevennet_exp_tpu.data import native as natmod
    from sevennet_exp_tpu.data.native import native_neighbor_list

    rng = np.random.default_rng(4)
    cell = np.eye(3) * 9.0 + rng.normal(scale=0.4, size=(3, 3))
    pos = rng.uniform(0, 9, size=(60, 3))
    res = native_neighbor_list(pos, cell, [True] * 3, 4.0)
    if res is None:
        pytest.skip('native toolchain unavailable')
    i1, j1, v1, s1 = res
    os.environ['SEVENN_NO_NATIVE'] = '1'
    natmod._TRIED, natmod._LIB = False, None
    try:
        i2, j2, v2, s2 = neighbor_list(pos, cell, [True] * 3, 4.0)
    finally:
        os.environ.pop('SEVENN_NO_NATIVE')
        natmod._TRIED, natmod._LIB = False, None
    k1 = set(zip(i1.tolist(), j1.tolist(),
                 map(tuple, s1.astype(int).tolist())))
    k2 = set(zip(i2.tolist(), j2.tolist(),
                 map(tuple, s2.astype(int).tolist())))
    assert k1 == k2


def test_parse_input_validation():
    """Per-key type-cast / condition validation (reference
    parse_input.py:14-52): malformed values fail at parse time with a
    pointed message; unknown keys warn."""
    import warnings

    import pytest as _pytest

    from sevennet_exp_tpu.parse_input import (
        init_data_config, init_model_config, init_train_config,
    )

    c = init_model_config({'chemical_species': ['Na', 'Cl'],
                           'cutoff': 5, 'lmax': 2})
    assert isinstance(c['cutoff'], float)  # int -> float cast
    with _pytest.raises(ValueError, match='cutoff'):
        init_model_config({'chemical_species': 'auto', 'cutoff': 'abc'})
    with _pytest.raises(ValueError, match='self_connection_type'):
        init_model_config({'chemical_species': 'auto',
                           'self_connection_type': 'bogus'})
    with _pytest.raises(ValueError, match='shift'):
        init_data_config({'shift': 'bogus_keyword'})
    with _pytest.raises(ValueError, match='radial_basis'):
        init_model_config({'chemical_species': 'auto',
                           'radial_basis': {'radial_basis_name': 'gauss'}})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        init_train_config({'not_a_key': 1})
    assert any('not_a_key' in str(x.message) for x in w)
