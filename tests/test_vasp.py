"""VASP OUTCAR / structure_list readers and the memory-lean atoms
dataset (reference dataload.py:373-478, atoms_dataset.py)."""

import os

import numpy as np
import pytest

from sevennet_exp_tpu.data.atoms_dataset import SevenNetAtomsDataset
from sevennet_exp_tpu.data.dataset import (
    SevenNetGraphDataset,
    read_structure_file,
)
from sevennet_exp_tpu.data.loader import GraphLoader
from sevennet_exp_tpu.data.vasp import (
    braceexpand,
    read_outcar,
    string2index,
    structure_list_reader,
)
from sevennet_exp_tpu import _keys as KEY

REF = '/root/reference/example_inputs'
OUTCAR1 = f'{REF}/data/label_1/OUTCAR_1'
SLIST = f'{REF}/training/structure_list'

needs_ref = pytest.mark.skipif(
    not os.path.exists(OUTCAR1), reason='reference example data absent')


def test_braceexpand():
    assert braceexpand('x_{1..3}') == ['x_1', 'x_2', 'x_3']
    assert braceexpand('{a,b}{1..2}') == ['a1', 'a2', 'b1', 'b2']
    assert braceexpand('plain') == ['plain']
    assert braceexpand('n{08..10}') == ['n08', 'n09', 'n10']
    assert braceexpand('{5..1..-2}') == ['5', '3', '1']


def test_string2index():
    assert string2index('3') == 3
    assert string2index(':') == slice(None, None, None)
    assert string2index('1:5:2') == slice(1, 5, 2)
    assert string2index('-1') == -1


@needs_ref
def test_read_outcar_labels():
    frames = read_outcar(OUTCAR1)
    assert len(frames) == 1
    at = frames[0]
    assert len(at) == 96
    assert (at.atomic_numbers == 72).sum() == 32  # Hf
    assert (at.atomic_numbers == 8).sum() == 64   # O
    assert at.energy == pytest.approx(-2759.11555469)
    # in-kB row: 77.70829 12.04430 62.22823 2.52352 9.28393 66.48603
    assert at.stress[0] == pytest.approx(77.70829 * 0.1 / 160.21766208)
    assert at.stress[3] == pytest.approx(2.52352 * 0.1 / 160.21766208)
    assert at.forces.shape == (96, 3)
    assert np.isfinite(at.pos).all() and abs(np.linalg.det(at.cell)) > 1


@needs_ref
def test_structure_list_reader():
    d = structure_list_reader(SLIST)
    assert set(d) == {'label_1', 'label_2'}
    # each label lists the same 5-file glob twice -> 10 frames
    assert len(d['label_1']) == 10 and len(d['label_2']) == 10
    assert all(at.info['label'] == 'label_1' for at in
               read_structure_file(SLIST)[:10])


@needs_ref
def test_atoms_dataset_matches_graph_dataset(tmp_path):
    files = [f'{REF}/data/label_1/OUTCAR_{i}' for i in (1, 2, 3)]
    ds_a = SevenNetAtomsDataset(cutoff=4.5, files=files)
    ds_g = SevenNetGraphDataset(cutoff=4.5, root=str(tmp_path), files=files)
    assert len(ds_a) == len(ds_g) == 3
    assert ds_a.species == ds_g.species == ['O', 'Hf']
    assert ds_a.per_atom_energy_mean == pytest.approx(
        ds_g.per_atom_energy_mean, rel=1e-9)
    assert ds_a.force_rms == pytest.approx(ds_g.force_rms, rel=1e-6)
    assert ds_a.avg_num_neigh == pytest.approx(ds_g.avg_num_neigh, rel=1e-6)
    # lazy __getitem__ builds the same graph
    ga, gg = ds_a[0], ds_g[0]
    assert ga[KEY.EDGE_IDX].shape == gg[KEY.EDGE_IDX].shape
    np.testing.assert_allclose(ga[KEY.POS], gg[KEY.POS])


def test_extxyz_named_outcar_dispatches_to_extxyz(tmp_path):
    """Files like OUTCAR_relaxed.extxyz must hit the extxyz parser."""
    p = tmp_path / 'OUTCAR_relaxed.extxyz'
    p.write_text('1\nLattice="5 0 0 0 5 0 0 0 5" '
                 'Properties=species:S:1:pos:R:3 energy=-1.5\n'
                 'Si 1.0 1.0 1.0\n')
    frames = read_structure_file(str(p))
    assert len(frames) == 1
    assert frames[0].atomic_numbers.tolist() == [14]
    assert frames[0].energy == pytest.approx(-1.5)


@needs_ref
def test_loader_grows_on_capacity_overflow():
    """Underestimated lazy capacities grow instead of crashing."""
    ds = SevenNetAtomsDataset(
        cutoff=4.5, files=[f'{REF}/data/label_1/OUTCAR_1'])
    loader = GraphLoader(ds, batch_size=1, shuffle=False)
    loader.n_edge = 128  # sabotage: far below the true edge count
    b = next(iter(loader))
    assert b[KEY.EDGE_IDX].shape[1] == loader.n_edge
    assert loader.n_edge > 128  # grew to fit


@needs_ref
def test_avg_num_neigh_cache_not_poisoned_by_estimates():
    ds = SevenNetAtomsDataset(
        cutoff=4.5, files=[f'{REF}/data/label_1/OUTCAR_{i}'
                           for i in (1, 2, 3)])
    ds.estimated_sizes()  # coarse sample populates the cache
    coarse = ds._avg_num_neigh
    full = ds.avg_num_neigh  # must recompute at the larger sample size
    assert ds._avg_num_neigh[0] == 3  # all items sampled
    assert np.isfinite(full)


@needs_ref
def test_loader_over_lazy_atoms_dataset():
    ds = SevenNetAtomsDataset(
        cutoff=4.5, files=[f'{REF}/data/label_1/OUTCAR_1',
                           f'{REF}/data/label_1/OUTCAR_2'])
    loader = GraphLoader(ds, batch_size=2, shuffle=False)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert int(b[KEY.NODE_MASK].sum()) == 192  # 2 x 96 real atoms
    assert b[KEY.EDGE_IDX].shape[1] == loader.n_edge
