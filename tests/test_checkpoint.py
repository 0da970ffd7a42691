"""Checkpoint ingestion tests: convert the reference's committed torch
checkpoint (cp_0.pth, v0.10.0 -> exercises the old-convolution re-sort
path), run the converted model, and round-trip our native format."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import sevennet_exp_tpu._keys as KEY
from sevennet_exp_tpu.checkpoint import (
    SevenNetCheckpoint,
    load_native_checkpoint,
    save_checkpoint,
)
from sevennet_exp_tpu.data.graph import Atoms, collate_graphs, unlabeled_atoms_to_graph

CP0 = '/root/reference/tests/data/checkpoints/cp_0.pth'
needs_cp0 = pytest.mark.skipif(
    not os.path.exists(CP0), reason='reference cp_0 absent'
)


def _hfo2_cell():
    # a small rattled HfO2-ish fluorite cell (Hf and O are what cp_0 knows)
    rng = np.random.default_rng(7)
    a = 5.08
    fracs = []
    zs = []
    base_hf = [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    base_o = [
        [0.25, 0.25, 0.25], [0.75, 0.25, 0.25], [0.25, 0.75, 0.25],
        [0.25, 0.25, 0.75], [0.75, 0.75, 0.25], [0.75, 0.25, 0.75],
        [0.25, 0.75, 0.75], [0.75, 0.75, 0.75],
    ]
    for f in base_hf:
        fracs.append(f)
        zs.append(72)
    for f in base_o:
        fracs.append(f)
        zs.append(8)
    cell = np.eye(3) * a
    pos = np.array(fracs, dtype=float) @ cell
    pos += rng.normal(scale=0.05, size=pos.shape)
    return Atoms(
        atomic_numbers=np.array(zs), pos=pos, cell=cell,
        pbc=np.array([True] * 3),
    )


@needs_cp0
def test_convert_cp0_and_run():
    cp = SevenNetCheckpoint(CP0)
    assert cp.config['cutoff'] == 4.0
    model, params = cp.build_model()
    # all expected layers got params
    pnames = set(params)
    assert 'edge_embedding' in pnames
    assert '0_convolution' in pnames
    assert 'rescale_atomic_energy' in pnames

    at = _hfo2_cell()
    g = unlabeled_atoms_to_graph(at, cp.config['cutoff'])
    b = collate_graphs([g])
    out = model.jitted()(
        params, {k: jnp.asarray(v) for k, v in b.items()}
    )
    e = float(out[KEY.PRED_TOTAL_ENERGY][0])
    f = np.asarray(out[KEY.PRED_FORCE])
    s = np.asarray(out[KEY.PRED_STRESS][0])
    assert np.isfinite(e) and np.isfinite(f).all() and np.isfinite(s).all()
    # translation invariance of a converted model
    at2 = _hfo2_cell()
    at2.pos = at2.pos + np.array([0.37, -1.2, 0.55])
    g2 = unlabeled_atoms_to_graph(at2, cp.config['cutoff'])
    b2 = collate_graphs([g2], n_edge=b[KEY.EDGE_MASK].shape[0])
    out2 = model.jitted()(
        params, {k: jnp.asarray(v) for k, v in b2.items()}
    )
    assert abs(float(out2[KEY.PRED_TOTAL_ENERGY][0]) - e) < 1e-4


@needs_cp0
def test_native_checkpoint_roundtrip(tmp_path):
    cp = SevenNetCheckpoint(CP0)
    model, params = cp.build_model()
    path = str(tmp_path / 'native.sevennet')
    save_checkpoint(path, cp.config, params, epoch=7)
    payload = load_native_checkpoint(path)
    assert payload['epoch'] == 7
    cp2 = SevenNetCheckpoint(path)
    model2, params2 = cp2.build_model()
    for lname, lp in params.items():
        for k, v in lp.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    np.testing.assert_array_equal(
                        np.asarray(vv), np.asarray(params2[lname][k][kk])
                    )
            else:
                np.testing.assert_array_equal(
                    np.asarray(v), np.asarray(params2[lname][k])
                )
