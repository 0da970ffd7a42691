"""Parallel-MD oracle tests on the 8-device CPU mesh: domain-decomposed
energy/forces must match the single-device engine (the analog of the
reference's serial-vs-mpirun LAMMPS equivalence suite,
tests/lammps_tests/test_lammps.py:124-137,278-316)."""

import jax
import numpy as np
import pytest

from sevennet_exp_tpu.data.graph import Atoms
from sevennet_exp_tpu.md.engine import MolecularDynamics
from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.parallel.md import ParallelMolecularDynamics

from samples import tiny_model_config


def _long_box(nx=16, a=4.2, seed=0):
    """Rocksalt-ish chain long in x so 2..8 slabs stay wider than rc."""
    rng = np.random.default_rng(seed)
    zs, fr = [], []
    for i in range(nx):
        for j in range(2):
            for k in range(2):
                fr.append([(i + 0.25) / nx, (j + 0.25) / 2, (k + 0.25) / 2])
                zs.append(11)
                fr.append([(i + 0.75) / nx, (j + 0.75) / 2, (k + 0.75) / 2])
                zs.append(17)
    cell = np.diag([a * nx, a * 2, a * 2]).astype(float)
    pos = np.array(fr) @ cell
    pos += rng.normal(scale=0.05, size=pos.shape)
    return Atoms(atomic_numbers=np.array(zs), pos=pos, cell=cell,
                 pbc=np.array([True] * 3))


@pytest.fixture(scope='module')
def setup():
    config = tiny_model_config({'cutoff': 3.5, 'channel': 4, 'lmax': 1,
                                'num_convolution_layer': 2})
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(5))
    at = _long_box()
    return model, params, at


@pytest.mark.parametrize('n_dev', [2, 4, 8])
def test_parallel_matches_serial(setup, n_dev):
    model, params, at = setup
    md1 = MolecularDynamics(model, params, at, ensemble='nve',
                            skin=0.5)
    nl = md1._build_nl(md1.state.pos)
    e_ref, f_ref = md1._ef_fn(md1.state.pos, nl)
    e_ref = float(e_ref)
    f_ref = np.asarray(f_ref)

    pmd = ParallelMolecularDynamics(
        model, params, at, n_devices=n_dev, ensemble='nve', skin=0.5,
    )
    e_par, f_par = pmd.energy_forces()

    assert abs(e_par - e_ref) < 5e-3, (e_par, e_ref)
    np.testing.assert_allclose(f_par, f_ref, atol=5e-4)


def test_parallel_md_runs(setup):
    model, params, at = setup
    pmd = ParallelMolecularDynamics(
        model, params, at, n_devices=4, ensemble='nvt',
        rebuild_every=5, dt_fs=1.0, skin=1.0,
    )
    out = pmd.run(10)
    assert np.isfinite(out['energy']).all()
    # atoms migrated/rebuilt without loss
    gp, gv = pmd.gather_global()
    assert gp.shape == (len(at), 3)
    assert np.isfinite(gp).all()
