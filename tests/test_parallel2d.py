"""2-D pencil-decomposition oracles: two-phase (staged-swap) halo
exchange must reproduce the single-device engine, including on meshes
the 1-D slab ring cannot support (pencil width >= cutoff in BOTH
decomposed axes but slab width < cutoff at the same device count)."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from sevennet_exp_tpu.data.graph import Atoms
from sevennet_exp_tpu.md.engine import MolecularDynamics
from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.parallel.md2d import ParallelMolecularDynamics2D

from samples import tiny_model_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _flat_box(nx=8, ny=8, nz=2, a=4.2, seed=0):
    rng = np.random.default_rng(seed)
    zs, fr = [], []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                fr.append([(i + 0.25) / nx, (j + 0.25) / ny,
                           (k + 0.25) / nz])
                zs.append(11)
                fr.append([(i + 0.75) / nx, (j + 0.75) / ny,
                           (k + 0.75) / nz])
                zs.append(17)
    cell = np.diag([a * nx, a * ny, a * nz]).astype(float)
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
    at = _flat_box()
    return model, params, at


def test_2d_matches_serial_2x2(setup):
    model, params, at = setup
    md1 = MolecularDynamics(model, params, at, ensemble='nve', skin=0.5)
    nl = md1._build_nl(md1.state.pos)
    e_ref, f_ref = md1._ef_fn(md1.state.pos, nl)
    e_ref = float(e_ref)
    f_ref = np.asarray(f_ref)

    pmd = ParallelMolecularDynamics2D(
        model, params, at, mesh_shape=(2, 2), ensemble='nve', skin=0.5,
    )
    e_par, f_par, s_par = pmd.energy_forces(return_stress=True)
    assert abs(e_par - e_ref) < 2e-2, (e_par, e_ref)
    np.testing.assert_allclose(f_par, f_ref, atol=5e-4)
    assert np.isfinite(s_par).all()


def test_2d_short_nvt_run(setup):
    model, params, at = setup
    pmd = ParallelMolecularDynamics2D(
        model, params, at, mesh_shape=(2, 2), ensemble='nvt',
        rebuild_every=4, dt_fs=1.0, skin=1.0, seed=2,
    )
    out = pmd.run(9)
    assert pmd.time_steps == 9
    assert np.isfinite(out['energy']).all()
    assert np.isfinite(out['temperature']).all()
    xi = np.asarray(pmd._xi)
    np.testing.assert_allclose(xi, xi[0], rtol=0, atol=1e-6)


_SUB = r'''
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count=16'
)
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.md.engine import MolecularDynamics
from sevennet_exp_tpu.parallel.md2d import ParallelMolecularDynamics2D
from samples import tiny_model_config
from test_parallel2d import _flat_box

config = tiny_model_config({{'cutoff': 3.5, 'channel': 4, 'lmax': 1,
                             'num_convolution_layer': 2}})
model = build_e3_equivariant_model(config)
params, _ = model.init(jax.random.PRNGKey(5))
at = _flat_box()
# 16 slabs along x would be 2.1 A wide < 4.0 A build cutoff: the 1-D
# ring CANNOT decompose this box at 16 devices; 4x4 pencils can
md1 = MolecularDynamics(model, params, at, ensemble='nve', skin=0.5)
nl = md1._build_nl(md1.state.pos)
e_ref, f_ref = md1._ef_fn(md1.state.pos, nl)
pmd = ParallelMolecularDynamics2D(
    model, params, at, mesh_shape=(4, 4), ensemble='nve', skin=0.5,
)
e_par, f_par = pmd.energy_forces()
assert abs(e_par - float(e_ref)) < 2e-2, (e_par, float(e_ref))
np.testing.assert_allclose(f_par, np.asarray(f_ref), atol=5e-4)
print('OK16')
'''


def test_2d_matches_serial_4x4_16dev():
    """16 virtual devices (subprocess; the in-process mesh is pinned to
    8): a box the 1-D slab ring cannot decompose at 16 devices."""
    code = _SUB.format(repo=REPO, tests=os.path.join(REPO, 'tests'))
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    r = subprocess.run(
        [sys.executable, '-c', code], capture_output=True, text=True,
        timeout=1200, env=env,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert 'OK16' in r.stdout
