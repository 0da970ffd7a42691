"""The LAMMPS pair style (sevennet_exp_tpu/lammps_pair/pair_sevennet_tpu.cpp) must
COMPILE and, driven through a mock LAMMPS world with periodic ghosts
(runtime/lammps/harness.cpp), reproduce model.apply's E/F/virial from a
deployed artifact — the check the reference gets by running real LAMMPS
over pair_e3gnn.cpp (its serial pair style, pair_e3gnn.cpp:109-259)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

CP0 = '/root/reference/tests/data/checkpoints/cp_0.pth'
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which('g++') is None, reason='needs g++')


def test_pair_style_compiles():
    """The pair style compiles warning-clean against the mock LAMMPS
    API surface (no TF / artifact needed)."""
    r = subprocess.run(
        ['g++', '-std=c++17', '-Wall', '-Wextra', '-Werror',
         '-DLAMMPS_VERSION_NUMBER=20240829',
         '-I', os.path.join(REPO, 'runtime/lammps/mock'),
         '-I', os.path.join(REPO, 'runtime/lammps'),
         '-fsyntax-only',
         os.path.join(REPO, 'sevennet_exp_tpu/lammps_pair/pair_sevennet_tpu.cpp')],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]


def _tf_available():
    try:
        import tensorflow  # noqa: F401
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _tf_available() or not os.path.exists(CP0),
    reason='needs libtensorflow_cc and reference cp_0')
def test_pair_style_matches_model_apply(tmp_path):
    import jax.numpy as jnp

    import sevennet_exp_tpu._keys as KEY
    from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint
    from sevennet_exp_tpu.data.graph import (
        Atoms, collate_graphs, unlabeled_atoms_to_graph,
    )
    from sevennet_exp_tpu.scripts.deploy import deploy

    n_node, n_edge = 16, 768
    dep = str(tmp_path / 'dep')
    deploy(CP0, dep, n_node=n_node, n_edge=n_edge)

    so = str(tmp_path / 'libsevenn_exec.so')
    subprocess.run(
        ['sh', os.path.join(REPO, 'tools', 'build_sevenn_exec.sh'), so],
        check=True, capture_output=True,
    )
    hx = str(tmp_path / 'harness')
    r = subprocess.run(
        ['sh', os.path.join(REPO, 'tools', 'build_lammps_harness.sh'),
         hx, so],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # HfO2-ish periodic structure (types 1=Hf, 2=O); edges cross the
    # boundary in every direction, so ghost tag-mapping is exercised
    cp = SevenNetCheckpoint(CP0)
    cutoff = float(cp.config['cutoff'])
    rng = np.random.default_rng(11)
    a = 5.1
    frac = np.array([
        [0.1, 0.1, 0.1], [0.5, 0.5, 0.1], [0.5, 0.1, 0.5],
        [0.1, 0.5, 0.5], [0.3, 0.3, 0.3], [0.7, 0.7, 0.3],
        [0.7, 0.3, 0.7], [0.3, 0.7, 0.7], [0.3, 0.3, 0.7],
        [0.7, 0.7, 0.7], [0.7, 0.3, 0.3], [0.3, 0.7, 0.3],
    ])
    pos = frac * a + rng.normal(scale=0.05, size=(12, 3))
    types = np.array([1] * 4 + [2] * 8)
    zs = np.where(types == 1, 72, 8)

    struct = tmp_path / 'struct.txt'
    lines = [f'{len(pos)}', f'{a} {a} {a}']
    for t, p in zip(types, pos):
        lines.append(f'{t} {p[0]:.17g} {p[1]:.17g} {p[2]:.17g}')
    struct.write_text('\n'.join(lines) + '\n')

    out = tmp_path / 'out.txt'
    r = subprocess.run(
        [hx, dep, repr(cutoff), str(struct), str(out), 'Hf', 'O'],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, (r.stdout, r.stderr[-2000:])
    assert 'harness ok' in r.stdout

    vals = out.read_text().split('\n')
    e_cpp = float(vals[0])
    f_cpp = np.array([[float(v) for v in vals[1 + i].split()]
                      for i in range(len(pos))])
    vir_cpp = np.array([float(v) for v in vals[1 + len(pos)].split()])

    at = Atoms(atomic_numbers=zs, pos=pos, cell=np.eye(3) * a,
               pbc=np.array([True] * 3))
    g = unlabeled_atoms_to_graph(at, cutoff)
    b = collate_graphs([g], n_node=n_node, n_edge=n_edge)
    model, params = cp.build_model()
    data = {k: jnp.asarray(v) for k, v in b.items()}
    data[KEY.ATOMIC_NUMBERS] = data[KEY.ATOMIC_NUMBERS].astype(jnp.int32)
    ref = model.apply(params, data)

    # the harness neighbor list and the python graph builder must agree
    # on the edge set
    n_edges_py = int(np.asarray(b[KEY.EDGE_MASK]).sum())
    n_edges_cpp = int(r.stdout.split('edges=')[1].split()[0])
    assert n_edges_cpp == n_edges_py

    e_ref = float(np.asarray(ref[KEY.PRED_TOTAL_ENERGY])[0])
    f_ref = np.asarray(ref[KEY.PRED_FORCE])[:len(pos)]
    s_ref = np.asarray(ref[KEY.PRED_STRESS])[0]  # xx yy zz xy yz zx

    np.testing.assert_allclose(e_cpp, e_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(f_cpp, f_ref, rtol=1e-3, atol=1e-4)
    vol = a ** 3
    vir_ref = -s_ref[[0, 1, 2, 3, 5, 4]] * vol  # LAMMPS order: xy xz yz
    np.testing.assert_allclose(vir_cpp, vir_ref, rtol=1e-3, atol=1e-4)
