"""The native serving execute leg: the C++ PJRT host
(runtime/pjrt_cpu_host.cpp) must compile a deployed
model_const.stablehlo with the in-process XLA:CPU client, execute it on
real inputs, and reproduce model.apply's E/F/S -- the role LAMMPS'
TorchScript execution plays for the reference (pair_e3gnn.cpp:228)."""

import os
import shutil
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

import sevennet_exp_tpu._keys as KEY
from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint
from sevennet_exp_tpu.data.graph import collate_graphs, unlabeled_atoms_to_graph

CP0 = '/root/reference/tests/data/checkpoints/cp_0.pth'

pytestmark = pytest.mark.skipif(
    not os.path.exists(CP0) or shutil.which('g++') is None,
    reason='needs reference cp_0 checkpoint and g++',
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tf_available():
    try:
        import tensorflow  # noqa: F401
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _tf_available(),
                    reason='libtensorflow_cc not available')
def test_pjrt_cpu_host_executes_deployed_model(tmp_path):
    from samples import rattled_rocksalt  # noqa: F401 (sys.path via conftest)
    from sevennet_exp_tpu.scripts.deploy import deploy

    n_node, n_edge = 16, 512
    dep = str(tmp_path / 'dep')
    deploy(CP0, dep, n_node=n_node, n_edge=n_edge)
    assert os.path.exists(os.path.join(dep, 'model_const.stablehlo'))

    # a real HfO2-ish structure through the deployed capacities
    cp = SevenNetCheckpoint(CP0)
    model, params = cp.build_model()
    rng = np.random.default_rng(7)
    a = 5.1
    pos = np.array([
        [0.1, 0.1, 0.1], [2.6, 2.6, 0.1], [2.6, 0.1, 2.6], [0.1, 2.6, 2.6],
        [1.3, 1.3, 1.3], [3.8, 3.8, 1.3], [3.8, 1.3, 3.8], [1.3, 3.8, 3.8],
        [1.3, 1.3, 3.8], [3.8, 3.8, 3.8], [3.8, 1.3, 1.3], [1.3, 3.8, 1.3],
    ]) + rng.normal(scale=0.05, size=(12, 3))
    from sevennet_exp_tpu.data.graph import Atoms
    at = Atoms(
        atomic_numbers=np.array([72] * 4 + [8] * 8), pos=pos,
        cell=np.eye(3) * a, pbc=np.array([True] * 3),
    )
    g = unlabeled_atoms_to_graph(at, cp.config['cutoff'])
    b = collate_graphs([g], n_node=n_node, n_edge=n_edge)

    keys = sorted([
        KEY.ATOMIC_NUMBERS, KEY.EDGE_IDX, KEY.EDGE_VEC, KEY.EDGE_MASK,
        KEY.BATCH, KEY.NUM_ATOMS, KEY.NODE_MASK, KEY.CELL_VOLUME,
    ])
    with open(os.path.join(dep, 'signature.yaml')) as f:
        sig = yaml.safe_load(f)
    assert [i['name'] for i in sig['inputs']] == keys

    # write the flat inputs in signature order
    lines = []
    data = {}
    for i, k in enumerate(keys):
        arr = np.asarray(b[k])
        want = sig['inputs'][i]
        arr = arr.astype(np.dtype(want['dtype']))
        assert list(arr.shape) == want['shape'], (k, arr.shape)
        fn = f'in_{i}.bin'
        arr.tofile(os.path.join(dep, fn))
        dt = 'f32' if arr.dtype == np.float32 else 's32'
        lines.append(
            f'{fn} {dt} {arr.ndim} ' + ' '.join(map(str, arr.shape))
        )
        data[k] = jnp.asarray(arr)
    with open(os.path.join(dep, 'inputs.manifest'), 'w') as f:
        f.write('\n'.join(lines) + '\n')

    host = str(tmp_path / 'pjrt_cpu_host')
    subprocess.run(
        ['sh', os.path.join(REPO, 'tools', 'build_pjrt_host.sh'), host],
        check=True, capture_output=True,
    )
    r = subprocess.run([host, dep], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'ok' in r.stdout

    e_cpp = np.fromfile(os.path.join(dep, 'out_0.bin'), np.float32)
    f_cpp = np.fromfile(os.path.join(dep, 'out_1.bin'),
                        np.float32).reshape(n_node, 3)
    s_cpp = np.fromfile(os.path.join(dep, 'out_2.bin'),
                        np.float32).reshape(1, 6)

    out = model.apply(params, data)
    np.testing.assert_allclose(
        e_cpp, np.asarray(out[KEY.PRED_TOTAL_ENERGY]), rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        f_cpp, np.asarray(out[KEY.PRED_FORCE]), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        s_cpp, np.asarray(out[KEY.PRED_STRESS]), rtol=1e-4, atol=1e-6,
    )


@pytest.mark.skipif(not _tf_available(),
                    reason='libtensorflow_cc not available')
def test_sevenn_exec_library(tmp_path):
    """The embeddable C API (runtime/sevenn_exec.cpp, the libtorch-
    replacement external MD hosts link - e.g. the LAMMPS pair style
    scaffold) must reproduce model.apply's E/F/S."""
    import ctypes

    from samples import rattled_rocksalt  # noqa: F401
    from sevennet_exp_tpu.data.graph import Atoms
    from sevennet_exp_tpu.scripts.deploy import deploy

    n_node, n_edge = 16, 512
    dep = str(tmp_path / 'dep')
    deploy(CP0, dep, n_node=n_node, n_edge=n_edge)

    so = str(tmp_path / 'libsevenn_exec.so')
    subprocess.run(
        ['sh', os.path.join(REPO, 'tools', 'build_sevenn_exec.sh'), so],
        check=True, capture_output=True,
    )
    lib = ctypes.CDLL(so)
    assert lib.sevenn_exec_init(dep.encode()) == 0
    nn, ne = ctypes.c_int(), ctypes.c_int()
    assert lib.sevenn_exec_capacity(ctypes.byref(nn),
                                    ctypes.byref(ne)) == 0
    assert (nn.value, ne.value) == (n_node, n_edge)

    cp = SevenNetCheckpoint(CP0)
    model, params = cp.build_model()
    rng = np.random.default_rng(7)
    pos = np.array([
        [0.1, 0.1, 0.1], [2.6, 2.6, 0.1], [2.6, 0.1, 2.6],
        [0.1, 2.6, 2.6], [1.3, 1.3, 1.3], [3.8, 3.8, 1.3],
        [3.8, 1.3, 3.8], [1.3, 3.8, 3.8], [1.3, 1.3, 3.8],
        [3.8, 3.8, 3.8], [3.8, 1.3, 1.3], [1.3, 3.8, 1.3],
    ]) + rng.normal(scale=0.05, size=(12, 3))
    at = Atoms(atomic_numbers=np.array([72] * 4 + [8] * 8), pos=pos,
               cell=np.eye(3) * 5.1, pbc=np.array([True] * 3))
    g = unlabeled_atoms_to_graph(at, cp.config['cutoff'])
    b = collate_graphs([g], n_node=n_node, n_edge=n_edge)

    z = np.asarray(b[KEY.ATOMIC_NUMBERS], np.int32)
    ei = np.ascontiguousarray(np.asarray(b[KEY.EDGE_IDX], np.int32))
    ev = np.ascontiguousarray(np.asarray(b[KEY.EDGE_VEC], np.float32))
    em = np.asarray(b[KEY.EDGE_MASK], np.float32)
    nm = np.asarray(b[KEY.NODE_MASK], np.float32)
    vol = float(np.asarray(b[KEY.CELL_VOLUME])[0])
    e = np.zeros(1, np.float32)
    f = np.zeros((n_node, 3), np.float32)
    s = np.zeros(6, np.float32)
    P = ctypes.POINTER
    assert lib.sevenn_exec_run(
        z.ctypes.data_as(P(ctypes.c_int32)),
        ei.ctypes.data_as(P(ctypes.c_int32)),
        ev.ctypes.data_as(P(ctypes.c_float)),
        em.ctypes.data_as(P(ctypes.c_float)),
        nm.ctypes.data_as(P(ctypes.c_float)), ctypes.c_float(vol),
        e.ctypes.data_as(P(ctypes.c_float)),
        f.ctypes.data_as(P(ctypes.c_float)),
        s.ctypes.data_as(P(ctypes.c_float)),
    ) == 0
    lib.sevenn_exec_free()

    data = {k: jnp.asarray(b[k]) for k in (
        KEY.ATOMIC_NUMBERS, KEY.EDGE_IDX, KEY.EDGE_VEC, KEY.EDGE_MASK,
        KEY.BATCH, KEY.NUM_ATOMS, KEY.NODE_MASK, KEY.CELL_VOLUME,
    )}
    data[KEY.ATOMIC_NUMBERS] = data[KEY.ATOMIC_NUMBERS].astype(jnp.int32)
    out = model.apply(params, data)
    np.testing.assert_allclose(
        e[0], float(out[KEY.PRED_TOTAL_ENERGY][0]), rtol=1e-4,
        atol=1e-6)
    np.testing.assert_allclose(
        f, np.asarray(out[KEY.PRED_FORCE]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        s, np.asarray(out[KEY.PRED_STRESS])[0], rtol=1e-4, atol=1e-6)
