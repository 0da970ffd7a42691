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


# Self-golden E/F/S for the cp_0-converted model (the analog of the
# reference's golden-value contract, tests/unit_tests/test_pretrained.py:
# 92-117): values locked on CPU fp32 at round 2 so any numerics
# regression -- a CG sign, a normalization, a rescale -- fails here
# instead of shipping (CPU fp32; TPU default-precision matmuls differ
# at ~1e-4 in forces). Regenerate with tools/gen_goldens.py only if a
# deliberate convention change is made (and say so in the commit).
GOLDEN_HFO2_E = 0.07259891927242279
GOLDEN_HFO2_F3 = np.array([
    [0.002636103192344308, 0.010405922308564186, 0.022037196904420853],
    [-0.01097540557384491, 0.003118960652500391, -0.006317476741969585],
    [0.011675456538796425, 0.057635921984910965, 0.011440563946962357],
])
GOLDEN_HFO2_S = np.array([
    0.0055135334841907024, 0.00565484631806612, 0.005576212424784899,
    -0.00012542115291580558, -1.331032399320975e-05,
    0.0001657024258747697,
])
GOLDEN_MOL_E = 0.040357645601034164
GOLDEN_MOL_F = np.array([
    [0.025254173204302788, 0.031098682433366776, 0.0032180107664316893],
    [-0.04218841344118118, 0.008091594092547894, 0.0064768558368086815],
    [0.016934240236878395, -0.039190277457237244, -0.009694866836071014],
])


@needs_cp0
def test_cp0_golden_values():
    """Numerical lock: converted cp_0 E/F/S on two fixed structures."""
    cp = SevenNetCheckpoint(CP0)
    model, params = cp.build_model()

    at = _hfo2_cell()
    g = unlabeled_atoms_to_graph(at, cp.config['cutoff'])
    b = collate_graphs([g])
    out = model.jitted()(params, {k: jnp.asarray(v) for k, v in b.items()})
    np.testing.assert_allclose(
        float(out[KEY.PRED_TOTAL_ENERGY][0]), GOLDEN_HFO2_E, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[KEY.PRED_FORCE])[:3], GOLDEN_HFO2_F3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[KEY.PRED_STRESS][0]), GOLDEN_HFO2_S, atol=1e-6)

    at2 = Atoms(
        atomic_numbers=np.array([72, 8, 8]),
        pos=np.array([
            [0.0, 0.0, 0.0], [1.9, 0.1, -0.2], [-0.3, 1.85, 0.4],
        ]),
        cell=np.eye(3) * 30.0, pbc=np.array([False] * 3),
    )
    g2 = unlabeled_atoms_to_graph(at2, cp.config['cutoff'])
    b2 = collate_graphs([g2])
    out2 = model.jitted()(params, {k: jnp.asarray(v) for k, v in b2.items()})
    np.testing.assert_allclose(
        float(out2[KEY.PRED_TOTAL_ENERGY][0]), GOLDEN_MOL_E, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out2[KEY.PRED_FORCE])[:3], GOLDEN_MOL_F, atol=1e-6)


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


@needs_cp0
def test_deploy_artifact_equivalence(tmp_path):
    """The deployed jax.export artifact must reload and reproduce
    model.apply() exactly on identical padded inputs, at CLI-chosen
    capacities (the serving analog of the reference's TorchScript
    reload contract, sevenn/scripts/deploy.py:52-66)."""
    from jax import export as jexport

    from sevennet_exp_tpu.scripts.deploy import deploy

    dep = str(tmp_path / 'dep')
    deploy(CP0, dep, n_node=24, n_edge=512)
    for fn in ('params.pkl', 'config.yaml', 'meta.yaml',
               'model.stablehlo', 'model_const.stablehlo',
               'model.jaxexport', 'signature.yaml'):
        assert os.path.exists(os.path.join(dep, fn)), fn

    with open(os.path.join(dep, 'model.jaxexport'), 'rb') as f:
        exp = jexport.deserialize(bytearray(f.read()))

    cp = SevenNetCheckpoint(CP0)
    model, params = cp.build_model()
    at = _hfo2_cell()
    g = unlabeled_atoms_to_graph(at, cp.config['cutoff'])
    b = collate_graphs([g], n_node=24, n_edge=512)
    keys = (KEY.ATOMIC_NUMBERS, KEY.EDGE_IDX, KEY.EDGE_VEC,
            KEY.EDGE_MASK, KEY.BATCH, KEY.NUM_ATOMS, KEY.NODE_MASK,
            KEY.CELL_VOLUME)
    data = {k: jnp.asarray(b[k]) for k in keys}
    data[KEY.ATOMIC_NUMBERS] = data[KEY.ATOMIC_NUMBERS].astype(jnp.int32)

    e_a, f_a, s_a = exp.call(params, data)
    out = model.apply(params, data)
    # the reloaded artifact recompiles through its own fusion schedule;
    # parity is to fp32 reassociation noise, far below any physics bug
    np.testing.assert_allclose(
        np.asarray(e_a), np.asarray(out[KEY.PRED_TOTAL_ENERGY]),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(f_a), np.asarray(out[KEY.PRED_FORCE]),
        rtol=1e-4, atol=5e-7,
    )
    np.testing.assert_allclose(
        np.asarray(s_a), np.asarray(out[KEY.PRED_STRESS]),
        rtol=1e-4, atol=5e-7,
    )


def test_processing_continue_resolves_statistics(tmp_path):
    """Continue must inherit NUMERIC shift/scale/conv_denominator from
    the checkpoint's resolved parameters, not whatever keyword strings
    the stored config still carries (reference resolves from the state
    dict, processing_continue.py:43-52)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from samples import tiny_model_config

    import jax

    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.scripts.processing_continue import (
        processing_continue_v2,
    )

    config = tiny_model_config({'shift': -1.25, 'scale': 0.75})
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(0))
    cp_path = str(tmp_path / 'cp.npz')
    # the stored config deliberately carries KEYWORD statistics
    stored = dict(config)
    stored[KEY.SHIFT] = 'per_atom_energy_mean'
    stored[KEY.SCALE] = 'per_atom_energy_std'
    save_checkpoint(cp_path, stored, params, epoch=4)

    user_cfg = dict(stored)
    user_cfg[KEY.CONTINUE] = {KEY.CHECKPOINT: cp_path}
    model2, state = processing_continue_v2(user_cfg)
    assert isinstance(user_cfg[KEY.SHIFT], float)
    assert isinstance(user_cfg[KEY.SCALE], float)
    np.testing.assert_allclose(user_cfg[KEY.SHIFT], -1.25, rtol=1e-6)
    np.testing.assert_allclose(user_cfg[KEY.SCALE], 0.75, rtol=1e-6)
    assert state['start_epoch'] == 5
    # a rebuild from the inherited config must now succeed
    build_e3_equivariant_model(user_cfg)
