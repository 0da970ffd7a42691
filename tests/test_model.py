"""Model-level tests mirroring reference tests/unit_tests/test_model.py:
exact parameter counts, output shapes, batched-vs-single consistency,
plus TPU-specific padding invariance, E(3) equivariance, and numerical
force/stress validation (which the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sevennet_exp_tpu._keys as KEY
from sevennet_exp_tpu.data.graph import collate_graphs, unlabeled_atoms_to_graph
from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.ops.wigner import real_wigner_D

from samples import (
    h2o_molecule,
    isolated_h,
    nacl_bulk,
    tiny_model_config,
)

CUTOFF = 4.0


def _graphs():
    return [
        unlabeled_atoms_to_graph(at, CUTOFF)
        for at in (nacl_bulk(), h2o_molecule(), isolated_h())
    ]


def _model_and_params(overrides=None, seed=42):
    model = build_e3_equivariant_model(tiny_model_config(overrides))
    params, mask = model.init(jax.random.PRNGKey(seed))
    return model, params, mask


_n_param_tests = [
    ({}, 20642),
    ({'train_denominator': True}, 20642 + 3),
    ({'train_shift_scale': True}, 20642 + 2),
    ({'shift': [1.0] * 4}, 20642),
    ({'scale': [1.0] * 4, 'train_shift_scale': True}, 20642 + 8),
    ({'num_convolution_layer': 4}, 33458),
    ({'lmax': 3}, 26866),
    ({'channel': 2}, 16883),
    ({'is_parity': False}, 20386),
    ({'self_connection_type': 'linear'}, 20114),
]


@pytest.mark.parametrize('cf,ref', _n_param_tests)
def test_num_params(cf, ref):
    # reference tests/unit_tests/test_model.py:165-180 exact counts
    model, params, mask = _model_and_params(cf)
    assert model.num_params(params, mask) == ref


_modal_base = {
    'use_modality': True, '_number_of_modalities': 2,
    '_modal_map': {'x1': 0, 'x2': 1},
}
_n_modal_param_tests = [
    ({}, 20642),
    ({'use_modal_node_embedding': True}, 20642 + 8),
    ({'use_modal_self_inter_intro': True}, 20642 + 2 * 4 * 3),
    ({'use_modal_self_inter_outro': True}, 20642 + 2 * (12 + 20 + 4)),
    ({'use_modal_output_block': True}, 20642 + 2 * 4 // 2),
]


@pytest.mark.parametrize('cf,ref', _n_modal_param_tests)
def test_modal_num_params(cf, ref):
    over = dict(_modal_base)
    over.update(cf)
    model, params, mask = _model_and_params(over)
    assert model.num_params(params, mask) == ref


def test_shapes():
    model, params, _ = _model_and_params()
    graphs = _graphs()
    batch = collate_graphs(graphs)
    out = model.jitted()(params, {k: jnp.asarray(v) for k, v in batch.items()})
    n_graphs, n_atoms = 3, sum(len(g[KEY.POS]) for g in graphs)
    assert out[KEY.PRED_TOTAL_ENERGY].shape == (n_graphs,)
    assert out[KEY.ATOMIC_ENERGY].shape == (n_atoms, 1)
    assert out[KEY.PRED_FORCE].shape == (n_atoms, 3)
    assert out[KEY.PRED_STRESS].shape == (n_graphs, 6)
    assert np.isfinite(np.asarray(out[KEY.PRED_FORCE])).all()


def test_batch_vs_single():
    # reference test_model.py:132-162
    model, params, _ = _model_and_params()
    graphs = _graphs()
    singles = []
    for g in graphs:
        b = collate_graphs([g])
        singles.append(
            model.jitted()(params, {k: jnp.asarray(v) for k, v in b.items()})
        )
    batch = collate_graphs(graphs)
    out = model.jitted()(params, {k: jnp.asarray(v) for k, v in batch.items()})

    e_cat = np.concatenate(
        [np.asarray(s[KEY.PRED_TOTAL_ENERGY]) for s in singles]
    )
    f_cat = np.concatenate([np.asarray(s[KEY.PRED_FORCE]) for s in singles])
    np.testing.assert_allclose(
        e_cat, np.asarray(out[KEY.PRED_TOTAL_ENERGY]), atol=2e-5
    )
    np.testing.assert_allclose(
        f_cat, np.asarray(out[KEY.PRED_FORCE]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(singles[0][KEY.PRED_STRESS][0]),
        np.asarray(out[KEY.PRED_STRESS][0]), atol=2e-5,
    )


def test_padding_invariance():
    model, params, _ = _model_and_params()
    graphs = _graphs()
    tight = collate_graphs(graphs)
    padded = collate_graphs(graphs, n_node=32, n_edge=256, n_graph=5)
    out_t = model.jitted()(params, {k: jnp.asarray(v) for k, v in tight.items()})
    out_p = model.jitted()(params, {k: jnp.asarray(v) for k, v in padded.items()})
    n = int(tight[KEY.NODE_MASK].sum())
    np.testing.assert_allclose(
        np.asarray(out_t[KEY.PRED_TOTAL_ENERGY]),
        np.asarray(out_p[KEY.PRED_TOTAL_ENERGY])[:3], atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_t[KEY.PRED_FORCE])[:n],
        np.asarray(out_p[KEY.PRED_FORCE])[:n], atol=2e-4,
    )
    # stress only meaningful for the periodic graph (molecules have
    # volume=eps -> garbage stress, same caveat as the reference
    # model_build.py:395-396)
    np.testing.assert_allclose(
        np.asarray(out_t[KEY.PRED_STRESS])[:1],
        np.asarray(out_p[KEY.PRED_STRESS])[:1], atol=2e-5,
    )


def test_rotation_equivariance():
    model, params, _ = _model_and_params()
    at = nacl_bulk()
    g0 = unlabeled_atoms_to_graph(at, CUTOFF)
    D1 = real_wigner_D(1, np.array([0.3, -1.2, 0.8]), 1.1)
    at_r = nacl_bulk()
    at_r.pos = at.pos @ D1.T
    at_r.cell = at.cell @ D1.T
    g1 = unlabeled_atoms_to_graph(at_r, CUTOFF)

    b0 = collate_graphs([g0], n_edge=g0[KEY.EDGE_IDX].shape[1])
    b1 = collate_graphs([g1], n_edge=g0[KEY.EDGE_IDX].shape[1])
    o0 = model.jitted()(params, {k: jnp.asarray(v) for k, v in b0.items()})
    o1 = model.jitted()(params, {k: jnp.asarray(v) for k, v in b1.items()})
    # energy invariant
    np.testing.assert_allclose(
        np.asarray(o0[KEY.PRED_TOTAL_ENERGY]),
        np.asarray(o1[KEY.PRED_TOTAL_ENERGY]), atol=1e-4,
    )
    # forces rotate (compare sorted norms to dodge edge-order permutation)
    f0 = np.asarray(o0[KEY.PRED_FORCE])[:2]
    f1 = np.asarray(o1[KEY.PRED_FORCE])[:2]
    np.testing.assert_allclose(f0 @ D1.T, f1, atol=1e-3)


def test_forces_match_numerical_gradient():
    model, params, _ = _model_and_params()
    at = nacl_bulk()
    rng = np.random.default_rng(3)
    at.pos = at.pos + rng.normal(scale=0.05, size=at.pos.shape)

    def energy_at(pos):
        a = nacl_bulk()
        a.pos = pos
        g = unlabeled_atoms_to_graph(a, CUTOFF)
        b = collate_graphs([g], n_edge=128)
        out = model.jitted(False)(
            params, {k: jnp.asarray(v) for k, v in b.items()}
        )
        return float(out[KEY.PRED_TOTAL_ENERGY][0]), out

    e0, out0 = energy_at(at.pos)
    forces = np.asarray(out0[KEY.PRED_FORCE])[:2]
    eps = 1e-3
    for i in range(2):
        for d in range(3):
            pp = at.pos.copy()
            pp[i, d] += eps
            ep, _ = energy_at(pp)
            pm = at.pos.copy()
            pm[i, d] -= eps
            em, _ = energy_at(pm)
            f_num = -(ep - em) / (2 * eps)
            assert abs(f_num - forces[i, d]) < 5e-3, (i, d, f_num, forces[i, d])
