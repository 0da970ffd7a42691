"""Modality conversion (reference scripts/convert_model_modality.py):
functional round-trips — stripping to one modal and appending new
modals must preserve the model's outputs exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sevennet_exp_tpu._keys as KEY
from sevennet_exp_tpu.data.graph import collate_graphs, atoms_to_graph
from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.scripts.convert_modality import (
    append_modality_to_params,
    single_modal_params,
)

from samples import rattled_rocksalt, tiny_model_config


def _modal_config(n_modal=2, **extra):
    modal_map = {f'm{i}': i for i in range(n_modal)}
    over = {
        'cutoff': 4.0, 'channel': 4, 'lmax': 1,
        'num_convolution_layer': 2,
        'use_modality': True,
        'use_modal_node_embedding': True,
        'use_modal_self_inter_intro': True,
        'use_modal_self_inter_outro': True,
        'use_modal_output_block': True,
        KEY.MODAL_MAP: modal_map,
        KEY.NUM_MODALITIES: n_modal,
    }
    over.update(extra)
    return tiny_model_config(over)


def _batch(modal_idx: int, cutoff=4.0):
    at = rattled_rocksalt(reps=2, a=5.63, rattle=0.1, seed=5)
    g = atoms_to_graph(at, cutoff, allow_unlabeled=True)
    g[KEY.MODAL_TYPE] = modal_idx
    b = collate_graphs([g], n_node=72, n_edge=2048)
    return {k: jnp.asarray(v) for k, v in b.items()}


def _efs(model, params, batch):
    out = model.apply(params, batch)
    return (np.asarray(out[KEY.PRED_TOTAL_ENERGY]),
            np.asarray(out[KEY.PRED_FORCE]),
            np.asarray(out[KEY.PRED_STRESS]))


def test_single_modal_strip_preserves_outputs():
    config = _modal_config(2)
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(7))

    for modal_name, idx in config[KEY.MODAL_MAP].items():
        e0, f0, s0 = _efs(model, params, _batch(idx))
        cfg1, p1 = single_modal_params(config, params, modal_name)
        assert cfg1[KEY.USE_MODALITY] is False
        m1 = build_e3_equivariant_model(cfg1)
        e1, f1, s1 = _efs(m1, p1, _batch(0))
        np.testing.assert_allclose(e1, e0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(f1, f0, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(s1, s0, rtol=1e-4, atol=1e-7)


def test_append_modality_preserves_original_modals():
    config = _modal_config(2)
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(3))
    ref = [_efs(model, params, _batch(i)) for i in range(2)]

    cfg2, p2 = append_modality_to_params(config, params, ['extra'])
    assert cfg2[KEY.MODAL_MAP] == {'m0': 0, 'm1': 1, 'extra': 2}
    m2 = build_e3_equivariant_model(cfg2)
    for i in range(2):
        e, f, s = _efs(m2, p2, _batch(i))
        np.testing.assert_allclose(e, ref[i][0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(f, ref[i][1], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(s, ref[i][2], rtol=1e-4, atol=1e-7)
    # new modal runs (zero-initialized one-hot rows -> finite outputs)
    e, f, _ = _efs(m2, p2, _batch(2))
    assert np.isfinite(e).all() and np.isfinite(f).all()


def test_append_to_single_modal_checkpoint():
    config = tiny_model_config({
        'cutoff': 4.0, 'channel': 4, 'lmax': 1,
        'num_convolution_layer': 2,
    })
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(11))
    b = _batch(0)
    b.pop(KEY.MODAL_TYPE, None)
    e0, f0, _ = _efs(model, params, b)

    cfg2, p2 = append_modality_to_params(config, params, ['pbe52'])
    assert cfg2[KEY.MODAL_MAP] == {'origin': 0, 'pbe52': 1}
    m2 = build_e3_equivariant_model(cfg2)
    e, f, _ = _efs(m2, p2, _batch(0))  # 'origin' slot
    np.testing.assert_allclose(e, e0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(f, f0, rtol=1e-4, atol=1e-5)


def test_checkpoint_append_modal_cli(tmp_path):
    from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint, save_checkpoint
    from sevennet_exp_tpu.main.cli import main_cp

    config = _modal_config(2)
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(1))
    src = str(tmp_path / 'cp_modal.pkl')
    dst = str(tmp_path / 'cp_widened.pkl')
    save_checkpoint(src, config, params, epoch=3)

    main_cp([src, '--append-modal', 'new_modal', '-o', dst])
    cp2 = SevenNetCheckpoint(dst)
    assert cp2.config[KEY.MODAL_MAP] == {'m0': 0, 'm1': 1, 'new_modal': 2}
    m2, p2 = cp2.build_model()
    e0, f0, _ = _efs(model, params, _batch(1))
    e2, f2, _ = _efs(m2, p2, _batch(1))
    np.testing.assert_allclose(e2, e0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(f2, f0, rtol=1e-4, atol=1e-5)

    # collapse the widened checkpoint back onto m1
    single = str(tmp_path / 'cp_single.pkl')
    main_cp([dst, '--get-single-modal', 'm1', '-o', single])
    cps = SevenNetCheckpoint(single)
    ms, ps = cps.build_model()
    es, fs, _ = _efs(ms, ps, _batch(0))
    np.testing.assert_allclose(es, e0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fs, f0, rtol=1e-4, atol=1e-5)


def test_bad_modal_names():
    config = _modal_config(2)
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        append_modality_to_params(config, params, ['m0'])
    with pytest.raises(KeyError):
        single_modal_params(config, params, 'nope')
