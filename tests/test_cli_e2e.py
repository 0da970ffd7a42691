"""End-to-end CLI flows on reference example OUTCARs: train ->
checkpoint tools -> batch inference (the `sevenn` / `sevenn_cp` /
`sevenn_inference` user journey, reference main/*)."""

import os

import numpy as np
import pytest
import yaml

from sevennet_exp_tpu.main.cli import (
    main_cp,
    main_inference,
    main_sevenn,
)

REF = '/root/reference/example_inputs'
needs_ref = pytest.mark.skipif(
    not os.path.exists(f'{REF}/data/label_1/OUTCAR_1'),
    reason='reference example data absent')


@needs_ref
def test_train_cp_inference_roundtrip(tmp_path):
    cfg = {
        'model': {
            'chemical_species': 'auto',
            'cutoff': 4.0,
            'channel': 4,
            'lmax': 1,
            'num_convolution_layer': 2,
            'weight_nn_hidden_neurons': [16, 16],
            'radial_basis': {'radial_basis_name': 'bessel',
                             'bessel_basis_num': 4},
            'cutoff_function': {'cutoff_function_name': 'poly_cut'},
            'conv_denominator': 'avg_num_neigh',
        },
        'train': {
            'random_seed': 1,
            'epoch': 2,
            'loss': 'mse',
            'optimizer': 'adam',
            'optim_param': {'lr': 0.01},
            'is_train_stress': True,
            'error_record': [['Energy', 'RMSE'], ['Force', 'RMSE'],
                             ['TotalLoss', 'None']],
        },
        'data': {
            # shift/scale live in the data section (reference
            # presets/base.yaml:79-80) — in `model:` they'd be ignored
            # with a warning (see test_shift_scale_in_model_warns)
            'shift': 'per_atom_energy_mean',
            'scale': 'force_rms',
            'batch_size': 2,
            'data_divide_ratio': 0.3,
            # brace expansion through expand_dataset_paths
            'load_trainset_path': [f'{REF}/data/label_1/OUTCAR_{{1..3}}'],
        },
    }
    yaml_path = tmp_path / 'input.yaml'
    yaml_path.write_text(yaml.safe_dump(cfg))
    main_sevenn([str(yaml_path), '-w', str(tmp_path)])

    assert (tmp_path / 'lc.csv').exists()
    lc = (tmp_path / 'lc.csv').read_text().strip().splitlines()
    assert len(lc) == 3  # header + 2 epochs
    best = tmp_path / 'checkpoint_best.pth.sevennet'
    assert best.exists()

    # checkpoint summary + reproduce yaml
    main_cp([str(best)])
    main_cp([str(best), '--yaml'])

    # batch inference on a held-out OUTCAR (format dispatch + braces)
    out = tmp_path / 'infer'
    main_inference([str(best), f'{REF}/data/label_2/OUTCAR_{{6..7}}',
                    '-o', str(out)])
    for f in ('errors.txt', 'info.csv', 'per_graph.csv', 'per_atom.csv'):
        assert (out / f).exists(), f
    errors = (out / 'errors.txt').read_text()
    assert 'Energy MAE' in errors and 'Force RMSE' in errors
    per_graph = (out / 'per_graph.csv').read_text().splitlines()
    assert len(per_graph) == 3  # header + 2 structures


def test_shift_scale_in_model_warns():
    """shift/scale belong in data: (reference presets/base.yaml:79-80);
    placing them under model: must warn that they are ignored, so a
    misfiled fixture cannot silently train with default statistics."""
    import warnings as _w

    from sevennet_exp_tpu.parse_input import init_model_config

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter('always')
        init_model_config({
            'chemical_species': 'auto',
            'shift': 'per_atom_energy_mean',
            'scale': 'force_rms',
        })
    msgs = [str(r.message) for r in rec]
    assert any('shift' in m and 'scale' in m and 'ignored' in m
               for m in msgs), msgs
