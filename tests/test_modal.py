"""Multi-modal training path (reference tests/unit_tests/test_modal.py
analog): modality tagging, pooled statistics, modal-wise rescale, and a
forward/backward pass through a modal model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sevennet_exp_tpu._keys as KEY
from sevennet_exp_tpu.data.dataset import SevenNetGraphDataset
from sevennet_exp_tpu.data.graph import collate_graphs
from sevennet_exp_tpu.data.modal_dataset import (
    SevenNetMultiModalDataset,
    multimodal_dataset_from_config,
)
from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.train.trainer import Trainer

from samples import tiny_model_config
from test_data import HFO2, needs_hfo2


@needs_hfo2
def test_multimodal_statistics_and_training(tmp_path):
    config = tiny_model_config({
        'cutoff': 4.0, 'channel': 4, 'lmax': 1,
        'num_convolution_layer': 2,
        'use_modality': True,
        'use_modal_self_inter_intro': True,
        'use_modal_output_block': True,
        'use_modal_wise_shift': True,
        'use_modal_wise_scale': False,
        'shift': 'per_atom_energy_mean',
        'scale': 'force_rms',
        'conv_denominator': 'avg_num_neigh',
        'chemical_species': 'auto',
        'loss': 'mse', 'optimizer': 'adam', 'optim_param': {'lr': 0.01},
        'is_train_stress': True,
    })
    config[KEY.LOAD_TRAINSET] = {'pbe': [HFO2], 'scan': [HFO2]}
    datasets = multimodal_dataset_from_config(config, str(tmp_path))
    mm = datasets['trainset']
    assert config[KEY.MODAL_MAP] == {'pbe': 0, 'scan': 1}
    assert len(mm) == 2 * len(mm.datasets['pbe'])
    assert isinstance(config[KEY.SHIFT], dict)  # modal-wise
    assert isinstance(config[KEY.SCALE], float)
    assert mm.graphs[0][KEY.MODAL_TYPE] == 0
    assert mm.graphs[-1][KEY.MODAL_TYPE] == 1

    model = build_e3_equivariant_model(config)
    params, mask = model.init(jax.random.PRNGKey(0))

    batch = collate_graphs(mm.graphs[:2], n_node=32, n_edge=1024)
    assert KEY.MODAL_TYPE in batch
    out = model.apply(params, {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(np.asarray(out[KEY.PRED_TOTAL_ENERGY])).all()
    assert np.isfinite(np.asarray(out[KEY.PRED_FORCE])).all()

    # modality changes the prediction (modal one-hots are wired through)
    b2 = dict(batch)
    b2[KEY.MODAL_TYPE] = 1 - batch[KEY.MODAL_TYPE]
    out2 = model.apply(params, {k: jnp.asarray(v) for k, v in b2.items()})
    assert not np.allclose(
        np.asarray(out[KEY.PRED_TOTAL_ENERGY]),
        np.asarray(out2[KEY.PRED_TOTAL_ENERGY]),
    )

    # one train step runs
    trainer = Trainer(model, params, mask, config)
    trainer.run_one_epoch([batch], is_train=True)
