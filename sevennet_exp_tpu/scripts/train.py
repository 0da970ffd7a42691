"""Training orchestrator (reference sevenn/scripts/train.py:38-90,
train_v2): datasets -> loaders -> model -> trainer -> epoch loop."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh
import numpy as np

from .. import _keys as KEY
from ..data.dataset import datasets_from_config
from ..data.loader import GraphLoader
from ..logger import Logger
from ..model.build import build_e3_equivariant_model
from ..train.trainer import Trainer
from .processing_continue import processing_continue_v2
from .processing_epoch import processing_epoch_v2


def loader_from_config(config, dataset, is_train: bool = False,
                       **caps) -> GraphLoader:
    return GraphLoader(
        dataset.graphs if hasattr(dataset, 'graphs') else dataset,
        batch_size=config.get(KEY.BATCH_SIZE, 6),
        shuffle=is_train and config.get(KEY.TRAIN_SHUFFLE, True),
        seed=config.get(KEY.RANDOM_SEED, 1),
        **caps,
    )


def train_v2(config: Dict[str, Any], working_dir: str = '.'):
    log = Logger()
    log.init_file(os.path.join(working_dir, 'log.sevenn'))
    # multi-host bootstrap (TPU pod / SLURM / mpirun / explicit
    # coordinator): the analog of the reference's torchrun/OMPI env
    # handling + init_process_group (main/sevenn.py:59-76). No-op for
    # single-process runs; afterwards jax.devices() is GLOBAL, so the
    # DP mesh below spans hosts.
    from ..parallel.distributed import maybe_initialize
    multi_process = maybe_initialize(log)
    log.greeting()
    log.dict_write(
        {k: v for k, v in config.items() if not k.startswith('_')},
        'Configuration:',
    )

    start_epoch, cont_state, model = 1, None, None
    if config.get(KEY.CONTINUE, {}).get(KEY.CHECKPOINT):
        model, cont_state = processing_continue_v2(config)
        start_epoch = cont_state['start_epoch']

    log.timer_start('dataset')
    datasets = datasets_from_config(config, working_dir)
    log.timer_end('dataset', 'Dataset build')

    # multi-host DP: each process iterates its own stripe of the
    # (identically permuted) train batches; eval runs identically on
    # every process (deterministic, no reduction needed)
    shard = None
    if multi_process and config.get(KEY.IS_DDP, False):
        shard = (jax.process_index(), jax.process_count())
    loaders = {
        name: loader_from_config(
            config, ds, is_train=(name == 'trainset'),
            **({'shard': shard} if (shard and name == 'trainset')
               else {}),
        )
        for name, ds in datasets.items()
    }

    if model is None:
        model = build_e3_equivariant_model(config)
        params, mask = model.init(
            jax.random.PRNGKey(config.get(KEY.RANDOM_SEED, 1))
        )
    else:
        # continued: model was rebuilt from checkpoint config
        params = cont_state['params']
        _, mask = model.init(
            jax.random.PRNGKey(config.get(KEY.RANDOM_SEED, 1))
        )

    log.print_model_info(model, params, mask)

    mesh = None
    if config.get(KEY.IS_DDP, False):
        devices = jax.devices()
        mesh = Mesh(np.array(devices), ('dp',))
        log.format_k_v('data parallel devices', len(devices), write=True)

    trainer = Trainer.from_config(model, params, mask, config, mesh=mesh)
    log.timer_start('train')
    processing_epoch_v2(
        trainer, config, loaders, working_dir, start_epoch=start_epoch
    )
    log.timer_end('train', 'Total training')
    return trainer
