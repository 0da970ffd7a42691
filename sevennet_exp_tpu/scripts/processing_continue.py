"""Continue / fine-tune bootstrap (reference
sevenn/scripts/processing_continue.py:15-89).

Loads a checkpoint (native or torch), inherits shift/scale/
conv_denominator and chemical species from it (overriding dataset
statistics, processing_continue.py:43-64), and returns the starting
parameters + state to reset or keep.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from .. import _keys as KEY
from ..checkpoint import SevenNetCheckpoint
from ..logger import Logger


def processing_continue_v2(config: Dict[str, Any]) -> Tuple[Any, Dict]:
    log = Logger()
    continue_cfg = config[KEY.CONTINUE]
    cp_path = continue_cfg[KEY.CHECKPOINT]
    log.writeline(f'Continue from {cp_path}')

    cp = SevenNetCheckpoint(cp_path)
    cp_config = cp.config
    model, params = cp.build_model()

    # statistics & species are inherited from the checkpoint
    if continue_cfg.get(KEY.USE_STATISTIC_VALUES_OF_CHECKPOINT, True):
        for k in (KEY.SHIFT, KEY.SCALE, KEY.CONV_DENOMINATOR):
            if k in cp_config:
                config[k] = cp_config[k]
                log.writeline(f'{k} inherited from checkpoint')
    for k in (KEY.CHEMICAL_SPECIES, KEY.NUM_SPECIES, KEY.TYPE_MAP,
              KEY.CHEMICAL_SPECIES_BY_ATOMIC_NUMBER):
        if k in cp_config:
            config[k] = cp_config[k]

    # architecture keys must match (reference check_config_compatible)
    must_match = [
        KEY.NODE_FEATURE_MULTIPLICITY, KEY.LMAX, KEY.IS_PARITY,
        KEY.NUM_CONVOLUTION, KEY.IRREPS_MANUAL, KEY.SELF_CONNECTION_TYPE,
    ]
    for k in must_match:
        if k in config and k in cp_config and config[k] != cp_config[k]:
            raise ValueError(
                f'config mismatch with checkpoint for {k}: '
                f'{config[k]} != {cp_config[k]}'
            )

    start_epoch = 1
    if not continue_cfg.get(KEY.RESET_EPOCH, False) and cp.epoch:
        start_epoch = int(cp.epoch) + 1

    state = {
        'params': params,
        'start_epoch': start_epoch,
        'reset_optimizer': continue_cfg.get(KEY.RESET_OPTIMIZER, False),
        'reset_scheduler': continue_cfg.get(KEY.RESET_SCHEDULER, False),
    }
    return model, state
