"""input.yaml -> validated config (reference sevenn/parse_input.py).

Same three sections (model:/train:/data:), same key names (_keys.py), so
existing SevenNet input files work unchanged. Unknown keys warn instead of
erroring (parse_input.py:114-121).
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Tuple

import yaml

from . import _const
from . import _keys as KEY
from .util import chemical_species_preprocess


def config_initialize(key: str, config: Dict, default: Any):
    if key not in config:
        config[key] = default
        return config
    user = config[key]
    if isinstance(default, dict) and isinstance(user, dict):
        merged = dict(default)
        merged.update(user)
        config[key] = merged
    return config


def init_model_config(config: Dict[str, Any]) -> Dict[str, Any]:
    defaults = _const.model_defaults(config)
    model_config: Dict[str, Any] = {}

    chem = config.get(KEY.CHEMICAL_SPECIES, 'auto')
    if isinstance(chem, str) and chem.lower() == 'auto':
        model_config[KEY.CHEMICAL_SPECIES] = 'auto'
        model_config[KEY.NUM_SPECIES] = 'auto'
        model_config[KEY.TYPE_MAP] = 'auto'
    elif isinstance(chem, str) and chem.lower() in ('univ', 'universal'):
        model_config.update(chemical_species_preprocess([], universal=True))
    else:
        if isinstance(chem, str):
            chem = chem.replace('-', ',').replace(' ', ',').split(',')
            chem = [c for c in chem if c]
        model_config.update(chemical_species_preprocess(chem))

    for k, v in config.items():
        if k == KEY.CHEMICAL_SPECIES:
            continue
        model_config[k] = v
    for k, default in defaults.items():
        config_initialize(k, model_config, default)
    return model_config


def init_train_config(config: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(config)
    for k, default in _const.train_defaults(config).items():
        config_initialize(k, out, default)
    return out


def init_data_config(config: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(config)
    for k, default in _const.data_defaults(config).items():
        config_initialize(k, out, default)
    return out


def read_config_yaml(
    filename: str, return_separately: bool = False
):
    with open(filename) as f:
        raw = yaml.safe_load(f)

    model_cfg, train_cfg, data_cfg = {}, {}, {}
    for key, section in raw.items():
        if key.lower() == 'model':
            model_cfg = init_model_config(section)
        elif key.lower() == 'train':
            train_cfg = init_train_config(section)
        elif key.lower() == 'data':
            data_cfg = init_data_config(section)
        else:
            warnings.warn(f'unknown main section: {key}')

    if return_separately:
        return model_cfg, train_cfg, data_cfg
    merged = {}
    merged.update(model_cfg)
    merged.update(train_cfg)
    merged.update(data_cfg)
    return merged
