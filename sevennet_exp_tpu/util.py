"""Misc utilities (reference sevenn/util.py equivalents, torch-free)."""

from __future__ import annotations

import os
from typing import Dict, List

from . import _keys as KEY
from .data.periodic import (
    atomic_numbers,
    chemical_symbols,
    get_type_mapper_from_specie,
)


def chemical_species_preprocess(input_chem: List[str],
                                universal: bool = False) -> Dict:
    """Reference sevenn/util.py:115-140."""
    config: Dict = {}
    if not universal:
        input_chem = list(set(input_chem))
        chemical_specie = sorted([x.strip() for x in input_chem])
        config[KEY.CHEMICAL_SPECIES] = chemical_specie
        config[KEY.CHEMICAL_SPECIES_BY_ATOMIC_NUMBER] = [
            atomic_numbers[x] for x in chemical_specie
        ]
        config[KEY.NUM_SPECIES] = len(chemical_specie)
        config[KEY.TYPE_MAP] = get_type_mapper_from_specie(chemical_specie)
    else:
        config[KEY.CHEMICAL_SPECIES] = list(chemical_symbols)
        n = len(chemical_symbols)
        config[KEY.CHEMICAL_SPECIES_BY_ATOMIC_NUMBER] = list(range(n))
        config[KEY.NUM_SPECIES] = n
        config[KEY.TYPE_MAP] = {z: z for z in range(n)}
    return config


def onehot_to_chem(one_hot_indices: List[int],
                   type_map: Dict[int, int]) -> List[str]:
    rev = {v: k for k, v in type_map.items()}
    return [chemical_symbols[rev[i]] for i in one_hot_indices]


def unique_filepath(filepath: str) -> str:
    if not os.path.isfile(filepath):
        return filepath
    dirname = os.path.dirname(filepath)
    name, ext = os.path.splitext(os.path.basename(filepath))
    cnt = 0
    while True:
        new_path = os.path.join(dirname, f'{name}{cnt}{ext}')
        if not os.path.exists(new_path):
            return new_path
        cnt += 1


def enable_compile_cache(min_compile_secs: float = 5.0) -> str:
    """Point JAX's persistent compilation cache at a repo-local dir.

    The 100k-atom MD programs take minutes to compile (BENCH_NOTES.md);
    a persistent cache makes repeat runs cheap. The directory is derived
    from SEVENNET_COMPILE_CACHE, else placed next to this package's
    checkout — never a hard-coded absolute path.
    """
    import os

    import jax

    cache = os.environ.get('SEVENNET_COMPILE_CACHE')
    if not cache:
        repo = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        cache = os.path.join(repo, '.jax_comp_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update(
            'jax_persistent_cache_min_compile_time_secs',
            min_compile_secs,
        )
    except Exception:
        pass
    return cache
