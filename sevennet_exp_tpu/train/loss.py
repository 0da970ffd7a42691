"""Loss definitions (reference sevenn/train/loss.py, mask-based).

Per-atom energy (eV/atom), force (eV/A), stress (kbar, x1602.1766208).
NaN labels and padded rows are excluded via masks (masked mean replaces
the reference's boolean indexing, which would break static shapes).
Optional per-structure data weights (reference loss.py:49-76).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp

from .. import _keys as KEY
from .._const import KBAR_COEFF

Array = jnp.ndarray


def mse(pred, ref):
    return (pred - ref) ** 2


def make_huber(delta: float = 1.0):
    def huber(pred, ref):
        err = jnp.abs(pred - ref)
        quad = 0.5 * err ** 2
        lin = delta * (err - 0.5 * delta)
        return jnp.where(err < delta, quad, lin)
    return huber


CRITERIA = {'mse': lambda **kw: mse,
            'huber': lambda **kw: make_huber(kw.get('delta', 1.0))}


def _masked_mean(values, mask):
    s = jnp.sum(values * mask)
    c = jnp.sum(mask)
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


@dataclass(frozen=True)
class LossSpec:
    name: str       # 'Energy' | 'Force' | 'Stress'
    unit: str
    weight: float
    use_weight: bool = False

    def compute(self, criterion: Callable, data: Dict[str, Array]) -> Array:
        if self.name == 'Energy':
            n = jnp.maximum(data[KEY.NUM_ATOMS].astype(jnp.float32), 1.0)
            pred = data[KEY.PRED_TOTAL_ENERGY] / n
            ref = data[KEY.ENERGY] / n
            mask = data[KEY.GRAPH_MASK] * (~jnp.isnan(ref)).astype(pred.dtype)
            if self.use_weight:
                mask = mask * data.get('data_weight_energy', 1.0)
            return _masked_mean(criterion(pred, jnp.nan_to_num(ref)), mask)
        if self.name == 'Force':
            pred = data[KEY.PRED_FORCE].reshape(-1)
            ref = data[KEY.FORCE].reshape(-1)
            m = jnp.repeat(data[KEY.NODE_MASK], 3)
            m = m * (~jnp.isnan(ref)).astype(pred.dtype)
            if self.use_weight:
                w = data.get('data_weight_force')
                if w is not None:
                    m = m * jnp.repeat(w[data[KEY.BATCH]], 3)
            return _masked_mean(criterion(pred, jnp.nan_to_num(ref)), m)
        if self.name == 'Stress':
            pred = (data[KEY.PRED_STRESS] * KBAR_COEFF).reshape(-1)
            ref = (data[KEY.STRESS] * KBAR_COEFF).reshape(-1)
            m = jnp.repeat(data[KEY.GRAPH_MASK], 6)
            m = m * (~jnp.isnan(ref)).astype(pred.dtype)
            if self.use_weight:
                w = data.get('data_weight_stress')
                if w is not None:
                    m = m * jnp.repeat(w, 6)
            return _masked_mean(criterion(pred, jnp.nan_to_num(ref)), m)
        raise ValueError(self.name)


def loss_functions_from_config(config) -> Tuple[Callable, List[LossSpec]]:
    """Mirrors reference loss.py:199-223."""
    name = config.get(KEY.LOSS, 'mse').lower()
    criterion = CRITERIA[name](**config.get(KEY.LOSS_PARAM, {}))
    use_weight = config.get(KEY.USE_WEIGHT, False)
    specs = [
        LossSpec('Energy', 'eV/atom', 1.0, use_weight),
        LossSpec('Force', 'eV/A', float(config.get(KEY.FORCE_WEIGHT, 0.1)),
                 use_weight),
    ]
    if config.get(KEY.IS_TRAIN_STRESS, True):
        specs.append(
            LossSpec('Stress', 'kbar',
                     float(config.get(KEY.STRESS_WEIGHT, 1e-6)), use_weight)
        )
    return criterion, specs


def total_loss(criterion, specs: List[LossSpec], data) -> Tuple[Array, Dict]:
    parts = {}
    tot = 0.0
    for spec in specs:
        val = spec.compute(criterion, data)
        parts[spec.name] = val
        tot = tot + spec.weight * val
    return tot, parts
